package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.IntHash

/** Native MinHash signature: `sig[p] = min over shingles s of xxhash64(s, p)`
  * for p in [0, numHashes), bit-identical to the HOF form
  * `transform(sequence(0, n-1), p -> array_min(transform(sh, s -> xxhash64(s, p))))`
  * because Spark's `xxhash64(s, p)` chains as
  * `hashInt(p, hashUTF8String(s, 42))` — so the (expensive) string hash is
  * computed ONCE per shingle here and each permutation is one integer mix,
  * in a tight codegen'd loop. The HOF form re-hashes every shingle string
  * per permutation through the interpreted lambda evaluator — measured
  * ~100× slower at 32 hashes (SCALE.md).
  *
  * Empty or all-null shingle arrays yield the all-Long.MaxValue sentinel
  * signature (the "no shingles" marker the LSH layer filters on). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(a: Any): Any = {
    val sh = a.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val base = XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
        var p = 0
        while (p < numHashes) {
          val v = XXH64.hashInt(p, base)
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val xxh = classOf[XXH64].getName
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $base = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $p = 0; $p < $numHashes; $p++) {
         |      long $v = $xxh.hashInt($p, $base);
         |      if ($v < $mins[$p]) $mins[$p] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native word-n-gram shingles: whitespace-tokenize the (space-trimmed)
  * text, join each run of `nWords` tokens with " ". With `distinct`
  * (default — the set-similarity form MinHash/Jaccard need) shingles
  * dedupe preserving first occurrence; with `distinct = false` every
  * occurrence survives (the bag-of-features form count-based scoring
  * like DSIR needs). Bit-compatible with the HOF form
  * `[array_distinct](transform(sequence(1, count), i -> array_join(slice(split(trim(text), "\\s+"), i, n), " ")))`
  * — which re-evaluates the regex split of the WHOLE document once per
  * shingle through the interpreted lambda evaluator (O(tokens²) regex
  * work per document; measured dominant in the minhash path, SCALE.md).
  * Here the document is split once. Blank text → empty array. */
case class WordShingles(child: Expression, nWords: Int,
    distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(nWords >= 1, "nWords must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any = {
    // trim SPACES only (Spark's trim()), not Java's String.trim (<= 0x20)
    val s = a.asInstanceOf[UTF8String].trim().toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val toks = s.split("\\s+", -1) // limit -1: Spark's split keeps trailing empties
    val count = toks.length - (nWords - 1)
    if (count < 1) return new GenericArrayData(Array.empty[Any])
    val acc: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](count * 2)
      else new java.util.ArrayList[String](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < nWords) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      acc.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](acc.size())
    val it = acc.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Native set-Jaccard over two string arrays:
  * |set(a) ∩ set(b)| / |set(a) ∪ set(b)| — value-identical to
  * `size(array_intersect(a, b)) / size(array_union(a, b))` (both dedupe),
  * but one hash-set pass instead of two interpreted array walks per pair.
  * The LSH verification step evaluates this once per candidate pair — the
  * dominant cost when duplicate groups are large. Both empty → NaN
  * (0.0/0.0), matching the division form. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](xs.numElements() * 2)
    var i = 0
    while (i < xs.numElements()) {
      if (!xs.isNullAt(i)) setA.add(xs.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String](ys.numElements() * 2)
    var inter = 0
    var j = 0
    while (j < ys.numElements()) {
      if (!ys.isNullAt(j)) {
        val s = ys.getUTF8String(j)
        if (setB.add(s) && setA.contains(s)) inter += 1
      }
      j += 1
    }
    val union = setA.size() + setB.size() - inter
    inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** Native form of [[graft.ops.IntHash.stringHash]]: the 31-bit affine
  * chain over Unicode CODE POINTS + xorshift-multiply scramble, in one
  * tight loop (the HOF Column form folds `split(s, "")` through the
  * interpreted lambda evaluator — one eval-tree walk per character).
  * Code points — not UTF-16 units — are the engine-portable alphabet:
  * Spark's `split(s, "")` splits per code point (Java regex boundaries
  * are code-point aware) and the DuckDB twin's `unicode(s[i])` yields
  * code points, so a charAt-based loop would silently diverge from BOTH
  * on supplementary-plane characters (emoji). Identical values for all
  * BMP text (every committed oracle row). */
case class StringHash31(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_stringhash31"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (IntHash.A * h + IntHash.B + cp.toLong) % IntHash.M
      i += Character.charCount(cp)
    }
    IntHash.scrambleLong(h)
  }

  override protected def withNewChildInternal(newChild: Expression): StringHash31 =
    copy(child = newChild)
}

/** Native SimHash vote fold: fingerprint bit b is set iff
  * `Σ_hashes (bit b set ? +1 : −1) > 0`, over `nBits` bits — one pass
  * over the hash array instead of nBits interpreted array folds. */
case class SimHashVotes(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(nBits >= 1 && nBits <= 63, "nBits in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_votes"

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](nBits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < nBits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
    copy(child = newChild)
}

/** Native marker-hit counter: number of array elements contained in the
  * literal `markers` set (exact string equality) — replaces
  * `size(filter(toks, t -> t.isin(markers)))`, which walks the
  * interpreted lambda evaluator per token with a linear isin scan.
  * Language-ID runs this once per language per document. */
case class MarkerHits(child: Expression, markers: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_marker_hits"

  @transient private lazy val markerSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    var hits = 0
    var i = 0
    while (i < xs.numElements()) {
      if (!xs.isNullAt(i) && markerSet.contains(xs.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

/** Native one-pass character/subword statistics:
  * struct(n_punct, n_digit, n_upper, n_subwords) — replaces three
  * `regexp_replace` passes (punct/digit/upper char-class removal) plus a
  * `regexp_extract_all` count per document with a single code-point walk.
  *
  * Exact parity notes: the punct class is the quality regex's literal
  * ASCII set (which deliberately EXCLUDES backslash — so does the DuckDB
  * oracle twin); subwords follow `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` with
  * Java's ASCII-only `\s`, i.e. letter runs, digit runs, and one piece
  * per other non-space code point. */
case class TextCharStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_upper", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false)))
  override def prettyName: String = "graft_charstats"

  private def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96 && cp != 92) || (cp >= 123 && cp <= 126)
  private def isSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var punct, digit, upper, subwords = 0
    var state = 0 // 0 = none, 1 = in letter run, 2 = in digit run
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isPunct(cp)) punct += 1
      if (cp >= '0' && cp <= '9') digit += 1
      if (cp >= 'A' && cp <= 'Z') upper += 1
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) {
        if (state != 1) subwords += 1
        state = 1
      } else if (cp >= '0' && cp <= '9') {
        if (state != 2) subwords += 1
        state = 2
      } else if (isSpace(cp)) {
        state = 0
      } else {
        subwords += 1
        state = 0
      }
      i += Character.charCount(cp)
    }
    org.apache.spark.sql.catalyst.InternalRow(punct, digit, upper, subwords)
  }

  override protected def withNewChildInternal(newChild: Expression): TextCharStats =
    copy(child = newChild)
}

/** Native Jaro–Winkler string similarity — Spark ships levenshtein only;
  * this fills the fuzzy-name-matching gap with DuckDB-identical
  * semantics (pinned by the `dedup_jaro_pairs` oracle):
  * either side empty → 0.0; match window ⌊max/2⌋−1; transpositions =
  * mismatched matched chars / 2; Winkler prefix boost (p=0.1, prefix
  * capped at 4) applied only when jaro > 0.7. Operates on UTF-8 BYTES —
  * the alphabet DuckDB's `jaro_winkler_similarity` uses (verified
  * empirically: über/uber → 0.7833 byte-wise, ≠ 0.8333 code-point-wise)
  * — so the oracle compare holds for ANY string, not just ASCII. A
  * UTF-16 charAt loop matched DuckDB only on ASCII and silently
  * diverged on every non-ASCII name, including BMP text. Code-point
  * libraries (python jellyfish et al.) differ from both on non-ASCII;
  * the gate's engine pair is what must agree. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].getBytes
    val s2 = b.asInstanceOf[UTF8String].getBytes
    val (n1, n2) = (s1.length, s2.length)
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val hi = math.min(n2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var mismatched = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / n1 + m / n2 + (m - mismatched / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(math.min(n1, n2), 4)
    while (l < maxL && s1(l) == s2(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

/** Native deflate compression ratio: `deflate(utf8(text)).length /
  * utf8(text).length` at zlib level `level` — the classic cheap
  * repetitiveness signal (Gopher/Dolma-adjacent curation: highly
  * compressible pages are boilerplate/template farms; incompressible
  * ones are often binary junk or hash dumps). Empty text → 1.0.
  *
  * One `java.util.zip.Deflater` per expression instance, reset between
  * rows (each task deserializes its own plan copy, so the instance is
  * thread-confined); the output is DISCARDED in fixed-size chunks —
  * only the byte count survives, so memory is O(chunk), not O(doc).
  * Deterministic for a fixed level and zlib build (the JDK bundles
  * its own), which holds across executors of one cluster — but NOT a
  * cross-engine contract, so this op is spec-verified rather than
  * DuckDB-oracled. */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(level >= 0 && level <= 9, "deflate level in [0, 9]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  @transient private lazy val deflater = new java.util.zip.Deflater(level)
  @transient private lazy val chunk = new Array[Byte](8192)

  override def nullSafeEval(a: Any): Any = {
    val raw = a.asInstanceOf[UTF8String].getBytes
    if (raw.length == 0) return 1.0
    deflater.reset()
    deflater.setInput(raw)
    deflater.finish()
    var compressed = 0L
    while (!deflater.finished()) compressed += deflater.deflate(chunk)
    compressed.toDouble / raw.length
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Unicode normalization to the given form (NFC / NFD / NFKC / NFKD)
  * via `java.text.Normalizer` — the tokenizer-pipeline prerequisite
  * (byte-level BPE and hash-based dedup both treat "ﬁ" vs "fi" or
  * composed vs decomposed accents as distinct unless the corpus is
  * normalized first; NFKC is the standard choice, folding
  * compatibility forms like ligatures, full-width ASCII, and the μ
  * sign). Already-normalized text short-circuits without allocating
  * (`Normalizer.isNormalized` is a cheap scan — the overwhelmingly
  * common case on clean corpora). JVM-deterministic (the Unicode
  * tables ship with the JDK); DuckDB exposes only NFC, so this is
  * spec-verified rather than DuckDB-oracled. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    "form must be one of NFC, NFD, NFKC, NFKD")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  @transient private lazy val nform = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, nform)) a
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nform))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Multiset intersection size of two SORTED string arrays:
  * Σ_t min(count_a(t), count_b(t)) by a single two-pointer merge —
  * the row-local core of the SQuAD token-F1 overlap
  * (graft.ops.Eval.tokenF1). Inputs MUST be sorted ascending
  * (sort_array's binary UTF8 order — the same comparison this merge
  * uses), which the caller guarantees; the expression itself is then
  * O(|a| + |b|) with no per-element boxing beyond the array access.
  *
  * Exists because the exploded alternative (two posexplodes → two
  * (id, token)-keyed count aggregations → full-outer join → per-id
  * reduce) costs FIVE corpus-sized shuffles — measured 283.5 s at 5M
  * docs where this projection form needs none at all. Spark's own
  * array_intersect is SET-semantics (drops multiplicity), so it
  * cannot express the SQuAD overlap. */
case class MultisetOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_multiset_overlap"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var common = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { common += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MultisetOverlap =
    copy(left = newLeft, right = newRight)
}

object MinHashShim {
  def multisetOverlapCol(a: Column, b: Column): Column =
    ExpressionUtils.column(MultisetOverlap(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
  def jaroWinklerCol(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def minhashCol(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), numHashes))
  def shinglesCol(text: Column, nWords: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), nWords))
  def shinglesAllCol(text: Column, nWords: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), nWords, distinct = false))
  def jaccardCol(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def stringHash31Col(s: Column): Column =
    ExpressionUtils.column(StringHash31(ExpressionUtils.expression(s)))
  def simhashVotesCol(hashes: Column, nBits: Int): Column =
    ExpressionUtils.column(SimHashVotes(ExpressionUtils.expression(hashes), nBits))
  def markerHitsCol(tokens: Column, markers: Seq[String]): Column =
    ExpressionUtils.column(MarkerHits(ExpressionUtils.expression(tokens), markers))
  def charStatsCol(text: Column): Column =
    ExpressionUtils.column(TextCharStats(ExpressionUtils.expression(text)))
  def deflateRatioCol(text: Column, level: Int): Column =
    ExpressionUtils.column(DeflateRatio(ExpressionUtils.expression(text), level))
  def unicodeNormalizeCol(text: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(text), form))
}
