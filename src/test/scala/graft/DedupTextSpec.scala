package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Dedup + text-analysis operator semantics on hand fixtures. */
class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: n-grams, distinct, short-text edge") {
    val df = Seq("a b c d", "a b", "").toDF("t")
    val out = df.select(Dedup.shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
  }

  test("exact duplicates: groups, keeper, dedup") {
    val df = Seq((1L, "x y"), (2L, "z"), (3L, "x y"), (4L, "x y")).toDF("id", "t")
    val groups = Dedup.exactDuplicates(df, "id", "t").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_copies") == 3)
    assert(groups(0).getAs[Long]("keeper_id") == 1L)
    assert(groups(0).getSeq[Long](3) == Seq(1L, 3L, 4L))
    val kept = Dedup.dedupExact(df, "id", "t").select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("normalizeUrl: case, default ports, tracking params, fragments, sorting, passthrough") {
    val cases = Seq(
      "HTTP://ExAmple.COM:80/Path?b=2&utm_source=x&a=1#frag"
        -> "http://example.com/Path?a=1&b=2",
      "https://a.com:443" -> "https://a.com/",
      "https://a.com:8443/x" -> "https://a.com:8443/x",
      "ftp://H.com:80/f" -> "ftp://h.com:80/f", // 80 not ftp's default
      "https://a.com/?utm_medium=m&fbclid=z&gclid=g" -> "https://a.com/",
      "  not a url  " -> "not a url", // passthrough, trimmed only
      "https://a.com/p?a=1&A=2" -> "https://a.com/p?A=2&a=1") // byte sort
    val got = cases.map(_._1).toDF("u")
      .select(graft.ops.TextOps.normalizeUrl(col("u"))).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, want) => assert(g == want, s"$g != $want") }
  }

  test("ngramNovelty: exact copies score 0, disjoint docs 1, partial overlap in between; short docs omitted") {
    val a = "one two three four five six"
    val df = Seq((1L, a), (2L, a), // mutual copies: every trigram shared
      (3L, "seven eight nine ten eleven"), // fully novel
      (4L, "one two three zz yy xx"), // 1 of 4 trigrams shared with 1/2
      (5L, "too short")).toDF("id", "t")
    val got = TextOps.ngramNovelty(df, "id", col("t"), n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1) == ((4L, 0.0)) && got(2) == ((4L, 0.0)))
    assert(got(3) == ((3L, 1.0)))
    assert(got(4)._1 == 4L && math.abs(got(4)._2 - 0.75) < 1e-9)
    assert(!got.contains(5L))
  }

  test("winnowing: shared >= w+k-1 run guarantees a shared fingerprint; disjoint docs share none; density ~ 2/(w+1)") {
    val k = 3; val w = 4
    val runA = (1 to 6).map(i => s"shared$i") // exactly w+k-1 = 6 tokens
    val docA = ((1 to 20).map(i => s"a$i") ++ runA ++ (21 to 40).map(i => s"a$i")).mkString(" ")
    val docB = ((1 to 20).map(i => s"b$i") ++ runA ++ (21 to 40).map(i => s"b$i")).mkString(" ")
    val docC = (1 to 46).map(i => s"c$i").mkString(" ") // fully disjoint
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("id", "t")
    val fp = Dedup.winnowingFingerprints(df, "id", "t", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    def hs(id: Long) = fp.filter(_._1 == id).map(_._2).toSet
    assert((hs(1) intersect hs(2)).nonEmpty, "guaranteed shared fingerprint missing")
    assert((hs(1) intersect hs(3)).isEmpty && (hs(2) intersect hs(3)).isEmpty)
    // expected density 2/(w+1) = 0.4 of gram positions; allow wide slack
    val nGrams = 46 - k + 1
    val d = fp.count(_._1 == 3).toDouble / nGrams
    assert(d > 0.15 && d < 0.7, s"density $d")
    // determinism
    val again = Dedup.winnowingFingerprints(df, "id", "t", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(again == fp.sorted.toSeq)
  }

  test("bigramKneserNey: hand-computed probabilities; seen continuations sum to 1 per context") {
    // corpus bigrams: "a b" x2, "a c" x1 -> c(a.)=3, N1+(a.)=2, N1+(.b)=1,
    // N1+(.c)=1, N1+(..)=2; D=0.75:
    //   P(b|a) = 1.25/3 + (0.75*2/3)(1/2) = 2/3;  P(c|a) = 0.25/3 + 0.25 = 1/3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "t")
    val got = TextOps.bigramKneserNeyScore(df, "id", col("t"))
      .select("id", "n_bigrams", "ppl").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(1L, 1L, 1L))
    assert(math.abs(got(0)._3 - 1.5) < 1e-9, got(0)) // 1/P(b|a)
    assert(math.abs(got(2)._3 - 3.0) < 1e-9, got(2)) // 1/P(c|a)
    // interpolated KN is a proper distribution over the seen vocabulary:
    // here every continuation of 'a' is observed, so P(b|a)+P(c|a) = 1
    assert(math.abs((1.0 / got(0)._3) + (1.0 / got(2)._3) - 1.0) < 1e-9)
  }

  test("packSequencesWhole: greedy fill, oversize-alone, zero-token docs, chunked waste bound") {
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // budget 10: [5, 4] fill bin0 (9); 3 overflows -> bin1; 12 oversize
    // alone -> bin2; 0-token rides bin2; 6 -> bin3 (12+6 > 10)
    val df = Seq((1L, doc(5)), (2L, doc(4)), (3L, doc(3)), (4L, doc(12)),
      (5L, ""), (6L, doc(6))).toDF("id", "t")
    val got = TextOps.packSequencesWhole(df, "id", col("t"),
        Seq(col("id")), budgetTokens = 10)
      .select("id", "bin", "offset").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 5L), (3L, 1L, 0L),
      (4L, 2L, 0L), (5L, 2L, 12L), (6L, 3L, 0L)), got.toSeq)
    // chunked regime: tiny chunks force splits; every doc stays whole,
    // per-bin fill never exceeds the budget (except oversize-alone bins),
    // and the bin count exceeds the global greedy by <= 1 bin per chunk
    val many = (1L to 200L).map(i => (i, doc(1 + (i % 7).toInt))).toDF("id", "t")
    def binsOf(chunkBins: Int) = TextOps.packSequencesWhole(many, "id",
        col("t"), Seq(col("id")), budgetTokens = 10, chunkBins = chunkBins)
      .select("id", "n_tokens", "bin", "offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val global = binsOf(1 << 14)
    val chunked = binsOf(4) // chunks of 40 tokens
    assert(chunked.groupBy(_._3).values.forall(rows =>
      rows.map(_._2).sum <= 10 || rows.length == 1), "bin overflow")
    val nChunks = math.ceil(global.map(_._2).sum / 40.0)
    assert(chunked.map(_._3).distinct.length <=
      global.map(_._3).distinct.length + nChunks, "waste bound")
    // order preserved: offsets within a bin increase with id
    chunked.groupBy(_._3).values.foreach { rows =>
      assert(rows.sortBy(_._1).map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    }
  }

  test("tokenAugment: rate-0 identity, rate-1 total, deterministic, independent streams") {
    val df = Seq((7L, "a b c d e f g h i j"), (8L, "")).toDF("id", "t")
    def run(drop: Double, mask: Double) = df
      .select(col("id"), graft.ops.TextOps.tokenAugment(col("id"), col("t"),
        drop, mask, seed = 5L).as("a"))
      .orderBy("id").collect()
      .map(r => (r.getStruct(1).getLong(0), r.getStruct(1).getString(1),
        r.getStruct(1).getLong(2), r.getStruct(1).getString(3),
        r.getStruct(1).getLong(4)))
    val identity = run(0.0, 0.0)
    assert(identity(0) == ((10L, "a b c d e f g h i j", 10L, "a b c d e f g h i j", 0L)))
    assert(identity(1) == ((0L, "", 0L, "", 0L)))
    val total = run(1.0, 1.0)
    assert(total(0)._3 == 0L && total(0)._2 == "")
    assert(total(0)._5 == 10L && total(0)._4 == Seq.fill(10)("<mask>").mkString(" "))
    // deterministic across runs; a mid rate drops SOME but not all; the
    // two streams are independent (different sets at the same seed/rate)
    val r1 = run(0.4, 0.4); val r2 = run(0.4, 0.4)
    assert(r1.toSeq == r2.toSeq)
    assert(r1(0)._3 > 0L && r1(0)._3 < 10L, r1(0))
    val keptTokens = r1(0)._2.split(" ").toSet
    val unmasked = r1(0)._4.split(" ").filter(_ != "<mask>").toSet
    assert(keptTokens != unmasked, "dropout and mask streams should differ")
  }

  test("wordlistHits: case-insensitive, punctuation-stripped occurrence counts") {
    val df = Seq(
      "The BAD word and another bad, word.", // 'bad' twice (case, punct)
      "perfectly clean text here",
      "",
      "bad-ly is not the word bad is") // inner '-' survives the edge
      // strip, so 'bad-ly' is no hit; bare 'bad' is -> 1
      .toDF("t")
    val got = df.select(graft.ops.TextOps.wordlistHits(col("t"), Seq("bad", "evil")).as("h"))
      .select("h.n_hits", "h.pass").collect()
      .map(r => (r.getInt(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((2, false), (0, true), (0, true), (1, false)), got.toSeq)
  }

  test("containment: short-in-long found at C=1 where Jaccard is tiny; join == brute; directed") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")         // 39 bigrams
    val short = (1 to 5).map(i => s"w$i").mkString(" ")         // 4 bigrams, all in long
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, other)).toDF("id", "t")
    // Jaccard(short, long) = 4/39 ≈ 0.10 — invisible to any LSH threshold
    val j = Dedup.jaccardSimilarity(df, "id", "t", n = 2)
      .where(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").head().getDouble(0)
    assert(j < 0.15, s"jaccard $j")
    val brute = Dedup.containmentPairs(df, "id", "t", n = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute == Set((2L, 1L, 1.0))) // directed: short ⊆ long only
    val joined = Dedup.containmentJoin(df, "id", "t", n = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(joined == brute)
  }

  test("dedupByContainment: contained docs drop, containers survive, exact dups keep lowest id") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 5).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, other), (4L, long)).toDF("id", "t")
    val kept = Dedup.dedupByContainment(df, "id", "t", n = 2, threshold = 0.9)
      .select("id").collect().map(_.getLong(0)).toSet
    // 2 ⊂ 1 drops; 4 == 1 exactly, lowest id 1 survives; 3 unrelated
    assert(kept == Set(1L, 3L), kept)
  }

  test("containmentJoin == containmentPairs on a randomized overlapping corpus (losslessness)") {
    // 60 docs over a 12-word vocab: heavy shingle sharing stresses the
    // prefix filter's recall at several thresholds
    val rnd = new scala.util.Random(7)
    val docs = (1L to 60L).map { i =>
      val len = 4 + rnd.nextInt(12)
      (i, Seq.fill(len)(s"w${rnd.nextInt(12)}").mkString(" "))
    }
    val df = docs.toDF("id", "t")
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val brute = Dedup.containmentPairs(df, "id", "t", n = 1, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet
      val joined = Dedup.containmentJoin(df, "id", "t", n = 1, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9))).toSet
      assert(joined == brute, s"threshold $t: ${joined.size} vs ${brute.size}")
    }
  }

  test("splitLeakage: only cross-split verified near-dup pairs survive") {
    // 1 ~ 2 (near-dups, different splits -> LEAK), 1 ~ 3 (near-dups, SAME
    // split -> excluded), 4 unrelated, 5 cross-split but below threshold
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon", "train"),
      (2L, "alpha beta gamma delta zeta", "eval"),   // J(1,2)=4/6
      (3L, "alpha beta gamma delta eta", "train"),   // J(1,3)=4/6, same split
      (4L, "completely different words here now", "eval"),
      (5L, "alpha beta unrelated tail words", "eval") // J(1,5)=2/8
    ).toDF("id", "t", "split")
    val got = Dedup.splitLeakage(df, "id", "t", "split", threshold = 0.6,
        numShingleWords = 1, numBands = 16, rowsPerBand = 1)
      .select("id_a", "id_b", "split_a", "split_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSet == Set((1L, 2L, "train", "eval"), (2L, 3L, "eval", "train")), got.toSeq)
  }

  test("dedupParagraphs: global first occurrence wins, within-doc repeats collapse, reassembly preserves order") {
    val df = Seq(
      (1L, "intro text\n\nshared footer\n\nintro text"), // within-doc repeat
      (2L, "shared footer\n\nunique body"),              // cross-doc dup of footer
      (3L, "shared footer"),                             // fully emptied
      (4L, "\n\n  \n\nlast one\n\n")                     // empty/ws segments dropped
    ).toDF("id", "t")
    val out = Dedup.dedupParagraphs(df, "id", "t").collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 3 paragraphs, the repeated "intro text" kept once (pos 0),
    // footer's first global occurrence is (1, 1) so it stays
    assert(out(1L).getAs[Long]("n_paras") == 3)
    assert(out(1L).getAs[Long]("n_kept") == 2)
    assert(out(1L).getAs[String]("text_clean") == "intro text\n\nshared footer")
    // doc 2: footer already seen at (1,1) -> only the unique body survives
    assert(out(2L).getAs[String]("text_clean") == "unique body")
    assert(out(2L).getAs[Long]("n_kept") == 1)
    // doc 3: everything seen before -> empty text, row kept
    assert(out(3L).getAs[String]("text_clean") == "")
    assert(out(3L).getAs[Long]("n_kept") == 0)
    // doc 4: whitespace-only segments never become paragraphs
    assert(out(4L).getAs[Long]("n_paras") == 1)
    assert(out(4L).getAs[String]("text_clean") == "last one")
  }

  test("bigramLmScore: fluent repeats outrank scrambles; short docs omitted; hand-checked probability") {
    val df = Seq(
      (1L, "a b a b a b"),  // fluent under the corpus model
      (2L, "b a b a a"),    // contains the rare 'a a' transition
      (3L, "a")             // no bigrams
    ).toDF("id", "t")
    val out = TextOps.bigramLmScore(df, "id", col("t")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(3L))
    assert(out(1L)._1 == 5 && out(2L)._1 == 4)
    assert(out(1L)._2 > out(2L)._2, s"$out")
    // hand check one probability: c(a b)=3+... corpus bigrams:
    // doc1: ab ba ab ba ab; doc2: ba ab ba aa -> c(ab)=4? no: doc2 'b a b a a'
    // gives ba, ab, ba, aa -> c(ab)=4, c(ba)=4, c(aa)=1; prefix a: ab+aa=5,
    // prefix b: 4; V=2. p(b|a)=(4+1)/(5+2)=5/7.
    val lpAb = math.log(5.0 / 7.0)
    val lpBa = math.log((4.0 + 1.0) / (4.0 + 2.0))
    val exp1 = (lpAb * 3 + lpBa * 2) / 5
    assert(approx(out(1L)._2, exp1, 1e-9))
  }

  test("corpusReport: hand-checked metrics on a tiny corpus") {
    val df = Seq(
      (1L, "a b c", "en"), (2L, "a b c", "en"),   // exact dup pair
      (3L, "d E", "de"), (4L, "", "de")           // empty doc
    ).toDF("id", "t", "g")
    val m = TextOps.corpusReport(df, col("id"), col("t"), col("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_docs") == 4.0 && m("n_tokens") == 8.0)
    assert(m("avg_tokens") == 2.0 && m("empty_rate") == 0.25)
    assert(approx(m("exact_dup_rate"), 0.25)) // 3 distinct of 4
    assert(m("vocab_size") == 5.0)            // a b c d e (lower-cased)
    // two equal groups: entropy = ln 2
    assert(approx(m("group_entropy"), math.log(2.0), 1e-9))
  }

  test("selectByTokenBudget: greedy fill per group, inclusive boundary, ties by id") {
    val df = Seq(
      (1L, "g1", 5.0, "a b c"),    // 3 tokens
      (2L, "g1", 9.0, "a b c d"),  // 4 tokens, highest score -> first
      (3L, "g1", 5.0, "a b"),      // 2 tokens, ties doc 1 on score -> after id 1
      (4L, "g2", 1.0, "x"),        // other group: independent budget
      (5L, "g1", 0.5, "z z z z z z z z z")
    ).toDF("id", "g", "score", "t")
    val out = TextOps.selectByTokenBudget(df, "g", col("score"), col("id"),
        col("t"), budgetTokens = 9L)
      .select("id", "cum_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // g1 order: id2 (4), id1 (3, cum 7), id3 (2, cum 9 == budget, kept
    // inclusively), id5 would cross -> dropped with everything after
    assert(out == Map(2L -> 4L, 1L -> 7L, 3L -> 9L, 4L -> 1L))
  }

  test("groupJaccard: exact set overlap, ordering, empty-intersection pairs absent") {
    val df = Seq(
      ("A", "a b c"), ("A", "c d"),      // A tokens: {a,b,c,d}
      ("B", "c d e"),                    // B tokens: {c,d,e}
      ("C", "q r")                       // C disjoint from both
    ).toDF("g", "t")
    val rows = TextOps.groupJaccard(df, col("g"), col("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(rows.keySet == Set(("A", "B"))) // C pairs have empty intersections
    val (na, nb, ni, j) = rows(("A", "B"))
    assert(na == 4 && nb == 3 && ni == 2)
    assert(approx(j, 2.0 / 5.0))
  }

  test("groupJaccard: n-gram form discriminates where 1-gram saturates") {
    val df = Seq(
      ("A", "a b c"), ("B", "c b a") // same vocab, different order
    ).toDF("g", "t")
    val j1 = TextOps.groupJaccard(df, col("g"), col("t"), n = 1)
      .select("jaccard").collect()(0).getDouble(0)
    assert(approx(j1, 1.0))
    // bigrams: A={a b, b c}, B={c b, b a} -> disjoint -> pair absent
    assert(TextOps.groupJaccard(df, col("g"), col("t"), n = 2).count() == 0)
  }

  test("dedupParagraphs: custom separator and id-order keeper tie-break") {
    val df = Seq((10L, "A|B"), (5L, "B|C")).toDF("id", "t")
    val out = Dedup.dedupParagraphs(df, "id", "t", sep = "|").collect()
      .map(r => r.getLong(0) -> r.getAs[String]("text_clean")).toMap
    // B first occurs in doc 5 (smaller id), so doc 10 loses it
    assert(out(5L) == "B|C")
    assert(out(10L) == "A")
  }

  test("jaccard similarity on known sets") {
    val df = Seq((1L, "a b c"), (2L, "b c d"), (3L, "x y z")).toDF("id", "t")
    val sims = Dedup.jaccardSimilarity(df, "id", "t", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(approx(sims((1L, 2L)), 0.5)) // {b,c} / {a,b,c,d}
    assert(approx(sims((1L, 3L)), 0.0))
  }

  test("all-pairs verifiers refuse domains past maxDomain (loud, not an N-squared stage)") {
    val docs = (1 to 10).map(i => (i.toLong, s"w$i x$i y$i")).toDF("id", "t")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.jaccardSimilarity(docs, "id", "t", 1, maxDomain = 5)
    }
    assert(e1.getMessage.contains("maxDomain"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.jaroWinklerPairs(docs, col("t"), 0.9, maxDomain = 5)
    }
    assert(e2.getMessage.contains("maxDomain"))
    // the jaro guard counts DISTINCT values, not input rows: 100 rows
    // over 5 names pass a maxDomain of 5
    val dupes = (1 to 100).map(i => s"name${i % 5}").toDF("t")
    assert(Dedup.jaroWinklerPairs(dupes, col("t"), 0.5, maxDomain = 5).count() > 0)
    // raising the cap deliberately works
    assert(Dedup.jaccardSimilarity(docs, "id", "t", 1, maxDomain = 10).count() == 45)
  }

  test("minhash LSH finds high-jaccard pairs (recall) without false positives after verify") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // ~0.8 to 1
      (3L, "completely different words here nothing shared"),
      (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1
      .toDF("id", "t")
    val pairs = Dedup.minhashNearDuplicates(docs, "id", "t", threshold = 0.5,
      numShingleWords = 1, numBands = 16, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash signature: length, determinism, containment monotonicity") {
    val df = Seq("a b c d e f", "a b c d e f", "q r s").toDF("t")
    val sigs = df.select(Dedup.minhashSignature(col("t"), 1, 32)).collect()
      .map(_.getSeq[Long](0))
    assert(sigs.forall(_.size == 32))
    assert(sigs(0) == sigs(1)) // same text, same signature
    assert(sigs(0) != sigs(2))
  }

  test("simhash: identical texts collide, disjoint texts differ, hamming bounds") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("id", "t")
    val fps = df.select(col("id"), Dedup.simhash(col("t")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    val d = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(d > 0 && d <= 64)
    val hd = df.as("a").crossJoin(df.as("b"))
      .where(col("a.id") === 1 && col("b.id") === 3)
      .select(Dedup.hamming64(Dedup.simhash(col("a.t")), Dedup.simhash(col("b.t"))))
      .head().getInt(0)
    assert(hd == d)
  }

  test("tokenCount / subwordCount edges") {
    val df = Seq("", "   ", "one", "a b  c", "ab1 cd, x!").toDF("t")
    val out = df.select(TextOps.tokenCount(col("t")), TextOps.subwordCount(col("t"))).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 0, 1, 3, 3))
    assert(out(4).getInt(1) == 6) // ab,1,cd,',',x,'!'
  }

  test("languageId picks the marker-dominant language, und on no hits") {
    val df = Seq(
      "the cat is in the house and it is big",
      "el gato y la casa en la calle",
      "zzz qqq www").toDF("t")
    val out = df.select(TextOps.languageId(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("qualityScore in [0,1], higher for clean prose than for junk") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs for a while in the field",
      "!!! ??? *** 123 456 789 @@@ ###").toDF("t")
    val out = df.select(TextOps.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(out.forall(s => s >= 0 && s <= 1))
    assert(out(0) > out(1))
  }

  test("rollingFingerprint is order-sensitive") {
    val df = Seq("a b c", "c b a", "a b c").toDF("t")
    val fps = df.select(TextOps.rollingFingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(2) && fps(0) != fps(1))
  }

  test("repetitionStats: duplicate lines, dominant token, repeated 2-grams") {
    val df = Seq(
      ("same line\nother line\nsame line", 1L), // 1 dup line of 3
      ("a a a a b", 2L), // top word 4/5; 2-grams: "a a"×3, "a b" → dup 2/4
      ("all distinct words here", 3L),
      ("", 4L)).toDF("t", "id")
    val out = df.select(col("id"), graft.ops.TextOps.repetitionStats(col("t")).as("r"))
      .select(col("id"), col("r.dup_line_ratio"), col("r.top_word_ratio"), col("r.dup_2gram_ratio"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(out(1L)._1 - (1.0 - 2.0 / 3)) < 1e-12)
    assert(out(2L)._2 == 0.8 && out(2L)._3 == 0.5)
    assert(out(3L) == ((0.0, 0.25, 0.0)))
    assert(out(4L) == ((0.0, 0.0, 0.0)))
  }

  test("redactPii: urls, emails, long digit runs; short numbers survive") {
    val df = Seq("mail me at a.b+c@x-y.co or visit https://x.y/z?q=1 id 123456789 pin 1234").toDF("t")
    val out = df.select(graft.ops.TextOps.redactPii(col("t"))).head().getString(0)
    assert(out == "mail me at <EMAIL> or visit <URL> id <NUM> pin 1234")
    val c = df.select(graft.ops.TextOps.piiCounts(col("t")).as("c"))
      .select("c.n_emails", "c.n_urls", "c.n_longnums").head()
    assert((c.getInt(0), c.getInt(1), c.getInt(2)) == ((1, 1, 1)))
  }

  test("stratifiedSample: deterministic, rate-monotone, honors per-group rates") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "g")
    def run(rates: Map[String, Double]) = graft.ops.Stats
      .stratifiedSample(df, col("id"), col("g"), rates, defaultRate = 0.0, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    val half = run(Map("en" -> 0.5))
    assert(run(Map("en" -> 0.5)) == half) // deterministic
    assert(half.forall(_ % 2 == 0)) // default 0 drops 'de' entirely
    assert(math.abs(half.size - 500) < 120) // ~0.5 of the 1000 'en' rows
    assert(run(Map("en" -> 0.2)).subsetOf(half)) // nested: lower rate ⊂ higher
  }

  test("matchDistribution: kept marginal tracks the target, surplus groups thin, absent groups drop") {
    // 4000 'en', 1000 'de', 500 'fr', 500 'zh'; target en:de:fr = 2:1:1.
    // fr most under-shoots (0.25/500 per-row ratio) → kept whole; en must
    // thin to ~2x fr's count, de to ~1x; zh (no target) drops entirely.
    val df = (1L to 6000L).map { i =>
      val g = if (i <= 4000) "en" else if (i <= 5000) "de" else if (i <= 5500) "fr" else "zh"
      (i, g)
    }.toDF("id", "g")
    def run(target: Map[String, Double]) = graft.ops.Stats
      .matchDistribution(df, col("id"), col("g"), target, seed = 13L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val target = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25)
    val kept = run(target)
    val byG = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byG("fr") == 500, s"most-under-shot group kept whole: $byG")
    assert(!byG.contains("zh"), "untargeted group must drop")
    // expectation: en 1000, de 500 — allow 4-sigma-ish hash noise
    assert(math.abs(byG("en") - 1000) < 120, byG.toString)
    assert(math.abs(byG("de") - 500) < 90, byG.toString)
    // deterministic under repartitioning
    val repart = graft.ops.Stats
      .matchDistribution(df.repartition(13), col("id"), col("g"), target, seed = 13L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(repart.toSet == kept.toSet)
    // nesting: halving one group's target keeps a subset of its rows
    val smaller = run(Map("en" -> 0.25, "de" -> 0.25, "fr" -> 0.25))
      .filter(_._2 == "en").toSet
    assert(smaller.subsetOf(kept.filter(_._2 == "en").toSet))
  }

  test("tfIdfTopTerms: rare terms outscore common at equal tf; tf breaks through idf") {
    val docs = Seq((1L, "alpha alpha rare"), (2L, "alpha beta"), (3L, "alpha beta")).toDF("id", "t")
    val out = graft.ops.TextOps.tfIdfTopTerms(docs, "id", col("t"), k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(4)) -> r.getString(1)).toMap
    // N=3: idf(alpha, df=3) = ln(4/4)+1 = 1; idf(rare, df=1) = ln(2)+1 ≈ 1.69;
    // idf(beta, df=2) = ln(4/3)+1 ≈ 1.29
    // doc1: alpha tf=2 → 2.0 beats rare 1.69 → [alpha, rare]
    assert(out((1L, 1)) == "alpha" && out((1L, 2)) == "rare")
    // doc2: beta 1.29 beats alpha 1.0
    assert(out((2L, 1)) == "beta" && out((2L, 2)) == "alpha")
  }

  test("edge robustness: null text, empty edges, empty benchmark, empty quota input") {
    val nullDoc = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("id", "t")
    // tokenCount(null) must be 0, not Spark's size(null) = -1
    val packed = graft.ops.TextOps.packSequences(nullDoc, col("t"), Seq(col("id")), 4)
      .select("id", "n_tokens", "offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed(1L) == ((0L, 0L)) && packed(2L) == ((2L, 0L)))
    // no edges → all singletons
    val nodes = Seq(1L, 2L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(nodes, noEdges, "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L, 2L -> 2L))
    // empty benchmark → nothing contaminated
    assert(Dedup.decontaminate(Seq((1L, "a b c d")).toDF("id", "t"), "id", "t",
      Seq.empty[String].toDF("bt"), "bt", 3).count() == 0)
    // empty input → empty quota output
    assert(graft.ops.Stats.quotaPerGroup(Seq.empty[(Long, String)].toDF("id", "g"),
      col("id"), col("g"), Map("x" -> 1), 1, 7L).count() == 0)
  }

  test("packSequences: bins cut every budget tokens; long docs span bins; empty docs zero-width") {
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, ""), (4L, "f g h i j k"), (5L, "l"))
      .toDF("id", "t") // token counts: 3, 2, 0, 6, 1 ; budget 4
    val out = graft.ops.TextOps.packSequences(df, col("t"), Seq(col("id")), budgetTokens = 4)
      .select("id", "n_tokens", "bin", "offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // prefix starts: 0, 3, 5, 5, 11
    assert(out == Map(
      1L -> ((3L, 0L, 0L)), 2L -> ((2L, 0L, 3L)), 3L -> ((0L, 1L, 1L)),
      4L -> ((6L, 1L, 1L)), 5L -> ((1L, 2L, 3L))))
  }

  test("packSequencesSplit: boundary pieces cover each doc exactly; bins full except the tail") {
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, ""), (4L, "f g h i j k"), (5L, "l"))
      .toDF("id", "t") // token counts: 3, 2, 0, 6, 1 ; budget 4; total 12
    val out = graft.ops.TextOps
      .packSequencesSplit(df, col("t"), Seq(col("id")), budgetTokens = 4)
      .select("id", "bin", "offset", "piece_len", "token_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(p => (p._1, p._2)).toSeq
    // doc2 [3,5) splits at 4: (bin0 off3 len1 ts0), (bin1 off0 len1 ts1);
    // doc4 [5,11) splits at 8: (bin1 off1 len3 ts0), (bin2 off0 len3 ts3);
    // doc3 is empty → one zero-length piece at its position (bin1 off1)
    assert(out == Seq(
      (1L, 0L, 0L, 3L, 0L),
      (2L, 0L, 3L, 1L, 0L), (2L, 1L, 0L, 1L, 1L),
      (3L, 1L, 1L, 0L, 0L),
      (4L, 1L, 1L, 3L, 0L), (4L, 2L, 0L, 3L, 3L),
      (5L, 2L, 3L, 1L, 0L)))
    // laws: pieces of a doc sum to its token count and chain contiguously;
    // every bin except the last is exactly full
    val byDoc = out.groupBy(_._1)
    val nTok = Map(1L -> 3L, 2L -> 2L, 3L -> 0L, 4L -> 6L, 5L -> 1L)
    byDoc.foreach { case (id, ps) =>
      assert(ps.map(_._4).sum == nTok(id), s"doc $id")
      assert(ps.map(_._5).min == 0L)
    }
    val byBin = out.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(byBin == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    // first piece of each doc agrees with packSequences' (bin, offset)
    val plain = graft.ops.TextOps
      .packSequences(df, col("t"), Seq(col("id")), budgetTokens = 4)
      .select("id", "bin", "offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    byDoc.foreach { case (id, ps) =>
      val first = ps.minBy(_._2)
      assert(plain(id) == ((first._2, first._3)), s"doc $id first piece")
    }
  }

  test("removeDuplicateSpans: shared tiles deleted everywhere, unique tiles and tails survive") {
    val shared = "a b c d e f g h" // one exact 8-token tile
    val docs = Seq(
      (1L, s"$shared i j k l m n o p q r"), // shared tile + unique tile + 2-token tail
      (2L, s"$shared z y"),                 // shared tile + 2-token tail
      (3L, "entirely different words that never repeat anywhere at all ok")) // 10 tokens: 1 tile + tail
      .toDF("id", "t")
    val out = graft.ops.Dedup
      .removeDuplicateSpans(docs, "id", "t", w = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("i j k l m n o p q r", 1L))) // shared tile gone, rest intact
    assert(out(2L) == (("z y", 1L)))
    assert(out(3L)._2 == 0L) // nothing removed
    assert(out(3L)._1 == "entirely different words that never repeat anywhere at all ok")
  }

  test("removeDuplicateSpans: sub-w-token docs are untouched under the DEFAULT hash") {
    // Regression: xxhash64(null) is the seed, not null — the outer-explode
    // placeholder row of each tile-less doc used to hash to the same
    // phantom "tile" and, with >= minDocs such docs, each reported
    // n_tiles_removed = 1. The guard must be on the tile TEXT.
    val docs = Seq(
      (1L, "only three tokens"),       // < w: no tiles
      (2L, "two tokens"),              // < w: no tiles
      (3L, "also quite short here"),   // < w: no tiles
      (4L, "a b c d e f g h i"))       // one full tile + 1-token tail
      .toDF("id", "t")
    val out = graft.ops.Dedup
      .removeDuplicateSpans(docs, "id", "t", w = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (("only three tokens", 0L)))
    assert(out(2L) == (("two tokens", 0L)))
    assert(out(3L) == (("also quite short here", 0L)))
    assert(out(4L) == (("a b c d e f g h i", 0L)))
  }

  test("connectedComponents: 3000-node chain converges inside default maxIter (pointer jumping)") {
    // diameter 2999 — O(diameter) label propagation could NOT finish in 25
    // rounds; path halving must (O(log d)), labeling everything node 0
    val n = 3000
    val nodes = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val comps = Dedup.connectedComponents(nodes, edges, "id", "a", "b",
        localEdgeThreshold = 0) // pin the DISTRIBUTED loop — this test is about pointer jumping
      .select("component").distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(0L))
  }

  test("connectedComponents: hitting maxIter un-converged throws instead of returning partial labels") {
    // diameter-9 chain cannot converge in one round even with halving
    val nodes = (0L until 10L).toDF("id")
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(nodes, edges, "id", "a", "b",
        maxIter = 1, localEdgeThreshold = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents: local union-find fast path == distributed loop (parity)") {
    // seeded pseudo-random graph: 60 nodes, 45 edges → mixed components
    val nodes = (0L until 60L).toDF("id")
    val edges = (0 until 45)
      .map(i => ((i * 37 + 11) % 60L, (i * 53 + 29) % 60L))
      .filter(e => e._1 != e._2).toDF("a", "b")
    val local = Dedup.connectedComponents(nodes, edges, "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(nodes, edges, "id", "a", "b",
        localEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("connectedComponents: local path drops edges with endpoints absent from nodes (parity)") {
    // edge 1—99 has 99 ∉ nodes: it must neither bridge nor label; edge
    // 99—3 must not connect 1 and 3 transitively through the absent 99.
    // String ids also pin the UTF-8 min comparison.
    val nodes = Seq("a1", "a2", "a3", "b1").toDF("id")
    val edges = Seq(("a1", "zz"), ("zz", "a3"), ("a1", "a2")).toDF("a", "b")
    for (thr <- Seq(0, 1 << 18)) {
      val got = Dedup.connectedComponents(nodes, edges, "id", "a", "b",
          localEdgeThreshold = thr)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("a1" -> "a1", "a2" -> "a1", "a3" -> "a3", "b1" -> "b1"),
        s"threshold $thr")
    }
  }

  test("connectedComponents: INT edge columns against BIGINT node ids (both regimes)") {
    // the r7 advisor: the local regime collected raw edge values, so an
    // INT edge against BIGINT nodes hit a ClassCastException where the
    // distributed loop's joins coerced implicitly — endpoints now cast to
    // the node id type before the regime split
    val nodes = (0L until 6L).toDF("id") // BIGINT
    val edges = Seq((0, 1), (1, 2), (4, 5)).toDF("a", "b") // INT
    for (thr <- Seq(0, 1 << 18)) {
      val got = Dedup.connectedComponents(nodes, edges, "id", "a", "b",
          localEdgeThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 4L),
        s"threshold $thr")
    }
  }

  test("substringDuplicates: catches unaligned cross-doc runs that tiles provably miss; exact boundaries") {
    // doc 1: tokens a1..a100. doc 2: 3 unrelated tokens + a2..a50 (a
    // 49-token shared run starting at offset 1 in doc 1, offset 3 in doc
    // 2) + unrelated tail. 50-token tiles cut doc 1 at [0,50)/[50,100)
    // and doc 2 at [0,50): no tile is shared -> duplicateSpans is blind.
    val a = (1 to 100).map(i => s"a$i")
    val doc1 = a.mkString(" ")
    val doc2 = (Seq("x1", "x2", "x3") ++ a.slice(1, 50) ++ Seq("z1", "z2")).mkString(" ")
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val tiles = Dedup.duplicateSpans(df, "doc_id", "text", w = 50, minDocs = 2)
      .where(col("n_dup_tiles") > 0).count()
    assert(tiles == 0L, "50-token tiles must miss the offset run (the documented gap)")
    // stride-1 windows of w=10: every >= 10-token shared run is caught
    val spans = Dedup.substringDuplicates(df, "doc_id", "text", w = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 1: windows at pos 1..40 are shared (tokens a2..a50 = [1, 50));
    // doc 2: the run occupies token positions [3, 52) -> windows 3..42
    assert(spans == Set((1L, 1L, 50L, 40L), (2L, 3L, 52L, 40L)), spans.toString)
  }

  test("substringDuplicates: content-keyed grain; within-doc repeats don't count; separate islands stay separate") {
    val shared = (1 to 30).map(i => s"s$i")
    val df = Seq(
      (1L, (shared ++ Seq("p", "q", "r") ++ shared.map(t => t + "x")).mkString(" ")),
      (2L, (Seq("u", "v") ++ shared ++ Seq("w") ++ shared.map(t => t + "x")).mkString(" ")),
      // doc 3 repeats its own phrase but shares nothing cross-doc
      (3L, (Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7", "m8", "m9", "m10") ++
        Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7", "m8", "m9", "m10")).mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.substringDuplicates(df, "doc_id", "text", w = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // two distinct shared runs per doc (gap > w between them) -> two islands each
    assert(spans == Set((1L, 0L, 30L), (1L, 33L, 63L), (2L, 2L, 32L), (2L, 33L, 63L)),
      spans.toString)
    // a doc-internal repeat alone never reaches minDocs
    assert(!spans.exists(_._1 == 3L))
    // content-keyed grain 5 keeps ~1/5 of windows yet still catches the
    // 30-token runs (21 windows each; selection is offset-invariant, so
    // both docs keep the SAME windows of a shared run)
    val coarse = Dedup.substringDuplicates(df, "doc_id", "text", w = 10, grain = 5)
      .collect().map(r => r.getLong(0)).toSet
    assert(coarse == Set(1L, 2L))
  }

  test("decontaminate: counts distinct shared n-grams; clean docs absent") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" + "quick brown fox"
      (2L, "completely different words entirely"),
      (3L, "quick brown fox quick brown fox")).toDF("id", "t") // dup grams count once
    val bench = Seq("the quick brown fox runs").toDF("bt")
    val out = Dedup.decontaminate(corpus, "id", "t", bench, "bt", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L)) // doc 2 clean → absent
  }

  test("connectedComponents: chain collapses transitively, components split, singletons keep own id") {
    // chain 1-2-3-4-5 (diameter 4 → needs >1 propagation round),
    // pair {10,11}, singleton 20
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L), (10L, 11L)).toDF("a", "b")
    val comp = Dedup.connectedComponents(nodes, edges, "id", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    val keep = Dedup.dedupByComponent(
      Dedup.connectedComponents(nodes, edges, "id", "a", "b"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keep == Map(1L -> 1L, 10L -> 10L, 20L -> 20L))
  }

  test("gopherRules: each rule trips on its designed violation and only then") {
    val good = "the cat and dog have been out to the park with all " +
      "their friends that day for fun walks near home fields"
    val docs = Seq(
      (1L, good),                                            // passes all
      (2L, "the of and to " + ("x " * 20)),                  // short-token mean < 3
      (3L, good + " ### ##"),                                // symbol ratio
      (4L, "- the cat\n- and dog\n- have fun\n- to play\n- of it"), // bullets
      (5L, "the cat and...\nthe dog have...\nto the park..."),      // ellipsis
      (6L, "the of " + (1 to 20).map(_.toString).mkString(" ")),    // non-alpha
      (7L, good.replaceAll("\\b(the|and|to|of|have|that|with)\\b", "zz")), // stopwords
      (8L, ""))                                              // empty
      .toDF("doc_id", "text")
    val g = docs.select(col("doc_id"),
        TextOps.gopherRules(col("text"), minWords = 5).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getAs[Boolean]("pass"), "clean doc passes every rule")
    def failsOnly(id: Long, rule: String): Unit = {
      val r = g(id)
      assert(!r.getAs[Boolean](rule), s"doc $id should fail $rule")
      assert(!r.getAs[Boolean]("pass"))
    }
    failsOnly(2L, "ok_mean_word_len")
    failsOnly(3L, "ok_symbol_ratio")
    failsOnly(4L, "ok_bullet_lines")
    assert(g(4L).getAs[Double]("bullet_ratio") == 1.0)
    failsOnly(5L, "ok_ellipsis_lines")
    assert(g(5L).getAs[Double]("ellipsis_ratio") == 1.0)
    failsOnly(6L, "ok_alpha_words")
    failsOnly(7L, "ok_stopwords")
    // empty doc: zero words/lines -> ratio rules pass vacuously, word count fails
    val e = g(8L)
    assert(e.getAs[Int]("n_words") == 0 && !e.getAs[Boolean]("ok_word_count"))
    assert(e.getAs[Boolean]("ok_symbol_ratio") && e.getAs[Boolean]("ok_bullet_lines"))
    assert(!e.getAs[Boolean]("pass"))
    // unicode ellipsis and bullet count too
    val u = Seq((9L, "• the cat…\nthe dog and fox have to go…"))
      .toDF("doc_id", "text")
    val ur = u.select(TextOps.gopherRules(col("text"), minWords = 1).as("g"))
      .select(col("g.*")).collect()(0)
    assert(ur.getAs[Double]("bullet_ratio") == 0.5)
    assert(ur.getAs[Double]("ellipsis_ratio") == 1.0)
  }

  test("c4Clean: line rules (terminal punct, min words, javascript) and sentence count") {
    val page = Seq(
      "This line has enough words and ends well.", // kept
      "Too short line.",                           // 3 words -> dropped
      "this line has plenty of words but no terminal punctuation", // dropped
      "Please enable JavaScript to continue reading this article.", // dropped
      "Is this a proper question line?",           // kept
      "\"A quoted line with five words here.\""    // ends with quote -> kept
    ).mkString("\n")
    val r = Seq(page).toDF("t")
      .select(TextOps.c4Clean(col("t")).as("c")).select("c.*").head()
    assert(r.getAs[Int]("n_lines") == 6)
    assert(r.getAs[Int]("n_lines_kept") == 3)
    assert(r.getAs[String]("cleaned_text") ==
      Seq("This line has enough words and ends well.",
        "Is this a proper question line?",
        "\"A quoted line with five words here.\"").mkString("\n"))
    // runs of [.!?]+ in the CLEANED text: '.', '?', '.' (the closing
    // quote splits the final run)
    assert(r.getAs[Int]("n_sentences") == 3)
    assert(!r.getAs[Boolean]("has_lorem_ipsum"))
    assert(!r.getAs[Boolean]("has_curly_brace"))
    assert(r.getAs[Boolean]("ok_sentences") && r.getAs[Boolean]("pass"))
  }

  test("c4Clean: each page-level rule fails on its own violation") {
    val good = Seq(
      "The first sentence here is fine and real.",
      "The second sentence here is fine and real.",
      "The third sentence here is fine and real.").mkString("\n")
    def flags(t: String) = Seq(t).toDF("t")
      .select(TextOps.c4Clean(col("t")).as("c")).select("c.*").head()
    assert(flags(good).getAs[Boolean]("pass"))
    val lorem = flags(good + "\nLOREM Ipsum dolor sit amet text.")
    assert(lorem.getAs[Boolean]("has_lorem_ipsum") && !lorem.getAs[Boolean]("pass"))
    // the brace line is itself dropped (no terminal punct) but still
    // poisons the page flag
    val brace = flags(good + "\nvar config = { a: 1 }")
    assert(brace.getAs[Boolean]("has_curly_brace") && !brace.getAs[Boolean]("pass"))
    assert(brace.getAs[Int]("n_lines_kept") == 3)
    val short = flags(good.split("\n").take(2).mkString("\n"))
    assert(short.getAs[Int]("n_sentences") == 2)
    assert(!short.getAs[Boolean]("ok_sentences") && !short.getAs[Boolean]("pass"))
    // empty page: nothing kept, every count 0, only the sentence rule fails
    val e = flags("")
    assert(e.getAs[Int]("n_lines_kept") == 0 && e.getAs[String]("cleaned_text") == "")
    assert(!e.getAs[Boolean]("pass") && !e.getAs[Boolean]("has_curly_brace"))
  }

  test("softDedupWeights: weight = n^(-beta), beta regimes") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "z")).toDF("id", "t")
    def w(beta: Double) = Dedup.softDedupWeights(df, "id", "t", beta)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Double]("sample_weight"))).toMap
    val b1 = w(1.0)
    assert(b1(1L) == (3L, 0.333333333) && b1(2L) == (3L, 0.333333333))
    assert(b1(4L) == (1L, 1.0))
    // beta = 0: everything keeps weight 1 (counts still reported)
    assert(w(0.0)(1L) == (3L, 1.0))
    // beta = 0.5: 3^-0.5 rounded to 9 dp
    assert(w(0.5)(1L)._2 == BigDecimal(1.0 / math.sqrt(3.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // total weight of a dup set at beta = 1 is 1.0 (exact-dedup parity
    // in expectation)
    assert(math.abs(b1(1L)._2 * 3 - 1.0) < 1e-8)
  }

  test("corpusDiff: added/removed/changed/unchanged partition the id universe") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val next = Seq((2L, "b"), (3L, "c prime"), (4L, "d")).toDF("id", "t")
    val out = Dedup.corpusDiff(prev, next, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("unicodeNormalize: NFKC folds compatibility forms; NFC composes; bad form rejected") {
    val rows = Seq(
      "ﬁne print",            // ligature fi
      "ｈｅｌｌｏ",             // full-width ASCII
      "café",           // decomposed accent
      "already plain")
      .toDF("t")
      .select(col("t"),
        TextOps.unicodeNormalize(col("t")).as("nfkc"),
        TextOps.unicodeNormalize(col("t"), "NFC").as("nfc"))
      .collect()
    assert(rows(0).getString(1) == "fine print")
    assert(rows(0).getString(2) == "ﬁne print") // NFC keeps the ligature
    assert(rows(1).getString(1) == "hello")
    assert(rows(2).getString(1) == "café" && rows(2).getString(2) == "café")
    assert(rows(3).getString(1) == "already plain")
    // the dedup-key motivation: distinct raw bytes, one key after NFKC
    val keys = Seq("ﬁne", "fine").toDF("t")
      .select(md5(TextOps.unicodeNormalize(col("t")))).distinct().count()
    assert(keys == 1L)
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(TextOps.unicodeNormalize(col("t"), "XXX")).collect()
    }
  }

  test("perplexityBuckets: corpus terciles label head/middle/tail consistently with ppl") {
    val docs = (0 until 9).map { i =>
      // doc i repeats a common phrase and adds i rare words -> spread ppl
      val common = Seq.fill(9 - i)("the cat sat").mkString(" ")
      val rare = (0 until i).map(j => s"zq${i}_$j").mkString(" ")
      (i.toLong, s"$common $rare".trim)
    }.toDF("doc_id", "text")
    val out = TextOps.perplexityBuckets(docs, "doc_id", col("text"))
      .select("doc_id", "ppl_r", "ppl_bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.map(_._3).toSet == Set("head", "middle", "tail"), out.mkString(","))
    // labels are monotone in perplexity (the fences ARE ppl terciles)
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    val sorted = out.sortBy(_._2).map(t => order(t._3))
    assert(sorted.sameElements(sorted.sorted), out.mkString(","))
  }

  test("fellegiSunter: EM recovers m >> u on planted match structure") {
    import graft.ops.RecordLinkage
    // 1000 candidate pairs, 10% planted matches. Matches agree on field
    // 1 90% / field 2 80% of the time; non-matches 5% / 10%. Field 3 is
    // a coin on both sides (uninformative).
    val pairs = (0 until 1000).map { i =>
      val isMatch = i < 100
      val g1 = if (isMatch) i % 10 != 0 else i % 20 == 0
      val g2 = if (isMatch) i % 5 != 0 else i % 10 == 0
      val g3 = i % 2 == 0
      (g1, g2, g3)
    }.toDF("g1", "g2", "g3")
    val model = RecordLinkage.fellegiSunterFit(pairs, Seq("g1", "g2", "g3"),
      lambda0 = 0.1, iters = 30)
    // informative fields separate strongly; the coin field separates
    // LESS than either (the modular fixture induces some g2–g3
    // correlation in the non-match class, so it isn't exactly zero)
    assert(model.m(0) > 0.6 && model.u(0) < 0.2, model)
    assert(model.m(1) > 0.6 && model.u(1) < 0.3, model)
    assert(model.m(2) - model.u(2) < model.m(0) - model.u(0), model)
    assert(model.m(2) - model.u(2) < model.m(1) - model.u(1), model)
    assert(model.lambda > 0.02 && model.lambda < 0.4, model)
    // posterior orders patterns sensibly: full agreement >> full disagreement
    val scored = RecordLinkage.fellegiSunterScore(pairs, model)
      .groupBy("g1", "g2").agg(avg("match_prob").as("p")).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getDouble(2)).toMap
    assert(scored((true, true)) > scored((false, false)), scored)
  }

  test("fellegiSunter: partition-invariant fit, null gammas = disagreement, literal-projection score parity") {
    import graft.ops.RecordLinkage
    val pairs = (0 until 400).map { i =>
      (i < 40 || i % 7 == 0, i % 3 == 0, i % 2 == 0)
    }.toDF("g1", "g2", "g3")
    val m1 = RecordLinkage.fellegiSunterFit(pairs, Seq("g1", "g2", "g3"), iters = 5)
    val m2 = RecordLinkage.fellegiSunterFit(pairs.repartition(7), Seq("g1", "g2", "g3"), iters = 5)
    assert(m1 == m2)
    // null comparison = disagreement (the conservative missing-field rule)
    val withNull = Seq((Some(true), true, true), (None, true, true))
      .toDF("g1", "g2", "g3")
    val s = RecordLinkage.fellegiSunterScore(withNull, m1)
      .select("match_weight").collect().map(_.getDouble(0))
    val asFalse = RecordLinkage.fellegiSunterScore(
      Seq((false, true, true)).toDF("g1", "g2", "g3"), m1)
      .select("match_weight").head().getDouble(0)
    assert(s(1) == asFalse && s(0) != s(1))
    // the score is the closed-form literal fold
    val expected = {
      def t(g: Boolean, v: Double) = if (g) v else 1.0 - v
      val pm = t(false, m1.m(0)) * t(true, m1.m(1)) * t(true, m1.m(2))
      val pu = t(false, m1.u(0)) * t(true, m1.u(1)) * t(true, m1.u(2))
      math.log(pm / pu) / math.log(2.0)
    }
    assert(math.abs(asFalse - expected) < 1e-12)
  }

  test("compressionRatio: exact Deflater parity, ordering, empty-text edge") {
    // comparable byte lengths (~2.5 KB each): at short lengths the fixed
    // deflate header dominates and every ratio collapses toward 1
    val prose = (1 to 40).map(i =>
      s"Sentence number $i talks about the quick brown fox and the lazy dog by river $i.")
      .mkString(" ")
    val repetitive = "ab " * 800
    val highEntropy = (1 to 80).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .mkString(" ")
    def expected(s: String, level: Int = 6): Double = {
      val raw = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(level)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var n = 0L
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      n.toDouble / raw.length
    }
    val rows = Seq(prose, repetitive, highEntropy, "").toDF("t")
      .select(TextOps.compressionRatio(col("t")).as("r"))
      .collect().map(_.getDouble(0))
    assert(rows(0) == expected(prose))
    assert(rows(1) == expected(repetitive))
    assert(rows(2) == expected(highEntropy))
    assert(rows(3) == 1.0)
    assert(rows(1) < rows(0) && rows(0) < rows(2))
    // non-default level flows through
    val r1 = Seq(prose).toDF("t")
      .select(TextOps.compressionRatio(col("t"), level = 1)).head().getDouble(0)
    assert(r1 == expected(prose, 1))
  }
}
