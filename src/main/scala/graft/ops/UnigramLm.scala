package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece `unigram` model), the OTHER major
  * tokenizer family next to [[TextOps.bpeTrain]]'s merge-based BPE:
  * pieces carry log-probabilities and a word segments by Viterbi
  * maximum-likelihood instead of greedy merges.
  *
  * This implementation is the DETERMINISTIC hard-EM (Viterbi-EM)
  * variant: the E-step assigns every word its single best segmentation
  * (max log-likelihood, ties to fewer pieces, then first-found at the
  * shortest extension — a pure function of the word), the M-step
  * re-estimates piece probabilities from the usage counts, keeps every
  * single character plus the top multi-char pieces, and rounds each
  * log-prob to 9 dp (the EM-iterate convention) so the model is
  * bit-stable across partitionings and replayable as literals.
  *
  * Scale shape: the corpus collapses ONCE to its distinct (word, count)
  * table (one shuffle; Heaps' law keeps it tiny relative to tokens) —
  * seeding, every EM iteration, and scoring run over that bounded table
  * with the model broadcast as a plain map; per-iteration cost is one
  * map-side-combined (piece, count) aggregation. Nothing quadratic,
  * nothing driver-side except the ≤ seedSize model arithmetic.
  */
object UnigramLm {

  /** Fitted model: (piece, ln-prob) sorted by piece; `maxPieceLen` is
    * the fit-time cap, needed again at apply time. */
  final case class UnigramModel(pieces: Seq[(String, Double)],
      maxPieceLen: Int) {
    lazy val logp: Map[String, Double] = pieces.toMap
  }

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** Viterbi DP over one word: best (Σ ln p, n_pieces) — max logp, ties
    * to fewer pieces. Returns the per-position back-pointers too so the
    * E-step can count piece usage. dp additions are single binary ops in
    * a fixed recurrence, so the values are bit-identical to the SQL
    * twin's staged replay. Unsegmentable ⇒ logp = −∞ (impossible for
    * fit-corpus words: every seen char stays in the vocab). */
  private[graft] def viterbi(word: String, lp: Map[String, Double],
      maxPieceLen: Int): (Double, Int, List[String]) = {
    val n = word.length
    val dpL = Array.fill(n + 1)(Double.NegativeInfinity)
    val dpN = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(0)
    dpL(0) = 0.0; dpN(0) = 0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        if (dpL(i - l) != Double.NegativeInfinity) {
          val x = lp.getOrElse(word.substring(i - l, i), Double.NaN)
          if (!x.isNaN) {
            val cand = dpL(i - l) + x
            val candN = dpN(i - l) + 1
            if (cand > dpL(i) || (cand == dpL(i) && candN < dpN(i))) {
              dpL(i) = cand; dpN(i) = candN; back(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (dpL(n) == Double.NegativeInfinity) (Double.NegativeInfinity, 0, Nil)
    else {
      var pieces = List.empty[String]
      var pos = n
      while (pos > 0) {
        pieces = word.substring(pos - back(pos), pos) :: pieces
        pos -= back(pos)
      }
      (dpL(n), dpN(n), pieces)
    }
  }

  /** Distinct (word, weight) table of the corpus — the ONE corpus-sized
    * pass everything else reuses. */
  private def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(words(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Fit by deterministic hard-EM. `vocabSize` bounds the piece count
    * (all single chars are always kept and count against it);
    * `seedSize` bounds the initial candidate set (top substrings by
    * corpus-weighted count, ties piece-asc). */
  def unigramTrain(df: DataFrame, text: Column, vocabSize: Int,
      maxPieceLen: Int = 4, iters: Int = 2,
      seedSize: Int = 2000): UnigramModel = {
    require(vocabSize >= 2 && vocabSize <= 65536, "vocabSize in [2, 65536]")
    require(maxPieceLen >= 1 && maxPieceLen <= 16, "maxPieceLen in [1, 16]")
    require(iters >= 1 && iters <= 16, "iters in [1, 16]")
    require(seedSize >= vocabSize, "seedSize >= vocabSize")
    val spark = df.sparkSession
    import spark.implicits._
    val wc = wordCounts(df, text).as[(String, Long)].persist()

    // ---- seed: corpus-weighted substring counts, top seedSize + chars
    val subCounts = wc.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), c)
    }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
      .as[(String, Long)].collect()
    require(subCounts.length <= 4000000,
      "unigramTrain: substring candidate space too large — lower " +
        "maxPieceLen or pre-normalize the text")
    val chars = subCounts.filter(_._1.length == 1)
    val multi = subCounts.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(seedSize - chars.length)
    var model = normalize((chars ++ multi).toSeq)

    // ---- hard-EM iterations over the bounded word table
    for (_ <- 1 to iters) {
      val lp = model; val mpl = maxPieceLen
      val usage = wc.flatMap { case (w, c) =>
        viterbi(w, lp, mpl)._3.map(_ -> c)
      }.toDF("p", "c").groupBy("p").agg(sum("c").as("c"))
        .as[(String, Long)].collect().toMap
      // keep every char (usage floor 1 — a char piece must stay
      // available or some future word becomes unsegmentable), plus the
      // top multi-char pieces by usage
      val charRows = chars.map { case (p, _) =>
        p -> math.max(1L, usage.getOrElse(p, 0L)) }
      val multiRows = usage.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - charRows.length))
      model = normalize(charRows.toSeq ++ multiRows)
    }
    UnigramModel(model.toSeq.sortBy(_._1), maxPieceLen)
  }

  /** counts → 9-dp-rounded ln-probabilities (one normalization). */
  private def normalize(counts: Seq[(String, Long)]): Map[String, Double] = {
    val tot = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) => p -> r9(math.log(c / tot)) }.toMap
  }

  /** Score/segment each document under a fitted model: per doc,
    * (n_words, n_pieces, logp) where logp = Σ over words of the 9-dp-
    * rounded Viterbi log-likelihood, accumulated EXACTLY (BigDecimal —
    * the DuckDB twin sums the same values as DECIMAL, so the double
    * faces agree bit-for-bit). Words the vocab can't segment (chars
    * unseen at fit) are counted in `n_oov_words` and excluded from the
    * sums. Pure per-partition map over the corpus — the model rides the
    * closure, no join, no shuffle; streams as-is. */
  def unigramScore(df: DataFrame, id: String, text: Column,
      model: UnigramModel): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val withTxt = df.withColumn("__ug_txt", text)
    val idx = withTxt.schema.fieldIndex("__ug_txt")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false),
      StructField("n_oov_words", LongType, nullable = false),
      StructField("logp", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val lp = model.logp; val mpl = model.maxPieceLen
    withTxt.mapPartitions { rows =>
      rows.map { r =>
        val t = r.getString(idx)
        val ws: Array[String] =
          if (t == null) Array.empty
          // Locale.ROOT: the default-locale toLowerCase would diverge
          // from Spark's locale-insensitive lower() on e.g. Turkish I
          else t.toLowerCase(java.util.Locale.ROOT)
            .trim.split("\\s+").filter(_.nonEmpty)
        var nw = 0L; var np = 0L; var oov = 0L
        var acc = BigDecimal(0)
        ws.foreach { w =>
          val (l, n, _) = viterbi(w, lp, mpl)
          nw += 1
          if (l == Double.NegativeInfinity) oov += 1
          else {
            np += n
            acc += BigDecimal(l).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          }
        }
        Row.fromSeq(r.toSeq.dropRight(1) ++
          Seq[Any](nw, np, oov, acc.toDouble))
      }
    }(enc)
  }

  /** DuckDB twin of [[unigramScore]] for a FITTED model: the pieces ride
    * a literal VALUES table and the Viterbi recurrence is UNROLLED into
    * one CTE per word position (aggregation is illegal inside a
    * recursive CTE, so the DP runs as `maxWordLen` staged best-per-word
    * selections — the mStep/GD-epoch unroll pattern). Returns the full
    * query text; `docsSql` must yield (doc_id, text). Only words up to
    * `maxWordLen` chars are supported — the caller measures the corpus
    * and passes the observed max. */
  def unigramScoreSql(docsSql: String, model: UnigramModel,
      maxWordLen: Int): String = {
    require(maxWordLen >= 1 && maxWordLen <= 64, "maxWordLen in [1, 64]")
    val mpl = model.maxPieceLen
    val piecesVals = model.pieces
      .map { case (p, l) => s"('${p.replace("'", "''")}', $l)" }
      .mkString(",\n|    ")
    val dpStages = (1 to maxWordLen).map { i =>
      val legs = (1 to math.min(mpl, i)).map { l =>
        val j = i - l
        s"""SELECT d.w, d.lp + pc.lp AS lp, d.np + 1 AS np
           |      FROM dp$j d JOIN pieces pc
           |        ON len(d.w) >= $i AND pc.p = substr(d.w, ${j + 1}, $l)
           |          AND len(pc.p) = $l""".stripMargin
      }.mkString("\n|      UNION ALL ")
      s"""dp$i AS (
         |  SELECT w, lp, np FROM (
         |    SELECT w, lp, np, row_number() OVER (PARTITION BY w
         |      ORDER BY lp DESC, np ASC) AS rn
         |    FROM ($legs))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n|")
    val bestLegs = (1 to maxWordLen)
      .map(i => s"SELECT w, lp, np FROM dp$i WHERE len(w) = $i")
      .mkString("\n|  UNION ALL ")
    s"""WITH pieces(p, lp) AS (VALUES
       |    $piecesVals),
       |d AS ($docsSql),
       |wx AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      x -> x <> '')) AS w
       |  FROM d),
       |words AS (SELECT DISTINCT w FROM wx),
       |dp0 AS (SELECT w, CAST(0.0 AS DOUBLE) AS lp, 0 AS np FROM words),
       |$dpStages,
       |best AS (
       |  $bestLegs),
       |per AS (
       |  SELECT wx.doc_id, count(*) AS n_words,
       |    CAST(coalesce(sum(b.np), 0) AS BIGINT) AS n_pieces,
       |    CAST(count(*) - count(b.w) AS BIGINT) AS n_oov_words,
       |    CAST(coalesce(sum(CAST(round(b.lp, 9) AS DECIMAL(28,9))), 0)
       |      AS DOUBLE) AS logp
       |  FROM wx LEFT JOIN best b USING (w)
       |  GROUP BY 1)
       |SELECT d.doc_id, coalesce(per.n_words, 0) AS n_words,
       |  coalesce(per.n_pieces, 0) AS n_pieces,
       |  coalesce(per.n_oov_words, 0) AS n_oov_words,
       |  round(coalesce(per.logp, 0.0), 6) AS logp
       |FROM d LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }
}
