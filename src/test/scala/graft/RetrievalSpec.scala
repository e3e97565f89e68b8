package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** BM25 / coverage / RRF retrieval laws: parity with a from-scratch
  * Scala reimplementation on a fixture, plus edge-case and determinism
  * properties. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick quick fox"),
    (2L, "lazy dog sleeps"),
    (3L, "brown bear eats honey"),
    (4L, "fox fox fox fox fox"),
    (5L, "   "), // zero tokens — excluded from N/avgdl and results
    (6L, "A Quick DOG"), // case-folded
    (7L, "completely unrelated words here"))

  private val queries = Seq("qa" -> "quick fox", "qb" -> "lazy dog dog")

  /** From-scratch BM25 (double arithmetic identical to the operator's). */
  private def bruteBm25(k1: Double = 1.2, b: Double = 0.75): Map[(String, Long), Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    }.toMap
    val withTok = toks.filter(_._2.nonEmpty)
    val n = withTok.size.toDouble
    val avgdl = withTok.values.map(_.size).sum.toDouble / n
    val qt = queries.flatMap { case (q, t) => t.split("\\s+").distinct.map(q -> _) }
    (for {
      (q, term) <- qt
      (doc, ts) <- withTok
      tf = ts.count(_ == term).toDouble
      if tf > 0
    } yield {
      val df = withTok.values.count(_.contains(term)).toDouble
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val w = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * ts.size / avgdl))
      (q, doc) -> w
    }).groupBy(_._1).map { case (k, ws) => k -> ws.map(_._2).sum }
  }

  test("bm25TopK matches the from-scratch scorer, ranks by score desc / id asc") {
    val docs = corpus.toDF("id", "text")
    val got = Retrieval.bm25TopK(docs, "id", col("text"), queries, k = 10)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2), r.getInt(3)))
    val want = bruteBm25()
    assert(got.map(_._1).toSet === want.keySet)
    got.foreach { case (key, score, _) => assert(approx(score, want(key))) }
    // ranks are 1..m per query, ordered by (score desc, id asc)
    for (q <- queries.map(_._1)) {
      val rows = got.filter(_._1._1 == q).sortBy(_._3)
      assert(rows.map(_._3).toSeq === (1 to rows.length))
      val resorted = rows.sortBy { case ((_, id), s, _) => (-s, id) }
      assert(resorted.toSeq === rows.toSeq)
    }
  }

  test("bm25TopK: k truncates; empty-token docs never appear") {
    val docs = corpus.toDF("id", "text")
    val got = Retrieval.bm25TopK(docs, "id", col("text"), queries, k = 2)
    assert(got.groupBy("qid").count().collect().map(_.getLong(1)).forall(_ <= 2))
    assert(got.where(col("id") === 5L).count() === 0)
  }

  test("bm25TopK: result independent of input partitioning") {
    val a = Retrieval.bm25TopK(corpus.toDF("id", "text").repartition(7),
      "id", col("text"), queries, k = 10).orderBy("qid", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq
    val b = Retrieval.bm25TopK(corpus.toDF("id", "text").coalesce(1),
      "id", col("text"), queries, k = 10).orderBy("qid", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq
    assert(a === b)
  }

  test("coverageTopK counts DISTINCT matched terms (multiplicity ignored)") {
    val docs = corpus.toDF("id", "text")
    val got = Retrieval.coverageTopK(docs, "id", col("text"), queries, k = 10)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // doc 4 = "fox"×5 matches qa's {quick, fox} on 1 distinct term
    assert(got(("qa", 4L)) === 1L)
    // doc 1 matches both quick and fox
    assert(got(("qa", 1L)) === 2L)
    // qb = "lazy dog dog" has 2 distinct terms; doc 0 contains both
    assert(got(("qb", 0L)) === 2L)
    // case-folded: doc 6 "A Quick DOG" matches qb's dog
    assert(got(("qb", 6L)) === 1L)
  }

  test("rrfFuse: score is sum of 1/(kRrf+rank) across rankings; missing docs contribute nothing") {
    val r1 = Seq(("qa", 10L, 1), ("qa", 20L, 2)).toDF("qid", "id", "rank")
    val r2 = Seq(("qa", 20L, 1), ("qa", 30L, 2)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), "qid", "id", k = 10, kRrf = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).sortBy(_._3)
    // doc 20: 1/62 + 1/61 tops doc 10: 1/61 and doc 30: 1/62
    assert(got.map(_._1).toSeq === Seq(20L, 10L, 30L))
    assert(approx(got(0)._2, 1.0 / 62 + 1.0 / 61))
    assert(approx(got(1)._2, 1.0 / 61))
    assert(approx(got(2)._2, 1.0 / 62))
  }

  test("rrfFuse of a ranking with itself preserves its order at doubled score") {
    val r = Seq(("qa", 1L, 1), ("qa", 2L, 2), ("qa", 3L, 3)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(r, r), "qid", "id", k = 3)
      .orderBy("rank").collect()
      .map(x => (x.getLong(1), x.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    got.zip(Seq(1, 2, 3)).foreach { case ((_, s), rk) =>
      assert(approx(s, 2.0 / (60 + rk)))
    }
  }

  test("retrievalMetrics: recall/MRR/nDCG hand-computed; zero-hit zeros; unjudged queries excluded") {
    val ranking = Seq(
      ("qa", 1L, 1), ("qa", 2L, 2), ("qa", 3L, 3),
      ("qb", 1L, 1), ("qb", 2L, 2),
      ("qc", 5L, 1)).toDF("qid", "id", "rank")
    val qrels = Seq(
      ("qa", 2L, 2), ("qa", 9L, 1), // one hit at rank 2, one missed
      ("qb", 9L, 1),                // judged but nothing retrieved hits
      ("qd", 5L, 3))                // judged query never retrieved
      .toDF("qid", "id", "rel")
    val got = Retrieval.retrievalMetrics(ranking, qrels, "qid", "id", "rel", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // qc has no positive judgments -> excluded; qd judged-only -> zeros
    assert(got.keySet == Set("qa", "qb", "qd"))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dcg = 3.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 3.0 / 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(got("qa") == (2L, 0.5, 0.5, r6(dcg / idcg)), got)
    assert(got("qb") == (1L, 0.0, 0.0, 0.0))
    assert(got("qd") == (1L, 0.0, 0.0, 0.0))
  }

  test("mineHardNegatives: positives removed, remainder re-ranked, rounded-score ties to lowest id") {
    val neighbors = Seq(
      ("q1", 10L, 0.99), ("q1", 11L, 0.95), ("q1", 12L, 0.90),
      ("q1", 13L, 0.85), ("q1", 14L, 0.80), ("q1", 15L, 0.80),
      ("q2", 10L, 0.70), ("q2", 20L, 0.60))
      .toDF("qid", "vec_id", "cos")
    val positives = Seq(("q1", 10L), ("q1", 12L), ("q2", 99L))
      .toDF("qid", "vec_id")
    val got = Retrieval.mineHardNegatives(neighbors, positives,
        "qid", "vec_id", "cos", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    // q1: 10 and 12 are positives; survivors re-rank 11, 13, then the
    // 0.80 tie breaks to the lower id 14
    assert(got == Set(("q1", 11L, 1), ("q1", 13L, 2), ("q1", 14L, 3),
      ("q2", 10L, 1), ("q2", 20L, 2)), got)
  }

  // ------------------------------------------------------------- qlTopK

  test("qlTopK matches a from-scratch Dirichlet QL on the fixture") {
    val mu = 500.0
    val toksM = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    }.toMap.filter(_._2.nonEmpty)
    val total = toksM.values.map(_.size).sum.toDouble
    val cf = toksM.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val expected = (for {
      (q, qtext) <- queries
      terms = qtext.split("\\s+").toSeq.distinct.filter(cf.contains)
      (doc, ts) <- toksM
      if terms.exists(ts.contains)
    } yield {
      val s = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        math.log((tf + mu * (cf(t) / total)) / (ts.size + mu))
      }.sum
      (q, doc) -> s
    }).toMap
    val got = Retrieval.qlTopK(corpus.toDF("doc_id", "text"), "doc_id",
        col("text"), queries, k = 10, mu = mu)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet, s"${got.keySet} vs ${expected.keySet}")
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-9, s"$k: $v vs ${expected(k)}") }
  }

  test("qlTopK: a null-text doc contributes 0 tokens to |C|, not Spark's size(null) = -1") {
    val base = Retrieval.qlTopK(corpus.toDF("doc_id", "text"), "doc_id",
      col("text"), queries, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val withNull = Retrieval.qlTopK(
      (corpus :+ ((99L, null.asInstanceOf[String]))).toDF("doc_id", "text"),
      "doc_id", col("text"), queries, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(withNull == base, s"null doc moved scores: $withNull vs $base")
  }

  test("qlTopK: unseen query terms are dropped, not score-destroying") {
    // "zzz" never occurs: qa must rank exactly as "quick fox" alone
    val base = Retrieval.qlTopK(corpus.toDF("doc_id", "text"), "doc_id",
      col("text"), Seq("qa" -> "quick fox"), k = 10)
      .select("doc_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val withUnseen = Retrieval.qlTopK(corpus.toDF("doc_id", "text"), "doc_id",
      col("text"), Seq("qa" -> "quick fox zzz"), k = 10)
      .select("doc_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(withUnseen == base)
    intercept[IllegalArgumentException](
      Retrieval.qlTopK(corpus.toDF("doc_id", "text"), "doc_id",
        col("text"), Seq("qa" -> "zzz"), k = 10).collect())
  }

  // ------------------------------------------------------------- rm3TopK

  test("rm3TopK: expansion retrieves a doc sharing ZERO original query terms") {
    // the whole point of pseudo-relevance feedback: "fox" docs talk
    // about "burrow", so the burrow-only doc 21 becomes reachable from
    // the query "fox" via the expanded vocabulary
    val prf = Seq(
      (10L, "fox burrow forest"), (11L, "fox burrow den"),
      (12L, "fox burrow trail"),
      (21L, "burrow burrow burrow"), // no 'fox' at all
      (30L, "unrelated words entirely"), (31L, "other noise text")
    ).toDF("doc_id", "text")
    val base = Retrieval.bm25TopK(prf, "doc_id", col("text"),
      Seq("q" -> "fox"), k = 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!base.contains(21L)) // literal BM25 cannot see doc 21
    val rm3 = Retrieval.rm3TopK(prf, "doc_id", col("text"),
      Seq("q" -> "fox"), k = 10, fbDocs = 3, fbTerms = 4, lambda = 0.5)
    val got = rm3.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got.contains(21L), s"expansion should reach doc 21: $got")
    assert(!got.contains(30L) && !got.contains(31L))
  }

  test("rm3TopK: lambda = 1 keeps the original-query BM25 RANKING") {
    val qs = Seq("qa" -> "quick fox", "qb" -> "lazy dog dog")
    val df = corpus.toDF("doc_id", "text")
    val base = Retrieval.bm25TopK(df, "doc_id", col("text"), qs, k = 10)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rank")) -> r.getLong(1)).toMap
    // λ=1: expansion weight (1−λ)·RM1 = 0 — only the uniform original
    // terms score, i.e. BM25 scaled by 1/|q| per query: same order
    val rm3 = Retrieval.rm3TopK(df, "doc_id", col("text"), qs, k = 10,
      fbDocs = 3, fbTerms = 4, lambda = 1.0)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rank")) -> r.getLong(1)).toMap
    assert(rm3 == base, s"base=$base rm3=$rm3")
  }

  test("rm3TopK: guards") {
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException](Retrieval.rm3TopK(df, "doc_id",
      col("text"), Seq("q" -> "fox"), k = 0))
    intercept[IllegalArgumentException](Retrieval.rm3TopK(df, "doc_id",
      col("text"), Seq("q" -> "fox"), k = 5, lambda = 1.5))
  }
}
