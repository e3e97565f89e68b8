package graft

import org.apache.spark.sql.functions._
import graft.ops.{Experiment, Graph, Stats, TextOps}

/** Hand-verified fixtures for the data-selection family (Moore–Lewis,
  * negative sampling, link prediction, stratified IPW). */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("crossEntropyDiff: in-domain docs score positive, OOD negative") {
    // in-domain vocabulary {aa bb}, out-domain {xx yy}; a fresh doc of
    // aa/bb must get ml_score > 0, a fresh doc of xx/yy < 0.
    val docs = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa aa bb", true),
      (3L, "xx yy xx yy", false), (4L, "yy xx xx", false),
      (5L, "aa bb bb", false), // pool doc that LOOKS in-domain
      (6L, "xx yy yy", true)   // in-domain-tagged doc that looks OOD
    ).toDF("doc_id", "text", "ind")
    val r = TextOps.crossEntropyDiff(docs, "doc_id", col("text"), col("ind"))
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[Double]("ml_score")).toMap
    assert(r(1) > 0 && r(5) > 0, "in-domain-looking docs must score > 0")
    assert(r(3) < 0 && r(4) < 0, "OOD-looking docs must score < 0")
  }

  test("crossEntropyDiff: scores match a by-hand add-1 computation") {
    // in: "a a"; out: "b". joint vocab {a, b}, V=2, N_in=2, N_out=1.
    // lp_in(a)=ln(3/4), lp_in(b)=ln(1/4); lp_out(a)=ln(1/3), lp_out(b)=ln(2/3)
    val docs = Seq((1L, "a a", true), (2L, "b", false)).toDF("doc_id", "text", "ind")
    val r = TextOps.crossEntropyDiff(docs, "doc_id", col("text"), col("ind"))
      .orderBy("doc_id").collect()
    assert(approx(r(0).getAs[Double]("avg_logp_in"), math.log(3.0 / 4), 1e-12))
    assert(approx(r(0).getAs[Double]("avg_logp_out"), math.log(1.0 / 3), 1e-12))
    assert(approx(r(1).getAs[Double]("ml_score"),
      math.log(1.0 / 4) - math.log(2.0 / 3), 1e-12))
  }

  test("negativeSample: deterministic across partitionings, in-vocab, k per anchor") {
    val corpus = (0L until 50L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)(s"tok${i % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val anchors = corpus.where(col("doc_id") < 10)
    def run(parts: Int) = Stats.negativeSample(corpus.repartition(parts),
        col("text"), anchors.repartition(parts), col("doc_id"),
        vocabSize = 8, k = 3, seed = 42L)
      .orderBy("id", "slot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val a = run(1); val b = run(7)
    assert(a == b, "draws must not depend on partitioning")
    assert(a.size == 30 && a.map(x => (x._1, x._2)).distinct.size == 30)
    assert(a.map(_._3).toSet.subsetOf((0 to 10).map(i => s"tok$i").toSet))
  }

  test("negativeSample: draw frequencies track the tempered distribution") {
    // two tokens, counts 1 and 81: weights 1 : 81^0.75 = 1 : 27 —
    // the rare token must appear, and far less often than the common.
    val corpus = Seq((0L, Seq.fill(81)("common").mkString(" ")),
      (1L, "rare")).toDF("doc_id", "text")
    val anchors = (0L until 400L).toDF("doc_id")
      .withColumn("text", lit(""))
    val draws = Stats.negativeSample(corpus, col("text"), anchors,
        col("doc_id"), vocabSize = 2, k = 2, seed = 1L)
      .groupBy("neg_token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rare = draws.getOrElse("rare", 0L).toDouble
    val total = draws.values.sum.toDouble
    // expected share 28669/(28669+1024+...) -> rare ≈ 1024/(1024+27713)
    assert(rare > 0, "rare token must still be drawn")
    assert(rare / total < 0.12, s"rare share ${rare / total} too high")
  }

  test("linkPrediction: hand-computed scores on a 5-node path+hub graph") {
    // edges: 1-2, 2-3, 1-4, (so 1 and 3 share {2}; 2 and 4 share {1})
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("s", "d")
    val r = Graph.linkPrediction(edges, "s", "d")
      .orderBy("a", "b").collect()
      .map(x => (x.getAs[Long]("a"), x.getAs[Long]("b")) -> x).toMap
    // pair (1,3): common {2}, deg1=2 deg3=1, jaccard 1/(2+1-1)=0.5,
    // aa = 1/ln(deg(2)) = 1/ln 2
    val p13 = r((1L, 3L))
    assert(p13.getAs[Long]("common_neighbors") == 1L)
    assert(approx(p13.getAs[Double]("adamic_adar"), 1.0 / math.log(2.0), 1e-9))
    assert(approx(p13.getAs[Double]("jaccard"), 0.5, 1e-12))
    // pair (2,4): common {1}, aa = 1/ln(deg(1)) = 1/ln 2
    assert(approx(r((2L, 4L)).getAs[Double]("adamic_adar"),
      1.0 / math.log(2.0), 1e-9))
    // (3,4) share nothing (distance 3) and existing edges never appear
    assert(!r.contains((3L, 4L)) && !r.contains((1L, 2L)))
  }

  test("linkPrediction: hub cut removes wedges centered on super-hubs") {
    // star: hub 0 connected to 1..5; every leaf pair is a candidate
    // through the hub; with maxDegree < 5 the hub is cut -> no pairs.
    val edges = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    assert(Graph.linkPrediction(edges, "s", "d").count() == 10L)
    assert(Graph.linkPrediction(edges, "s", "d", maxDegree = 4).count() == 0L)
  }

  test("ipwAte: recovers the true effect under confounded assignment") {
    // cell A: y = 10 + 2*t, 3 treated 1 control; cell B: y = 20 + 2*t,
    // 1 treated 3 control. Naive diff is confounded; IPW gives exactly 2.
    val rows =
      Seq(("A", 1, 12.0), ("A", 1, 12.0), ("A", 1, 12.0), ("A", 0, 10.0),
        ("B", 1, 22.0), ("B", 0, 20.0), ("B", 0, 20.0), ("B", 0, 20.0))
    val r = Experiment.ipwAte(rows.toDF("cell", "t", "y"),
      col("t") === 1, col("y"), Seq(col("cell"))).collect().head
    assert(approx(r.getAs[Double]("ate"), 2.0, 1e-12))
    // naive difference for contrast: mean(t) = (36+22)/4 = 14.5,
    // mean(c) = 70/4 = 17.5 -> naive -3.0; IPW fixed it.
    assert(r.getAs[Long]("n_overlap") == 8L)
    assert(r.getAs[Long]("n_cells_dropped") == 0L)
  }

  test("ipwAte: no-overlap cells drop out and are counted") {
    val rows = Seq(("A", 1, 5.0), ("A", 0, 3.0),
      ("C", 1, 100.0), ("C", 1, 90.0)) // C: treated-only, no overlap
    val r = Experiment.ipwAte(rows.toDF("cell", "t", "y"),
      col("t") === 1, col("y"), Seq(col("cell"))).collect().head
    assert(r.getAs[Long]("n_cells_dropped") == 1L)
    assert(r.getAs[Long]("n_overlap") == 2L)
    assert(approx(r.getAs[Double]("ate"), 2.0, 1e-12))
  }
}
