package graft

import org.apache.spark.sql.functions._
import graft.ops.{Experiment, Graph, RankTests, Stats, Trend}

/** Rank tests, trend/changepoint ops, RMST, graph modularity/clustering,
  * and ridge regression — closed-form and invariance pins. */
class TrendRankSpec extends SparkSpec {
  import spark.implicits._

  // ---- Kruskal–Wallis ----

  test("kruskalWallis matches the hand-computed H on a tied fixture") {
    // groups: a={1,2,3}, b={2,3,4}, c={5,6}; midranks 1, 2.5, 2.5, 4.5,
    // 4.5, 6, 7, 8 → Ra=8, Rb=13, Rc=15
    // H = 12/(8·9)·(64/3 + 169/3 + 225/2) − 27 = 169/36 = 4.694444…
    // ties at 2 and 3: C = 1 − 12/504 → H/C = 169·504/(36·492)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0),
      ("b", 3.0), ("b", 4.0), ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = RankTests.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n") == 8)
    assert(approx(r.getAs[Double]("h"), 169.0 / 36.0, 1e-9))
    assert(approx(r.getAs[Double]("h_tie_corrected"), 4.808943089430894, 1e-9))
  }

  test("kruskalWallis ignores null values and null groups") {
    val df = Seq(("a", Some(1.0)), ("a", None), (null, Some(9.0)),
      ("b", Some(2.0)), ("a", Some(3.0)), ("b", Some(4.0)))
      .toDF("g", "v")
    val r = RankTests.kruskalWallis(df, col("v"), col("g")).head()
    assert(r.getAs[Long]("n") == 4)
  }

  // ---- Wilcoxon signed-rank ----

  test("wilcoxonSignedRank matches the textbook example with zero-drop") {
    // pairs with d = +2, -1, +3, 0 (dropped), +2 → |d| ranks:
    // 1→1, 2→2.5 (×2), 3→4; W+ = 2.5+2.5+4 = 9, W- = 1, n = 4
    val df = Seq((5.0, 3.0), (2.0, 3.0), (7.0, 4.0), (1.0, 1.0),
      (6.0, 4.0)).toDF("x", "y")
    val r = RankTests.wilcoxonSignedRank(df, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 4)
    assert(approx(r.getAs[Double]("w_plus"), 9.0))
    assert(approx(r.getAs[Double]("w_minus"), 1.0))
    // mean = 5, var = 4·5·9/24 − (2³−2)/48 = 7.5 − 0.125 = 7.375
    assert(approx(r.getAs[Double]("z"), (9.0 - 5.0) / math.sqrt(7.375), 1e-9))
  }

  test("wilcoxonSignedRank is antisymmetric in the pair order") {
    val df = Seq((5.0, 3.0), (2.0, 3.5), (7.0, 4.0), (6.0, 4.5))
      .toDF("x", "y")
    val f = RankTests.wilcoxonSignedRank(df, col("x"), col("y")).head()
    val b = RankTests.wilcoxonSignedRank(df, col("y"), col("x")).head()
    assert(approx(f.getAs[Double]("w_plus"), b.getAs[Double]("w_minus")))
    assert(approx(f.getAs[Double]("z"), -b.getAs[Double]("z")))
  }

  // ---- Brown–Forsythe ----

  test("brownForsythe detects a variance difference and anovaF shape holds") {
    // group a tight around 10, group b spread — F should be large
    val a = (1 to 20).map(i => ("a", 10.0 + (i % 3) * 0.1))
    val b = (1 to 20).map(i => ("b", 10.0 + (i % 10) * 3.0))
    val r = RankTests.brownForsythe((a ++ b).toDF("g", "v"),
      col("v"), col("g")).head()
    assert(r.getAs[Long]("k") == 2 && r.getAs[Long]("n") == 40)
    assert(r.getAs[Double]("f_stat") > 10.0)
  }

  test("brownForsythe is ~zero when groups share a distribution") {
    val rows = (1 to 30).map(i => (s"g${i % 2}", (i % 5).toDouble))
    val r = RankTests.brownForsythe(rows.toDF("g", "v"),
      col("v"), col("g")).head()
    assert(r.getAs[Double]("f_stat") < 1.0)
  }

  // ---- Effect sizes ----

  test("effectSizes: cohens d exact on a two-point fixture; cliff bounds") {
    // a = {2, 4}, b = {1, 3}: means 3, 2; s_pooled = sqrt((2+2)/2) = √2
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    val r = RankTests.effectSizes(df, col("v"), col("g"), "a", "b").head()
    assert(approx(r.getAs[Double]("cohens_d"), 1.0 / math.sqrt(2.0), 1e-9))
    // U_a: a beats b in 3 of 4 comparisons (2>1, 4>1, 4>3), ties none →
    // delta = 2·3/4 − 1 = 0.5
    assert(approx(r.getAs[Double]("cliffs_delta"), 0.5, 1e-9))
    val g = r.getAs[Double]("hedges_g")
    assert(g < r.getAs[Double]("cohens_d") && g > 0)
  }

  test("effectSizes: complete separation gives cliffs_delta = 1") {
    val df = Seq(("a", 10.0), ("a", 11.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r = RankTests.effectSizes(df, col("v"), col("g"), "a", "b").head()
    assert(approx(r.getAs[Double]("cliffs_delta"), 1.0, 1e-9))
  }

  // ---- Mann–Kendall ----

  test("mannKendall: strictly increasing series has S = n(n-1)/2, z > 0") {
    val df = (1 to 20).map(i => (i.toDouble, i * 2.0)).toDF("t", "v")
    val r = Trend.mannKendall(df, col("t"), col("v")).head()
    assert(r.getAs[Double]("s") == 190.0)
    assert(r.getAs[Double]("z") > 3.0)
  }

  test("mannKendall: constant series has S = 0, z = 0 (all-tie variance)") {
    val df = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("t", "v")
    val r = Trend.mannKendall(df, col("t"), col("v")).head()
    assert(r.getAs[Double]("s") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("mannKendall refuses an over-limit or multi-valued series loudly") {
    val big = (1 to 50).map(i => (i.toDouble, 1.0)).toDF("t", "v")
    val e1 = intercept[IllegalArgumentException] {
      Trend.mannKendall(big, col("t"), col("v"), maxPoints = 10)
    }
    assert(e1.getMessage.contains("distinct order points"))
    val dup = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("t", "v")
    val e2 = intercept[IllegalArgumentException] {
      Trend.mannKendall(dup, col("t"), col("v"))
    }
    assert(e2.getMessage.contains("ONE value"))
  }

  // ---- Theil–Sen ----

  test("theilSen recovers an exact line and shrugs off one outlier") {
    val clean = (1 to 21).map(i => (i.toDouble, 3.0 * i + 7.0))
    val r1 = Trend.theilSen(clean.toDF("t", "v"), col("t"), col("v")).head()
    assert(approx(r1.getAs[Double]("slope"), 3.0, 1e-9))
    assert(approx(r1.getAs[Double]("intercept"), 7.0, 1e-9))
    val dirty = clean.dropRight(1) :+ (21.0, 500.0)
    val r2 = Trend.theilSen(dirty.toDF("t", "v"), col("t"), col("v")).head()
    assert(approx(r2.getAs[Double]("slope"), 3.0, 0.2))
  }

  // ---- Changepoint ----

  test("changepointMeanShift finds the step and reports both means") {
    val df = ((1 to 30).map(i => (i.toDouble, 1.0)) ++
      (31 to 60).map(i => (i.toDouble, 5.0))).toDF("t", "v")
    val r = Trend.changepointMeanShift(df, col("t"), col("v")).head()
    assert(r.getAs[Double]("split_x") == 30.0)
    assert(r.getAs[Long]("k_left") == 30)
    assert(approx(r.getAs[Double]("mean_left"), 1.0))
    assert(approx(r.getAs[Double]("mean_right"), 5.0))
  }

  test("changepointMeanShift ties break to the earliest split") {
    // symmetric V series: |Δmean| statistic is symmetric around the
    // middle; earliest argmax must win deterministically
    val df = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 1.0), (4.0, 1.0))
      .toDF("t", "v")
    val r = Trend.changepointMeanShift(df, col("t"), col("v")).head()
    assert(r.getAs[Double]("split_x") == 2.0)
  }

  // ---- Seasonal index ----

  test("seasonalIndex: n-weighted additive indexes sum to zero") {
    val rows = (1 to 100).map(i => (i % 4, (i % 7).toDouble + (i % 4) * 2))
    val out = Trend.seasonalIndex(rows.toDF("h", "v"), col("h"), col("v"))
      .collect()
    assert(out.length == 4)
    val weighted = out.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("index_add")).sum
    assert(approx(weighted, 0.0, 1e-8))
    // multiplicative ratio consistent with additive index
    out.foreach { r =>
      assert((r.getAs[Double]("index_add") > 0)
        == (r.getAs[Double]("index_mult") > 1.0)
        || r.getAs[Double]("index_add") == 0.0)
    }
  }

  // ---- RMST ----

  test("rmst integrates the KM step curve exactly (no censoring)") {
    // deaths at t=1 (S→0.75), 2 (0.5), 3 (0.25), 4 (0): with tau=4,
    // area = 1·1 + 0.75·1 + 0.5·1 + 0.25·1 = 2.5
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (4.0, true))
      .toDF("d", "e")
    val r = Stats.rmst(df, col("d"), col("e"), tau = 4.0).head()
    assert(approx(r.getAs[Double]("rmst"), 2.5, 1e-6))
    assert(r.getAs[Long]("n_event_times_used") == 4)
  }

  test("rmst truncates at tau and handles the no-event case") {
    val df = Seq((1.0, true), (2.0, true), (3.0, true), (4.0, true))
      .toDF("d", "e")
    // tau=2.5: area = 1·1 + 0.75·1 + 0.5·0.5 = 2.0
    val r = Stats.rmst(df, col("d"), col("e"), tau = 2.5).head()
    assert(approx(r.getAs[Double]("rmst"), 2.0, 1e-6))
    // all censored → S ≡ 1 → rmst = tau
    val cens = Seq((1.0, false), (2.0, false)).toDF("d", "e")
    val r2 = Stats.rmst(cens, col("d"), col("e"), tau = 10.0).head()
    assert(approx(r2.getAs[Double]("rmst"), 10.0))
    assert(r2.getAs[Long]("n_event_times_used") == 0)
  }

  test("cumulativeIncidence matches the hand-worked two-cause example " +
    "and CIFs sum to 1 - S") {
    // t=1:A, t=2:B, t=3:A (no censoring):
    // CIF_A(1)=1/3, CIF_B(2)=2/3·1/2=1/3, CIF_A(3)=1/3+1/3=2/3
    val df = Seq((1.0, "A"), (2.0, "B"), (3.0, "A")).toDF("d", "c")
    val out = Stats.cumulativeIncidence(df, col("d"), col("c"))
      .collect().map(r => (r.getString(1), r.getDouble(0)) ->
        r.getAs[Double]("cif")).toMap
    assert(approx(out(("A", 1.0)), 1.0 / 3.0, 1e-5))
    assert(approx(out(("B", 2.0)), 1.0 / 3.0, 1e-5))
    assert(approx(out(("A", 3.0)), 2.0 / 3.0, 1e-5))
    // with censoring: terminal CIFs still sum to 1 − S(t_last)
    val cens = Seq((1.0, Some("A")), (2.0, None), (3.0, Some("B")),
      (4.0, None), (5.0, Some("A"))).toDF("d", "c")
    val cif = Stats.cumulativeIncidence(cens, col("d"), col("c"))
    val lastPerCause = cif.groupBy("cause").agg(max_by(col("cif"), col("t")))
      .collect().map(_.getDouble(1)).sum
    val s = Stats.kaplanMeier(cens, col("d"),
      col("c").isNotNull).orderBy(col("t").desc)
      .limit(1).head().getAs[Double]("survival")
    assert(approx(lastPerCause, 1.0 - s, 1e-5))
  }

  test("profileCompare flags the planted drift and passes the stable column") {
    import graft.ops.DataQuality
    val a = (1 to 100).map(i => (i.toDouble, i % 50)).toDF("x", "k")
    // b: x mean doubled (mean fail), k restricted to 10 distinct
    // (distinct fail); no nulls anywhere (null ok)
    val b = (1 to 100).map(i => (i * 2.0, i % 10)).toDF("x", "k")
    val out = DataQuality.profileCompare(a, b, Seq("x", "k"),
      nullFracTol = 0.01, meanRelTol = 0.05, distinctRelTol = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("x").getAs[Boolean]("null_ok"))
    assert(!out("x").getAs[Boolean]("mean_ok"))
    assert(!out("k").getAs[Boolean]("distinct_ok"))
    assert(!out("x").getAs[Boolean]("ok"))
    // same frame on both sides: everything passes
    val same = DataQuality.profileCompare(a, a, Seq("x", "k")).collect()
    assert(same.forall(_.getAs[Boolean]("ok")))
    // exact vs sketch (the scale-safe DEFAULT) verdict parity: on this
    // fixture HLL's ~2% error is far inside the 20% distinct gate, so
    // every per-column verdict must agree between the two counters
    val exactOut = DataQuality.profileCompare(a, b, Seq("x", "k"),
        nullFracTol = 0.01, meanRelTol = 0.05, distinctRelTol = 0.2,
        exact = true)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("x", "k"); v <- Seq("null_ok", "mean_ok", "distinct_ok", "ok"))
      assert(out(c).getAs[Boolean](v) == exactOut(c).getAs[Boolean](v),
        s"exact/sketch verdict mismatch on $c.$v")
  }

  test("weightedQuantiles: weighted median splits on MASS, not rows") {
    // value 10 carries 90% of the weight: weighted median = 10,
    // unweighted median of rows would be 2
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (10.0, 27.0))
      .toDF("v", "w")
    val out = Stats.weightedQuantiles(df, col("v"), col("w"),
      Seq(0.1, 0.5, 1.0)).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(0.1) == 3.0) // cw: 1, 2, 3 — first ≥ 0.1·30 = 3 is v=3
    assert(out(0.5) == 10.0)
    assert(out(1.0) == 10.0)
    // uniform weights reduce to percentile_disc
    val uni = (1 to 100).map(i => (i.toDouble, 1.0)).toDF("v", "w")
    val r = Stats.weightedQuantiles(uni, col("v"), col("w"), Seq(0.5))
      .head()
    assert(r.getDouble(1) == 50.0)
    // non-positive weights ignored
    val neg = Seq((1.0, -5.0), (2.0, 1.0)).toDF("v", "w")
    assert(Stats.weightedQuantiles(neg, col("v"), col("w"), Seq(0.5))
      .head().getDouble(1) == 2.0)
  }

  test("tost: tight groups at the same mean ARE equivalent; " +
    "a real shift is NOT, and neither is an underpowered sample") {
    val same = (1 to 200).map(i =>
      (if (i % 2 == 0) "a" else "b", 10.0 + (i % 5) * 0.01))
    val r1 = Stats.tost(same.toDF("g", "v"), col("v"), col("g"),
      "a", "b", margin = 0.5).head()
    assert(r1.getAs[Boolean]("equivalent"))
    val shifted = (1 to 200).map(i =>
      (if (i % 2 == 0) "a" else "b",
        10.0 + (i % 5) * 0.01 + (if (i % 2 == 0) 1.0 else 0.0)))
    val r2 = Stats.tost(shifted.toDF("g", "v"), col("v"), col("g"),
      "a", "b", margin = 0.5).head()
    assert(!r2.getAs[Boolean]("equivalent"))
    // 2 rows per arm, huge variance: inconclusive → NOT equivalent
    val tiny = Seq(("a", 1.0), ("a", 20.0), ("b", 2.0), ("b", 19.0))
    val r3 = Stats.tost(tiny.toDF("g", "v"), col("v"), col("g"),
      "a", "b", margin = 0.5).head()
    assert(!r3.getAs[Boolean]("equivalent"))
  }

  // ---- Graph: modularity + clustering coefficient ----

  test("modularity: two disjoint triangles under a perfect 2-partition") {
    // m = 6 edges? no: two triangles = 6 edges total, 3 each.
    // L_c = 3, D_c = 6, q_c = 3/6 − (6/12)² = 0.25 each → Q = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("u", "v")
    val comm = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (10L, "b"), (11L, "b"), (12L, "b")).toDF("node", "c")
    val out = Graph.modularity(edges, "u", "v", comm, "node", "c").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3)
      assert(r.getAs[Long]("internal_edges") == 3)
      assert(approx(r.getAs[Double]("q_contrib"), 0.25, 1e-9))
    }
  }

  test("modularity: everything in ONE community scores Q = 0; " +
    "unassigned nodes become singletons") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val one = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("node", "c")
    val q1 = Graph.modularity(edges, "u", "v", one, "node", "c")
      .agg(sum("q_contrib")).head().getDouble(0)
    assert(approx(q1, 0.0, 1e-9))
    // node 3 missing from the map → its own singleton community
    val part = Seq((1L, "x"), (2L, "x")).toDF("node", "c")
    val rows = Graph.modularity(edges, "u", "v", part, "node", "c").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("degree_sum")).sum == 6)
  }

  test("clusteringCoefficient: clique interiors 1.0, star center 0") {
    // K4 ∪ star(20; 21,22,23)
    val k4 = for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong)
    val star = Seq((20L, 21L), (20L, 22L), (20L, 23L))
    val out = Graph.clusteringCoefficient(
      (k4 ++ star).toDF("u", "v"), "u", "v")
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("triangles"),
          r.getAs[Double]("coef"))).toMap
    (1 to 4).foreach(i => assert(out(i.toLong) == ((3L, 3L, 1.0))))
    assert(out(20L) == ((3L, 0L, 0.0)))
    assert(out(21L) == ((1L, 0L, 0.0))) // degree < 2 → coef 0
  }

  // ---- Ridge ----

  test("ridgePerGroup: lambda = 0 reproduces olsPerGroup; " +
    "lambda > 0 shrinks the slope monotonically") {
    val rows = (1 to 50).map(i =>
      ("g", i.toDouble, 2.5 * i + 3.0 + (i % 5 - 2) * 0.3))
    val df = rows.toDF("g", "x", "y")
    val ols = Experiment.olsPerGroup(df, col("g"), col("x"), col("y")).head()
    val r0 = Experiment.ridgePerGroup(df, col("g"), col("x"), col("y"),
      lambda = 0.0).head()
    assert(approx(r0.getAs[Double]("slope"), ols.getAs[Double]("slope"), 1e-9))
    assert(approx(r0.getAs[Double]("intercept"),
      ols.getAs[Double]("intercept"), 1e-9))
    val r1 = Experiment.ridgePerGroup(df, col("g"), col("x"), col("y"),
      lambda = 1000.0).head()
    val r2 = Experiment.ridgePerGroup(df, col("g"), col("x"), col("y"),
      lambda = 100000.0).head()
    val s0 = r0.getAs[Double]("slope")
    assert(r1.getAs[Double]("slope") < s0)
    assert(r2.getAs[Double]("slope") < r1.getAs[Double]("slope"))
    assert(r2.getAs[Double]("slope") > 0)
    // shrinking the slope can only lower plain R²
    assert(r2.getAs[Double]("r2") <= r0.getAs[Double]("r2") + 1e-12)
  }

  // ---- Markov transitions ----

  test("markovTransitions counts per-entity ordered transitions and " +
    "normalizes per current state") {
    // user 1: a→b→a; user 2: a→b — transitions a→b ×2, b→a ×1
    val df = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "b")).toDF("u", "t", "id", "s")
    val out = graft.ops.Sessionize.markovTransitions(df, col("u"),
      col("t"), col("id"), col("s")).collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(m(("a", "b")) == ((2L, 1.0)))
    assert(m(("b", "a")) == ((1L, 1.0)))
    assert(m.size == 2)
  }

  test("markovTransitions breaks equal timestamps by the tie column") {
    val df = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")).toDF("u", "t", "id", "s")
    val out = graft.ops.Sessionize.markovTransitions(df, col("u"),
      col("t"), col("id"), col("s")).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "a" && out.head.getString(1) == "b")
  }

  // ---- RFM ----

  test("rfm scores the good end high and is exact on a tiny fixture") {
    // 4 entities, q=2: entity 4 is most recent / most frequent / biggest
    val hour = 3600000000L
    val df = Seq(
      (1L, 0L * hour, 1.0),
      (2L, 1L * hour, 2.0), (2L, 2L * hour, 2.0),
      (3L, 3L * hour, 4.0), (3L, 3L * hour, 4.0), (3L, 3L * hour, 1.0),
      (4L, 10L * hour, 9.0), (4L, 10L * hour, 9.0), (4L, 10L * hour, 9.0),
      (4L, 10L * hour, 9.0)).toDF("u", "t", "v")
    val out = Stats.rfm(df, col("u"), col("t"), col("v"), q = 2)
      .collect().map(r => r.getAs[Long]("entity") -> r).toMap
    assert(out(1L).getAs[Long]("recency_h") == 10)
    assert(out(4L).getAs[Long]("recency_h") == 0)
    // good end high: entity 4 gets (2,2,2), entity 1 gets (1,1,1)
    assert(out(4L).getAs[String]("rfm") == "222")
    assert(out(1L).getAs[String]("rfm") == "111")
    assert(out(3L).getAs[Long]("frequency") == 3
      && approx(out(3L).getAs[Double]("monetary"), 9.0))
  }

  // ---- Poisson rates ----

  test("poissonRates: rate and band are exact closed forms") {
    val hour = 3600000000L
    // span = 2h; group a has 4 events, b has 1
    val df = Seq(("a", 0L), ("a", 1L * hour), ("a", 2L * hour),
      ("a", hour / 2), ("b", hour)).toDF("g", "t")
    val out = Stats.poissonRates(df, col("g"), col("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx(out("a").getAs[Double]("exposure_h"), 2.0))
    assert(approx(out("a").getAs[Double]("rate_per_h"), 2.0))
    assert(approx(out("a").getAs[Double]("ci_hi"), (4 + 1.96 * 2.0) / 2.0))
    assert(approx(out("b").getAs[Double]("ci_lo"), 0.0)) // floored
  }

  // ---- Post-hoc pairs ----

  test("posthocPairs agrees with welchTTest on a two-group frame " +
    "and enumerates k(k-1)/2 pairs") {
    val rows = (1 to 60).map(i =>
      (Seq("a", "b", "c")(i % 3), (i % 7).toDouble + (i % 3) * 2.0))
    val df = rows.toDF("g", "v")
    val pairs = RankTests.posthocPairs(df, col("v"), col("g")).collect()
    assert(pairs.length == 3)
    val ab = pairs.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    val welch = Stats.welchTTest(df.where(col("g").isin("a", "b")),
      col("v"), col("g"), "a", "b").head()
    assert(approx(ab.getAs[Double]("z"), welch.getAs[Double]("t_stat"), 1e-9))
    assert(approx(ab.getAs[Double]("dof"), welch.getAs[Double]("dof"), 1e-9))
  }

  test("kendallTau: ±1 on strict monotone data, hand-computed tau-b " +
    "under ties, and the loud cell gate") {
    import graft.ops.RankTests
    val up = (1 to 20).map(i => (i.toDouble, i * 2.0)).toDF("x", "y")
    assert(approx(RankTests.kendallTau(up, col("x"), col("y"))
      .head().getAs[Double]("tau_b"), 1.0, 1e-12))
    val down = (1 to 20).map(i => (i.toDouble, -i * 2.0)).toDF("x", "y")
    assert(approx(RankTests.kendallTau(down, col("x"), col("y"))
      .head().getAs[Double]("tau_b"), -1.0, 1e-12))
    // hand-computed tie case: (1,1), (1,2), (2,1), (2,2)
    // C = {(1,1)-(2,2)} = 1, D = {(1,2)-(2,1)} = 1, S = 0 → tau = 0;
    // n0 = 6, n1 = n2 = 2 (one tie pair per x value / per y value)
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0))
      .toDF("x", "y")
    val r = RankTests.kendallTau(tied, col("x"), col("y")).head()
    assert(r.getAs[Long]("n_concordant") == 1L)
    assert(r.getAs[Long]("n_discordant") == 1L)
    assert(approx(r.getAs[Double]("tau_b"), 0.0))
    // all rows one cell: both margins are pure ties → null face
    val const = Seq((1.0, 1.0), (1.0, 1.0)).toDF("x", "y")
    val cr = RankTests.kendallTau(const, col("x"), col("y")).head()
    assert(cr.isNullAt(cr.fieldIndex("tau_b")))
    // duplicated rows collapse to cells with counts: tau over
    // (1,1)x3, (2,2)x2 is still exactly 1
    val dup = Seq((1.0, 1.0), (1.0, 1.0), (1.0, 1.0), (2.0, 2.0),
      (2.0, 2.0)).toDF("x", "y")
    assert(approx(RankTests.kendallTau(dup, col("x"), col("y"))
      .head().getAs[Double]("tau_b"),
      // C = 6, D = 0; n = 5, n0 = 10, n1 = n2 = 3 + 1 = 4
      6.0 / 6.0, 1e-12))
    val e = intercept[IllegalArgumentException] {
      RankTests.kendallTau((1 to 50).map(i => (i.toDouble, i.toDouble))
        .toDF("x", "y"), col("x"), col("y"), maxCells = 10)
    }
    assert(e.getMessage.contains("distinct (x, y) cells"))
  }

  test("wasserstein1: exact on point masses, shifts, and multiplicity; " +
    "loud on an unbounded distinct table") {
    import graft.ops.Stats
    def w1(rows: Seq[(Double, String)]): Double =
      Stats.wasserstein1(rows.toDF("v", "g"), col("v"), col("g"), "a", "b")
        .head().getAs[Double]("w1")
    // two point masses: W1 = the distance between them
    assert(approx(w1(Seq((0.0, "a"), (5.0, "b"))), 5.0, 1e-12))
    // identical samples: 0
    assert(approx(w1(Seq((0.0, "a"), (1.0, "a"), (0.0, "b"), (1.0, "b"))),
      0.0))
    // a shift moves W1 by exactly the shift
    val shifted = Seq(1.0, 2.0, 3.0).map(_ -> "a") ++
      Seq(2.0, 3.0, 4.0).map(_ -> "b")
    assert(approx(w1(shifted), 1.0, 1e-12))
    // multiplicity: a = {0, 0, 2}, b = {1, 1, 1}:
    // |2/3 - 0|*1 + |2/3 - 1|*1 = 1
    val mult = Seq((0.0, "a"), (0.0, "a"), (2.0, "a"),
      (1.0, "b"), (1.0, "b"), (1.0, "b"))
    assert(approx(w1(mult), 1.0, 1e-12))
    // unlike KS (which saturates at 1), disjoint FAR supports scale
    assert(approx(w1(Seq((0.0, "a"), (100.0, "b"))), 100.0, 1e-12))
    val e2 = intercept[IllegalArgumentException] {
      Stats.wasserstein1((1 to 40).map(i => (i.toDouble, if (i % 2 == 0)
        "a" else "b")).toDF("v", "g"), col("v"), col("g"), "a", "b",
        maxDistinct = 10)
    }
    assert(e2.getMessage.contains("quantize"))
  }

  test("cramerVonMises: zero on identical samples, hand-computed on a " +
    "two-point fixture, and sensitive to a broad shift KS understates") {
    import graft.ops.Stats
    def cvm(rows: Seq[(Double, String)]): Double =
      Stats.cramerVonMises(rows.toDF("v", "g"), col("v"), col("g"),
        "a", "b").head().getAs[Double]("cvm")
    assert(approx(
      cvm(Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b"))), 0.0))
    // a = {0}, b = {1}: at v=0 d = 1 (weight 1), at v=1 d = 0 (weight 1)
    // T = (1·1/4)·(1·1² + 1·0²) = 0.25
    assert(approx(cvm(Seq((0.0, "a"), (1.0, "b"))), 0.25, 1e-12))
    // interleaved half-step shift: every a point leads by exactly 1/50,
    // every b point closes the gap — KS sees only the single-step 0.02,
    // CvM integrates the 50 alternating gaps:
    // T = (50·50/100²)·50·(1/50)² = 0.005, exactly
    val broad = (1 to 50).map(i => (i.toDouble, "a")) ++
      (1 to 50).map(i => (i + 0.5, "b"))
    val t = cvm(broad)
    val ks = Stats.ksStatistic(broad.toDF("v", "g"), col("v"), col("g"),
      "a", "b").head().getAs[Double]("ks_stat")
    assert(approx(ks, 0.02, 1e-12) && approx(t, 0.005, 1e-12),
      s"ks=$ks cvm=$t")
  }
}
