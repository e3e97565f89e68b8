package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Fused multi-column drift report: hand-computed fixture, exact parity
  * with the single-column KS/W1/CvM faces, and the loud per-feature
  * contract guards. */
class DriftReportSpec extends SparkSpec {
  import spark.implicits._

  test("driftReport matches the hand-computed quartet per feature") {
    // feature x: a = {1,1,2,3}, b = {2,3,3,4}; feature y = 2x.
    // Distinct x: 1,2,3,4; F_a = .5,.75,1,1; F_b = 0,.25,.75,1
    // ks = .5; w1 = .5 + .5 + .25 = 1.25
    // cvm = (4·4/64)·(2·.25 + 2·.25 + 3·.0625 + 1·0) = .25·1.1875
    // psi (k=10, α=.5): ref-ECDF bins 4/7/9/9 → nr (2,1,1), nc (0,1,3)
    //   = (2/9)·ln5 + 0 + (−2/9)·ln(3/7) = 0.545941282849…
    // y doubles every value: w1 doubles, ks/cvm/psi are ECDF-shape
    // invariants and stay fixed.
    val rows = Seq((1.0, "a"), (1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.0, "b"), (3.0, "b"), (3.0, "b"), (4.0, "b"))
      .map { case (v, g) => (g, v, 2.0 * v) }
    val out = Stats.driftReport(rows.toDF("g", "x", "y"), Seq("x", "y"),
        col("g"), "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    for ((f, w1Expected) <- Seq(("x", 1.25), ("y", 2.5))) {
      val r = out(f)
      assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
      assert(r.getAs[Long]("n_distinct") == 4)
      assert(approx(r.getAs[Double]("ks"), 0.5, 1e-12))
      assert(approx(r.getAs[Double]("w1"), w1Expected, 1e-12))
      assert(approx(r.getAs[Double]("cvm"), 0.296875, 1e-12))
      assert(approx(r.getAs[Double]("psi"), 0.5459412828491787, 1e-9))
    }
  }

  test("driftReport agrees exactly with the single-column drift faces") {
    val df = (1 to 60).map(i => (if (i % 2 == 0) "a" else "b",
      ((i * 7) % 13).toDouble, ((i * 3) % 5).toDouble)).toDF("g", "v1", "v2")
    val rep = Stats.driftReport(df, Seq("v1", "v2"), col("g"), "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    for (f <- Seq("v1", "v2")) {
      val ks = Stats.ksStatistic(df, col(f), col("g"), "a", "b")
        .head().getAs[Double]("ks_stat")
      val w1 = Stats.wasserstein1(df, col(f), col("g"), "a", "b").head()
      val cvm = Stats.cramerVonMises(df, col(f), col("g"), "a", "b")
        .head().getAs[Double]("cvm")
      assert(approx(rep(f).getAs[Double]("ks"), ks, 1e-12))
      assert(approx(rep(f).getAs[Double]("w1"),
        w1.getAs[Double]("w1"), 1e-9))
      assert(rep(f).getAs[Long]("n_distinct") ==
        w1.getAs[Long]("n_distinct"))
      assert(approx(rep(f).getAs[Double]("cvm"), cvm, 1e-9))
      assert(rep(f).getAs[Double]("psi") >= 0.0)
    }
  }

  test("driftReport guards fire loudly and NAME the offending features") {
    val df = Seq(("a", Some(1.0), Some(1.0)), ("a", Some(2.0), None),
      ("b", Some(3.0), None), ("b", Some(4.0), None))
      .toDF("g", "x", "z")
    intercept[IllegalArgumentException](
      Stats.driftReport(df, Seq("x", "x"), col("g"), "a", "b"))
    val eGate = intercept[IllegalArgumentException] {
      Stats.driftReport(df, Seq("x"), col("g"), "a", "b", maxDistinct = 3)
    }
    assert(eGate.getMessage.contains("[x]")
      && eGate.getMessage.contains("quantize"))
    // z is non-null only in group a → empty-in-one-group, named
    val eEmpty = intercept[IllegalArgumentException] {
      Stats.driftReport(df, Seq("x", "z"), col("g"), "a", "b")
    }
    assert(eEmpty.getMessage.contains("[z]"))
    // a feature that is entirely null is reported as missing, by name
    val eNull = intercept[IllegalArgumentException] {
      Stats.driftReport(df.withColumn("w", lit(null).cast("double")),
        Seq("x", "w"), col("g"), "a", "b")
    }
    assert(eNull.getMessage.contains("[w]")
      && eNull.getMessage.contains("no non-null"))
  }
}
