package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** KLL quantile-sketch tables (Stats.buildKllSketches/rollupKllSketches +
  * the native graft_kll_* expressions): exact in the ≤k regime,
  * error-bounded above it, mergeable, parquet-persistable. */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: quantiles of 1..100 are the order statistics") {
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "x")
    val sk = Stats.buildKllSketches(df, Seq("g"), col("x"), k = 400)
    val r = Stats.rollupKllSketches(sk, Seq("g"), Seq(0.0, 0.25, 0.5, 0.9, 1.0), k = 400)
      .head()
    assert(r.getString(0) == "a")
    assert(r.getSeq[Double](1) == Seq(1.0, 25.0, 50.0, 90.0, 100.0))
    assert(r.getLong(2) == 100L)
  }

  test("exact regime: rollup across groups equals quantiles of the union") {
    // two groups of 100; merged sketch (200 < k=400) stays exact
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (101 to 200).map(i => ("b", i.toDouble))).toDF("g", "x")
    val sk = Stats.buildKllSketches(df, Seq("g"), col("x"), k = 400)
    val r = Stats.rollupKllSketches(sk, Seq.empty, Seq(0.25, 0.5, 0.75), k = 400).head()
    assert(r.getSeq[Double](0) == Seq(50.0, 100.0, 150.0))
    assert(r.getLong(1) == 200L)
  }

  test("approximate regime: 100k values, rank error within the k=200 bound") {
    // x_i = i/n so value ~ normalized rank; KLL k=200 one-sided rank error
    // is ~1.65% at 99% confidence — assert a loose 3%
    val n = 100000
    val df = spark.range(n).select(lit("a").as("g"),
      (col("id") + 1).cast("double") / n as "x")
    val sk = Stats.buildKllSketches(df, Seq("g"), col("x"), k = 200)
    val qs = Stats.rollupKllSketches(sk, Seq("g"), Seq(0.1, 0.5, 0.9), k = 200)
      .head().getSeq[Double](1)
    Seq(0.1, 0.5, 0.9).zip(qs).foreach { case (want, got) =>
      assert(math.abs(got - want) < 0.03, s"rank $want -> $got")
    }
  }

  test("sketchK path: winsorize/robustScale/fitQuantileBins exact while n <= k") {
    // n = 150 <= sketchK = 400: the sketch holds every value, so fences
    // are exact ORDER STATISTICS; the clip/scale outputs must agree with
    // hand-computed fences (the interpolating exact percentile differs by
    // definition, not by error — so compare against order statistics)
    val xs = (1 to 150).map(_.toDouble)
    val df = xs.map(Tuple1(_)).toDF("x")
    // 1%/99% fences of 1..150: inclusive-rank order stats = 2.0 and 149.0
    val w = Stats.winsorize(df, col("x"), 0.01, 0.99, sketchK = 400)
      .agg(min("winsorized"), max("winsorized")).head()
    assert(w.getDouble(0) == 2.0 && w.getDouble(1) == 149.0, w.toString)
    val bounds = Stats.fitQuantileBins(df, col("x"), 3, sketchK = 400)
    assert(bounds == Seq(50.0, 100.0), bounds)
    // median 75 (inclusive order stat at rank .5), MAD of |x-75| similarly
    val rs = Stats.robustScale(df, col("x"), sketchK = 400)
    val med = 75.0
    val z75 = rs.where(col("x") === med).select("robust_z").head().getDouble(0)
    assert(z75 == 0.0, s"z(median) = $z75")
  }

  test("sketchK path: error-bounded parity with the exact fit at 100k rows") {
    // uniform values = normalized ranks, so |sketch fence − exact fence|
    // IS the rank error; KLL k=200 one-sided error ~1.65% @99% — loose 3%
    val n = 100000
    val df = spark.range(n).select(((col("id") + 1).cast("double") / n).as("x"))
    val exact = Stats.fitQuantiles(df, col("x"), Seq(0.01, 0.5, 0.99), 6, 0)
    val sketch = Stats.fitQuantiles(df, col("x"), Seq(0.01, 0.5, 0.99), 6, 200)
    exact.zip(sketch).foreach { case (e, s) =>
      assert(math.abs(e - s) <= 0.03, s"exact $e vs sketch $s")
    }
    // and the winsorize face composes the same fit
    val w = Stats.winsorize(df, col("x"), 0.01, 0.99, sketchK = 200)
      .agg(min("winsorized"), max("winsorized")).head()
    assert(math.abs(w.getDouble(0) - 0.01) <= 0.03 &&
      math.abs(w.getDouble(1) - 0.99) <= 0.03, w.toString)
  }

  test("kllRank and kllN read the sketch; rank is inclusive") {
    val shim = org.apache.spark.sql.graft.SketchShim
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "x")
    val sk = Stats.buildKllSketches(df, Seq("g"), col("x"), k = 400)
    val r = sk.select(shim.kllRank(col("kll"), lit(50.0)).as("rk"),
      shim.kllN(col("kll")).as("n")).head()
    assert(approx(r.getDouble(0), 0.5, 1e-12))
    assert(r.getLong(1) == 100L)
  }

  test("sketch table round-trips through parquet and still rolls up") {
    val df = ((1 to 50).map(i => ("a", "x", i.toDouble)) ++
      (51 to 100).map(i => ("a", "y", i.toDouble))).toDF("g", "h", "v")
    val sk = Stats.buildKllSketches(df, Seq("g", "h"), col("v"), k = 400)
    val path = java.nio.file.Files.createTempDirectory("kll").toString + "/sk"
    sk.write.mode("overwrite").parquet(path)
    val r = Stats.rollupKllSketches(spark.read.parquet(path), Seq("g"),
      Seq(0.5, 1.0), k = 400).head()
    assert(r.getString(0) == "a")
    assert(r.getSeq[Double](1) == Seq(50.0, 100.0))
    assert(r.getLong(2) == 100L)
  }

  test("groupedQuantiles: exact face hand-checked; sketch face exact while n <= k") {
    // group a: 1..100 → p50 = 50.5 (interpolated), p90 = 90.1;
    // group b: constant 7
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq.fill(10)(("b", 7.0))).toDF("g", "v")
    val out = Stats.groupedQuantiles(df, col("g"), col("v"),
      Seq(0.5, 0.9)).orderBy("grp").collect()
    assert(out(0).getAs[Double]("p50") == 50.5)
    assert(out(0).getAs[Double]("p90") == 90.1)
    assert(out(1).getAs[Double]("p50") == 7.0)
    // sketch face: exact-regime KLL (n <= k) returns order statistics —
    // inclusive-rank values, so within one step of the interpolated face
    val sk = Stats.groupedQuantiles(df, col("g"), col("v"),
      Seq(0.5, 0.9), sketchK = 400).orderBy("grp").collect()
    assert(math.abs(sk(0).getAs[Double]("p50") - 50.5) <= 1.0)
    assert(math.abs(sk(0).getAs[Double]("p90") - 90.1) <= 1.0)
    assert(sk(1).getAs[Double]("p50") == 7.0)
    // quantile → column-name mapping handles fractional percents
    val frac = Stats.groupedQuantiles(df, col("g"), col("v"),
      Seq(0.999)).columns.toSeq
    assert(frac.contains("p99_9"))
    intercept[IllegalArgumentException](
      Stats.groupedQuantiles(df, col("g"), col("v"), Seq(1.5)))
  }

  test("empty-input sketch reads as NaN quantile, zero n") {
    val shim = org.apache.spark.sql.graft.SketchShim
    val df = Seq(("a", Option.empty[Double])).toDF("g", "x")
    val sk = df.groupBy("g").agg(shim.kllAgg(col("x"), 200).as("kll"))
    val r = sk.select(shim.kllQuantile(col("kll"), lit(0.5)).as("q"),
      shim.kllN(col("kll")).as("n")).head()
    assert(r.getDouble(0).isNaN)
    assert(r.getLong(1) == 0L)
  }
}
