package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Pre-aggregated HLL sketch tables: rollup-from-sketches equals
  * sketch-the-raw-data (lossless union at fixed lgConfigK), estimates
  * track exact distinct counts, and the table round-trips parquet. */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = (1 to 5000).map { i =>
    (s"cat${i % 3}", s"sub${i % 7}", s"user${i % 911}")
  }.toDF("cat", "sub", "user")

  test("rollup from the sketch table tracks exact coarse-grain distincts (within HLL error)") {
    val df = fixture
    val fine = Stats.buildHllSketches(df, Seq("cat", "sub"), col("user"))
    assert(fine.count() == 21) // 3 x 7 fine groups
    val fromSketches = Stats.rollupHllSketches(fine, Seq("cat"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every cat residue class covers all 911 user residues (gcd(3,911)=1,
    // ~1667 rows per cat), so the exact per-cat distinct is 911
    fromSketches.foreach { case (cat, est) =>
      assert(math.abs(est - 911.0) / 911.0 < 0.02, s"$cat: $est vs 911")
    }
  }

  test("estimates track exact distinct counts; n_rows is exact") {
    val df = fixture
    val fine = Stats.buildHllSketches(df, Seq("cat", "sub"), col("user"))
    val global = Stats.rollupHllSketches(fine, Seq.empty).collect()(0)
    val exact = df.select(countDistinct("user")).collect()(0).getLong(0)
    assert(math.abs(global.getLong(0).toDouble - exact) / exact < 0.05,
      s"est ${global.getLong(0)} vs exact $exact")
    assert(global.getLong(1) == 5000)
  }

  test("sketch table round-trips parquet and still unions") {
    val df = fixture
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    Stats.buildHllSketches(df, Seq("cat", "sub"), col("user"))
      .write.mode("overwrite").parquet(s"$dir/sk")
    val back = Stats.rollupHllSketches(
      spark.read.parquet(s"$dir/sk"), Seq("sub"))
    assert(back.count() == 7)
    val est = back.agg(sum("n_rows")).collect()(0).getLong(0)
    assert(est == 5000)
  }
}
