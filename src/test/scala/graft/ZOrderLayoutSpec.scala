package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Z-order layout: interleaving arithmetic vs a reference Morton encode,
  * and the actual locality property the layout exists for — per-partition
  * (≈ per-file) ranges stay tight on EVERY dimension, where a
  * single-column sort leaves the other dimension's range at full width. */
class ZOrderLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(dims: Seq[Long], bits: Int): Long =
    (for { j <- 0 until bits; i <- dims.indices }
      yield ((dims(i) >> j) & 1L) << (j * dims.size + i)).reduce(_ | _)

  test("zorderKey matches the reference Morton encode (2 and 3 dims)") {
    val pts = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (5L, 9L, 2L), (255L, 255L, 255L), (300L, 7L, 513L)) // >2^bits masked
    val df = pts.toDF("x", "y", "z")
    val got2 = df.select(Skew.zorderKey(Seq(col("x"), col("y")), 8))
      .collect().map(_.getLong(0))
    val exp2 = pts.map(p => mortonRef(Seq(p._1 & 255, p._2 & 255), 8))
    assert(got2.toSeq == exp2)
    val got3 = df.select(Skew.zorderKey(Seq(col("x"), col("y"), col("z")), 8))
      .collect().map(_.getLong(0))
    val exp3 = pts.map(p =>
      mortonRef(Seq(p._1 & 255, p._2 & 255, p._3 & 255), 8))
    assert(got3.toSeq == exp3)
  }

  test("z-order partitioning keeps both dims local; single-column sort does not") {
    // full 64x64 grid, 16 range partitions (~256 rows each)
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def avgYRange(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y")).as("r"))
        .agg(avg("r")).collect()(0).getDouble(0)
    val byX = grid.repartitionByRange(16, col("x"))
    val byZ = grid.repartitionByRange(16,
      Skew.zorderKey(Seq(col("x"), col("y")), 6))
    val (rx, rz) = (avgYRange(byX), avgYRange(byZ))
    // x-ranged partitions see the full y span (63); z-ranged partitions
    // cover compact blocks on both dims
    assert(rx > 60.0, s"x-sorted baseline should span y fully, got $rx")
    assert(rz < rx / 2.0, s"z-order y-range $rz should beat x-sort $rx by 2x+")
  }

  test("writeZOrdered: per-file min/max footprints are tight on both dims") {
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Skew.writeZOrdered(grid, s"$dir/z", Seq(col("x"), col("y")),
      bits = 6, numFiles = 16)
    val files = new java.io.File(s"$dir/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 16)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max("x") - min("x"), max("y") - min("y")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val avgX = ranges.map(_._1).sum.toDouble / ranges.length
    val avgY = ranges.map(_._2).sum.toDouble / ranges.length
    // 4096 rows / 16 files = 256-point cells; a compact block has range
    // ~16-32 per dim, vs 63 for a file of a 1-D-sorted layout
    assert(avgX < 32 && avgY < 32, s"expected compact cells, got $avgX/$avgY")
    // round-trip: nothing lost
    assert(spark.read.parquet(s"$dir/z").count() == 4096)
  }
}
