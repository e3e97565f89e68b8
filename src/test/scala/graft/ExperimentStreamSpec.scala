package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps

/** Stream == batch parity for the experiment-family monitor. */
class ExperimentStreamSpec extends SparkSpec {
  import spark.implicits._

  test("abConversionStream: unit-level counts == batch, cross-batch unit dedup") {
    implicit val sqlCtx = spark.sqlContext
    def tmin(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[(Timestamp, String, Long, Boolean)]
    val out = StreamingOps.abConversionStream(
      input.toDF().toDF("ts", "arm", "unit", "conv"), "ts",
      col("arm"), col("unit"), col("conv"),
      windowDur = "10 minutes", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("ab_stream")
      .outputMode("append").start()
    try {
      // window 1: arm a units 1,2,3 (unit 1 converts — across TWO
      // batches and with a duplicate conversion event); arm b units
      // 10, 11; 11 converts.
      input.addData((tmin(1), "a", 1L, false), (tmin(1), "a", 2L, false),
        (tmin(2), "a", 1L, true))
      input.addData((tmin(3), "a", 1L, true), (tmin(3), "a", 3L, false),
        (tmin(4), "b", 10L, false), (tmin(5), "b", 11L, true))
      input.addData((tmin(40), "z", 99L, false)) // close window 1
      q.processAllAvailable()
      val got = spark.table("ab_stream")
        .where(col("arm").isin("a", "b"))
        .select("arm", "n_units", "n_converted", "rate")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(got("a") == ((3L, 1L, 1.0 / 3)), s"got ${got("a")}")
      assert(got("b") == ((2L, 1L, 0.5)), s"got ${got("b")}")
      // batch twin over the same window-1 events
      val batch = Seq(("a", 1L, true), ("a", 1L, false), ("a", 2L, false),
        ("a", 3L, false), ("b", 10L, false), ("b", 11L, true))
        .toDF("arm", "unit", "conv")
        .groupBy("arm", "unit").agg(max(col("conv").cast("int")).as("c"))
        .groupBy("arm").agg(count(lit(1)).as("n"), sum("c").as("x"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      assert(batch("a") == ((got("a")._1, got("a")._2)))
      assert(batch("b") == ((got("b")._1, got("b")._2)))
    } finally q.stop()
  }
}
