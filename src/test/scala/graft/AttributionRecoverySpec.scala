package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.TouchEvent

/** Crash-recovery of the streaming attribution state (the
  * StreamRecoverySpec discipline applied to [[StreamingOps.AttributionStream]]):
  * a restart from the checkpoint must be EXACTLY-ONCE — no re-emitted
  * credit rows — and the per-entity packed touch key must survive the
  * crash, so a post-restart conversion still credits a PRE-crash touch
  * it never saw in its own run. */
class AttributionRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("AttributionStream: restart from checkpoint keeps the touch " +
    "state and emits each conversion exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("attr_rec")
    val outDir = root.resolve("out").toString
    val cpDir = root.resolve("cp").toString

    val input = MemoryStream[TouchEvent]
    def start() = StreamingOps.AttributionStream
      .run(input.toDS(), lookback = 100L)
      .toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cpDir)
      .outputMode("append")
      .start()

    // ---- run 1: a touch and a first conversion, then a hard stop
    val q1 = start()
    try {
      input.addData(
        TouchEvent("u", 1000L, 1, conv = false, "email", 0.0),
        TouchEvent("u", 1010L, 2, conv = true, null, 5.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // ---- run 2: restart from the checkpoint; the new conversion's
    // credit depends ENTIRELY on the restored (enc, label) state — the
    // "email" touch was only ever seen before the crash
    input.addData(TouchEvent("u", 1020L, 3, conv = true, null, 7.0))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select("convT", "value", "touchLabel", "touchT")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == 2, s"expected exactly 2 credit rows, got ${got.toSeq}")
    assert(got(0) == ((1010L, 5.0, "email", 1000L)), got(0))
    // the post-restart conversion credits the pre-crash touch
    assert(got(1) == ((1020L, 7.0, "email", 1000L)), got(1))
  }
}
