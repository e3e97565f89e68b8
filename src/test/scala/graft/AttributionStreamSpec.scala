package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.TouchEvent

/** Streaming last-touch attribution == batch
  * Sessionize.lastTouchAttribution on in-order-per-entity streams,
  * including across micro-batch boundaries. */
class AttributionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val LOOKBACK = 100L

  /** Deterministic event soup over 40 entities covering every credit
    * fate: fresh touch, stale touch (outside lookback), direct
    * conversion (no touch at all), multiple touches (most recent wins),
    * equal-timestamp touches (largest tie wins), and a second
    * conversion crediting a touch that arrived after the first. */
  private def fixture: Seq[TouchEvent] = (0 until 40).flatMap { i =>
    val e = s"u$i"
    val t0 = 1000L + i
    i % 5 match {
      case 0 => Seq( // fresh touch then conversion
        TouchEvent(e, t0, 1, conv = false, "email", 0.0),
        TouchEvent(e, t0 + 10, 2, conv = true, null, 5.0))
      case 1 => Seq( // touch too old: direct conversion
        TouchEvent(e, t0, 1, conv = false, "ad", 0.0),
        TouchEvent(e, t0 + LOOKBACK + 1, 2, conv = true, null, 7.0))
      case 2 => Seq( // no touch ever: direct
        TouchEvent(e, t0, 1, conv = true, null, 1.0))
      case 3 => Seq( // most recent of several touches wins; equal-t
        // touches break on the larger tie id ("push" beats "sms")
        TouchEvent(e, t0, 1, conv = false, "email", 0.0),
        TouchEvent(e, t0 + 5, 2, conv = false, "sms", 0.0),
        TouchEvent(e, t0 + 5, 3, conv = false, "push", 0.0),
        TouchEvent(e, t0 + 20, 4, conv = true, null, 3.0))
      case _ => Seq( // two conversions, a new touch between them
        TouchEvent(e, t0, 1, conv = false, "ad", 0.0),
        TouchEvent(e, t0 + 8, 2, conv = true, null, 2.0),
        TouchEvent(e, t0 + 30, 3, conv = false, "social", 0.0),
        TouchEvent(e, t0 + 40, 4, conv = true, null, 4.0))
    }
  }

  private def batchRows: Set[(String, Long, Long, Double, String, Any)] =
    graft.ops.Sessionize.lastTouchAttribution(
        fixture.toDF("entity", "t", "tie", "conv", "label", "value"),
        col("entity"), col("t"), col("tie"), col("conv"), col("label"),
        col("value"), lookback = LOOKBACK)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), if (r.isNullAt(5)) null else r.getLong(5)))
      .toSet

  test("AttributionStream == batch lastTouchAttribution row-for-row, " +
    "including across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixture
    val batch = batchRows
    val input = MemoryStream[TouchEvent]
    val q = StreamingOps.AttributionStream.run(input.toDS(), LOOKBACK)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      // the SAME events in three in-order-per-entity micro-batches
      val byTime = events.sortBy(e => (e.t, e.tie))
      val (b1, rest) = byTime.splitAt(byTime.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val got = spark.table("attr_stream")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getString(4),
          if (r.isNullAt(5)) null else r.getLong(5)))
        .toSet
      assert(got == batch,
        s"stream-only: ${got -- batch}; batch-only: ${batch -- got}")
      // sanity: the fixture exercises attributed AND direct conversions
      assert(batch.exists(_._5 != null) && batch.exists(_._5 == null))
      // and the tie-break case credits "push", not "sms"
      assert(batch.exists(_._5 == "push") && !batch.exists(_._5 == "sms"))
    } finally q.stop()
  }

  test("AttributionStream: a late touch folds into state (max is " +
    "commutative) but an already-emitted conversion is not revised") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TouchEvent]
    val q = StreamingOps.AttributionStream.run(input.toDS(), LOOKBACK)
      .writeStream.format("memory").queryName("attr_late")
      .outputMode("append").start()
    try {
      input.addData(
        TouchEvent("u", 1000L, 1, conv = false, "email", 0.0),
        TouchEvent("u", 1010L, 2, conv = true, null, 5.0))
      q.processAllAvailable()
      // a LATE touch timestamped between the first touch and the
      // conversion: appended output stays as emitted (no revision) ...
      input.addData(TouchEvent("u", 1005L, 3, conv = false, "ad", 0.0))
      q.processAllAvailable()
      // ... but the state kept the max key, so the next conversion
      // credits the newer of the two touches
      input.addData(TouchEvent("u", 1020L, 4, conv = true, null, 6.0))
      q.processAllAvailable()
      val rows = spark.table("attr_late")
        .orderBy("convT").collect()
        .map(r => (r.getLong(1), r.getString(4)))
      assert(rows.toSeq == Seq((1010L, "email"), (1020L, "ad")))
    } finally q.stop()
  }
}
