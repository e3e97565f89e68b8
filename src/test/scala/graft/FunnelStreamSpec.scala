package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.FunnelEvent

/** Streaming ordered funnel == batch Stats.funnel on in-order streams. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")
  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  /** Deterministic event soup: 60 entities with varied funnel fates —
    * full conversions, stalls at each step, out-of-order step attempts,
    * and one deadline miss. */
  private def fixture: Seq[FunnelEvent] = (0 until 60).flatMap { i =>
    val e = s"u$i"
    i % 6 match {
      case 0 => Seq(FunnelEvent(e, ts(i), "view"),
        FunnelEvent(e, ts(i + 5), "click"),
        FunnelEvent(e, ts(i + 9), "purchase")) // full conversion
      case 1 => Seq(FunnelEvent(e, ts(i), "view"),
        FunnelEvent(e, ts(i + 3), "click")) // stalls before purchase
      case 2 => Seq(FunnelEvent(e, ts(i), "view")) // stalls at step 0
      case 3 => Seq(FunnelEvent(e, ts(i), "click"),
        FunnelEvent(e, ts(i + 1), "purchase")) // never starts
      case 4 => Seq(FunnelEvent(e, ts(i), "purchase"),
        FunnelEvent(e, ts(i + 1), "view"),
        FunnelEvent(e, ts(i + 2), "click"),
        FunnelEvent(e, ts(i + 3), "purchase")) // pre-start steps ignored
      case _ => Seq(FunnelEvent(e, ts(i), "view"),
        FunnelEvent(e, ts(i + 60), "click")) // misses the 30s deadline
    }
  }

  test("FunnelStream == batch Stats.funnel per-step entity counts, " +
    "including across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val events = fixture
    val batch = graft.ops.Stats.funnel(
      events.toDF("entity", "ts", "step")
        .withColumn("t", col("ts").cast("double")),
      col("entity"), col("t"), col("step"), steps, maxSpan = 30.0)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

    val input = MemoryStream[FunnelEvent]
    val out = StreamingOps.FunnelStream.run(input.toDS(), steps,
      maxSpanMs = 30000L)
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // split the SAME events into three in-order-per-entity batches
      val byTime = events.sortBy(_.ts.getTime)
      val (b1, rest) = byTime.splitAt(byTime.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      val got = spark.table("funnel_stream")
        .groupBy("stepIdx").agg(countDistinct("entity").as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      steps.indices.foreach { i =>
        assert(got.getOrElse(i, 0L) == batch(i),
          s"step $i: stream ${got.getOrElse(i, 0L)} vs batch ${batch(i)}")
      }
      // sanity: the fixture exercises real attrition
      assert(batch(0) > batch(1) && batch(1) > batch(2) && batch(2) > 0)
    } finally q.stop()
  }

  test("FunnelStream emits each step at most once per entity and " +
    "never rewinds on late duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = StreamingOps.FunnelStream.run(input.toDS(), steps, 30000L)
      .writeStream.format("memory").queryName("funnel_once")
      .outputMode("append").start()
    try {
      input.addData(FunnelEvent("u", ts(0), "view"),
        FunnelEvent("u", ts(1), "click"))
      q.processAllAvailable()
      // late re-sends and an earlier-timestamped duplicate: no new hits
      input.addData(FunnelEvent("u", ts(0), "view"),
        FunnelEvent("u", ts(1), "click"))
      q.processAllAvailable()
      // a purchase AT the click instant still advances (inclusive chain)
      input.addData(FunnelEvent("u", ts(1), "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_once")
        .collect().map(r => (r.getInt(1), r.getLong(2)))
      assert(rows.length == 3)
      assert(rows.map(_._1).sorted.toSeq == Seq(0, 1, 2))
    } finally q.stop()
  }
}
