package graft

import org.apache.spark.sql.functions._
import graft.api.Typed
import graft.ops.{Sessionize, SlidingWindows}

/** The typed Dataset[T] facade: zero-copy views over the signature row
  * shapes, with compile-time field access and typed aggregation. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("windows: typed view over the windower output, fields accessible") {
    val base = (1 to 20).map(i => (i.toLong, Seq(i.toDouble, i * 2.0)))
      .toDF("t", "feats")
    val win = SlidingWindows.slide(base, Nil, Seq(col("t")), col("feats"),
        seqLen = 4, step = 4)
      .withColumn("y", lit(1))
    val typed = Typed.windows(win).collect().sortBy(_.win_id)
    assert(typed.length == 5)
    assert(typed.head.window.length == 4) // seqLen rows
    assert(typed.head.window.head == Seq(1.0, 2.0)) // oldest first
    assert(typed.forall(_.y == 1))
  }

  test("episodes + detectionSummary: typed option fields for missed episodes") {
    // two episodes: e1 detected at its 2nd row, e2 never detected
    val df = Seq(
      (1L, 1, 0, "e1"), (2L, 1, 1, "e1"), (3L, 0, 0, "-"),
      (4L, 1, 0, "e2"), (5L, 1, 0, "e2")).toDF("idx", "yt", "yp", "ep")
    val eps = Typed.episodes(
      Sessionize.episodes(df, col("idx"), col("yt"), col("yp"), col("ep")))
    val rows = eps.collect().sortBy(_.episode)
    assert(rows.map(_.episode_id).toSeq == Seq("e1", "e2"))
    assert(rows(0).det_idx.contains(2L) && rows(0).delay_windows.contains(1L))
    assert(rows(1).det_idx.isEmpty && rows(1).delay_windows.isEmpty)
    val (rate, meanDelay) = Typed.detectionSummary(eps)
    assert(approx(rate, 0.5) && meanDelay.contains(1.0))
  }

  test("scored: typed filter composes with the untyped metric ops") {
    val df = Seq((1, 0.9), (0, 0.2), (1, 0.4), (0, 0.8)).toDF("y_true", "score")
    val highConf = Typed.scored(df).filter(_.score > 0.5)
    assert(highConf.count() == 2)
    // back to DataFrame-land without copying
    assert(highConf.toDF().where(col("y_true") === 1).count() == 1)
  }
}
