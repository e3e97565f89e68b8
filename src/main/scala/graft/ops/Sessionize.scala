package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** G12 — time-to-detect episode statistics (sessionization).
  *
  * Ref: `compute_ttd_stats`, func_aux/func_test.py:196-249 — scan the
  * window-ordered (y_true, y_pred, episode_id) sequence; an EPISODE is a
  * maximal run of consecutive y_true==1 rows with a constant episode id; an
  * episode is DETECTED if any y_pred==1 occurs inside it, with delay =
  * (first-detection-position − start-position) · hop_seconds.
  *
  * Spark-first: gaps-and-islands — previous-row flags via a position
  * self-join on the parallel global index, island numbering via the
  * distributed prefix sum ([[SlidingWindows.withRunningTotal]]), one
  * `groupBy(episode)`. NO single-partition lag/cumsum window — every
  * stage is fully parallel (the scored-event stream can be huge).
  */
object Sessionize {

  /** Per-episode table: (episode, start_idx, det_idx|null, delay_windows|null). */
  def episodes(df: DataFrame, order: Column, yTrue: Column, yPred: Column,
      episodeId: Column): DataFrame = {
    val base = df.select(order.as("idx"), yTrue.cast("int").as("yt"),
      yPred.cast("int").as("yp"), episodeId.cast("string").as("ep"))
    val indexed = SlidingWindows.withGlobalIndex(base, Seq(col("idx")), "i")
    val prev = indexed.select((col("i") + 1).as("i"),
      col("yt").as("prev_yt"), col("ep").as("prev_ep"))
    val flagged = indexed.join(prev, Seq("i"), "left")
      // episode start: y flips to 1, or the id changes inside a run of 1s
      .withColumn("is_start",
        (col("yt") === 1 &&
          (col("prev_yt").isNull || col("prev_yt") =!= 1 || col("prev_ep") =!= col("ep")))
          .cast("int"))
    val attacks = SlidingWindows
      .withRunningTotal(flagged, Seq(col("i")), col("is_start"), "episode")
      .where(col("yt") === 1)
    attacks.groupBy("episode")
      .agg(
        first("ep").as("episode_id"),
        min("idx").as("start_idx"),
        min(when(col("yp") === 1, col("idx"))).as("det_idx"))
      .withColumn("delay_windows", col("det_idx") - col("start_idx"))
  }

  /** TTD summary row: episodes_total, episodes_detected, avg_ttd_seconds. */
  def ttdStats(df: DataFrame, order: Column, yTrue: Column, yPred: Column,
      episodeId: Column, hopSeconds: Double): DataFrame =
    episodes(df, order, yTrue, yPred, episodeId)
      .agg(
        count(lit(1)).as("episodes_total"),
        count(col("det_idx")).as("episodes_detected"),
        avg(col("delay_windows") * hopSeconds).as("avg_ttd_seconds"))
}
