package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` facade over the engine's signature row shapes —
  * compile-time field access for the narrow cores where type safety
  * helps (window tensors, episodes, scored rows), per the blueprint's
  * data-model note (SURVEY §1.1: `Dataset[T]` for narrow typed cores,
  * `DataFrame` for the wide, column-name-driven pipelines).
  *
  * Conversions are zero-copy plan-level `as[T]` casts — the typed view
  * shares the DataFrame's physical plan, so mixing the two styles costs
  * nothing; `Encoders.product` keeps everything whole-stage-codegen'd
  * (no Kryo fallback).
  */
object Typed {

  /** One sliding window (W1/W2 output): the `seqLen × F` tensor slice
    * plus its last-row label. */
  final case class WindowRow(win_id: Long, window: Seq[Seq[Double]], y: Int)

  /** One G12 episode: global episode number, source episode id, start
    * position, first-detection position (None = missed) and the
    * detection delay in windows. */
  final case class EpisodeRow(episode: Long, episode_id: String,
      start_idx: Long, det_idx: Option[Long], delay_windows: Option[Long])

  /** One scored example (the metric suite's input shape). */
  final case class ScoredRow(y_true: Int, score: Double)

  implicit val windowEnc: Encoder[WindowRow] = Encoders.product[WindowRow]
  implicit val episodeEnc: Encoder[EpisodeRow] = Encoders.product[EpisodeRow]
  implicit val scoredEnc: Encoder[ScoredRow] = Encoders.product[ScoredRow]

  /** Typed view of a windower/pipeline output carrying (win_id, window, y). */
  def windows(df: DataFrame): Dataset[WindowRow] =
    df.select(col("win_id").cast("long"),
      col("window").cast("array<array<double>>"), col("y").cast("int"))
      .as[WindowRow]

  /** Typed view of [[graft.ops.Sessionize.episodes]] output (idx columns
    * cast to long — the op preserves the caller's order-column type). */
  def episodes(df: DataFrame): Dataset[EpisodeRow] =
    df.select(col("episode").cast("long"), col("episode_id").cast("string"),
      col("start_idx").cast("long"), col("det_idx").cast("long"),
      col("delay_windows").cast("long"))
      .as[EpisodeRow]

  /** Typed view of any (y_true, score) scored table. */
  def scored(df: DataFrame): Dataset[ScoredRow] =
    df.select(col("y_true").cast("int"), col("score").cast("double"))
      .as[ScoredRow]

  /** Example typed aggregate: detection rate + mean delay over episodes —
    * written against case-class fields, not column strings. */
  def detectionSummary(ds: Dataset[EpisodeRow]): (Double, Option[Double]) = {
    // fold (not reduce): an empty episodes Dataset yields the zero
    // summary instead of UnsupportedOperationException.
    val (total, detected, delaySum, delayN) = ds
      .map(e => (1L, if (e.det_idx.isDefined) 1L else 0L,
        e.delay_windows.getOrElse(0L), if (e.delay_windows.isDefined) 1L else 0L))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong))
      .rdd.fold((0L, 0L, 0L, 0L))((a, b) =>
        (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    (if (total == 0) 0.0 else detected.toDouble / total,
      if (delayN > 0) Some(delaySum.toDouble / delayN) else None)
  }
}
