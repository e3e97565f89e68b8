package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.WindowModel
import graft.ops.{MetricsOps, PermImportance}

/** Permutation feature importance with weighted log-loss — the host
  * importance pipeline (pipelines_host/pipeline_host_importance.py:226-407)
  * feeding TOP-K feature selection (W3,
  * pipeline_trainingmodels_host.py:57-97).
  *
  * For each feature j and repeat r: globally permute X[:,:,j] across all
  * windows/timesteps (seed = base + 1000·j + r), re-score, report the
  * increase in weighted log-loss vs baseline. Cost is one shuffle per
  * (feature × repeat) — the reference's own algorithmic cost (SURVEY §2.9
  * R5); features can be batched by the caller when F is large.
  */
object HostImportance {

  /** @param windows (win_id long unique, window, y, weight) — weight from
    *                G5 class weights joined per row (J5)
    * @return (feature_idx, mean_drop, std_drop) sorted by mean_drop desc */
  def permutationImportance(windows: DataFrame, model: WindowModel,
      nFeatures: Int, nRepeats: Int = 3, baseSeed: Long = 42L,
      eps: Double = 1e-12): DataFrame = {
    val spark = windows.sparkSession
    import spark.implicits._
    // cache the input for the loop's lifetime: baseline + F×R loss jobs
    // all re-read it; results reduce to driver doubles → scoped unpersist
    windows.cache()

    def loss(df: DataFrame): Double = {
      val scored = model.transform(df)
      val pTrue = element_at(col("proba"), col("y") + 1)
      MetricsOps.weightedLogLoss(scored, pTrue, col("weight"), eps)
        .head().getDouble(0)
    }

    val baseline = loss(windows)
    val rows = for {
      j <- 0 until nFeatures
      r <- 0 until nRepeats
    } yield {
      val permuted = PermImportance.permuteFeature(
        windows, "win_id", "window", j, baseSeed + 1000L * j + r)
      (j, r, loss(permuted) - baseline)
    }
    windows.unpersist(blocking = false)
    rows.toDF("feature_idx", "rep", "drop")
      .groupBy("feature_idx")
      .agg(avg("drop").as("mean_drop"),
        coalesce(stddev_samp(col("drop")), lit(0.0)).as("std_drop"))
      .orderBy(col("mean_drop").desc, col("feature_idx").asc)
  }

  /** W3 — TOP-K selection from an importances table. */
  def topK(importances: DataFrame, k: Int): Seq[Int] =
    importances.orderBy(col("mean_drop").desc, col("feature_idx").asc)
      .limit(k).select("feature_idx").collect().map(_.getInt(0)).toSeq
}
