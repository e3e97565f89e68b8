package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G14/G15 — ROC / PR curves, AUC, average precision, threshold selection
  * (SURVEY §2.5), replacing the reference's sklearn calls
  * (`roc_curve` / `precision_recall_curve` / `roc_auc_score` /
  * `average_precision_score`, func_aux/func_test.py:257,306,339,430-448).
  *
  * Distributed shape: first `groupBy(score)` — the only pass over the full
  * data, shrinking N rows to D = #distinct scores — then cumulative sums
  * over the D-row curve with a global-order window. D is bounded by score
  * resolution (model probabilities), so the single-partition cumsum runs on
  * a small aggregate, not the data; at 100 TB the heavy lifting is the
  * map-side-combined groupBy.
  *
  * Curve convention: one point per distinct threshold, thresholds strictly
  * descending, cumulative tps/fps INCLUSIVE of the threshold (score >= thr
  * predicted positive — sklearn's convention), with the (fpr=0, tpr=0,
  * thr=+inf) virtual start point. [[rocCurve]] emits the FULL point set
  * (what `roc_auc_score` integrates); [[dropIntermediate]] reproduces
  * sklearn `roc_curve`'s default point thinning for the selection paths
  * that consume `roc_curve` output (G15 threshold-at-FPR).
  */
object Curves {

  /** ROC curve table: (threshold, fps, tps, fpr, tpr), thresholds descending.
    * `label` must be 0/1 ints; `score` the attack-class score. */
  def rocCurve(df: DataFrame, label: Column, score: Column): DataFrame = {
    val byScore = df
      .select(score.cast("double").as("threshold"), label.cast("int").as("y"))
      .groupBy("threshold")
      .agg(sum(col("y")).as("pos"), sum(lit(1) - col("y")).as("neg"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = Window.partitionBy()
    byScore
      .withColumn("tps", sum("pos").over(w))
      .withColumn("fps", sum("neg").over(w))
      .withColumn("fpr", col("fps") / max("fps").over(totals))
      .withColumn("tpr", col("tps") / max("tps").over(totals))
      .select("threshold", "fps", "tps", "fpr", "tpr")
  }

  /** ROC-AUC by trapezoid over the full (unthinned) curve — equals
    * sklearn `roc_auc_score` exactly (ties handled by the per-threshold
    * grouping). Returns a 1-row DataFrame (roc_auc). */
  def rocAuc(df: DataFrame, label: Column, score: Column): DataFrame = {
    val curve = rocCurve(df, label, score)
    val w = Window.orderBy(col("threshold").desc)
    curve
      .withColumn("fpr_prev", coalesce(lag("fpr", 1).over(w), lit(0.0)))
      .withColumn("tpr_prev", coalesce(lag("tpr", 1).over(w), lit(0.0)))
      .agg(sum((col("fpr") - col("fpr_prev")) * (col("tpr") + col("tpr_prev")) / 2)
        .as("roc_auc"))
  }

  /** PR curve table: (threshold, precision, recall), thresholds descending
    * (recall increasing). sklearn's final (P=1, R=0) anchor point is implied
    * by the AP sum below and omitted from the table. */
  def prCurve(df: DataFrame, label: Column, score: Column): DataFrame = {
    val roc = rocCurve(df, label, score)
    roc.select(
      col("threshold"),
      (col("tps") / (col("tps") + col("fps"))).as("precision"),
      col("tpr").as("recall"))
  }

  /** Average precision — sklearn `average_precision_score`:
    * AP = Σ_i (R_i − R_{i−1}) · P_i over thresholds descending (R_0 = 0). */
  def averagePrecision(df: DataFrame, label: Column, score: Column): DataFrame = {
    val pr = prCurve(df, label, score)
    val w = Window.orderBy(col("threshold").desc)
    pr.withColumn("recall_prev", coalesce(lag("recall", 1).over(w), lit(0.0)))
      .agg(sum((col("recall") - col("recall_prev")) * col("precision")).as("average_precision"))
  }

  /** sklearn `roc_curve(drop_intermediate=True)` point thinning: keep a
    * curve point iff it is an endpoint or either cumulative series bends
    * there (second difference of fps or tps nonzero) — collinear interior
    * points add nothing to the polyline. One window pass over the D-row
    * curve (D = #distinct scores), no pass over the data.
    * Ref consumer: select_threshold_at_fpr, func_aux/func_test.py:257. */
  def dropIntermediate(curve: DataFrame): DataFrame = {
    val w = Window.orderBy(col("threshold").desc)
    curve
      .withColumn("__dfp", col("fps") - lag("fps", 1).over(w))
      .withColumn("__dfn", lead("fps", 1).over(w) - col("fps"))
      .withColumn("__dtp", col("tps") - lag("tps", 1).over(w))
      .withColumn("__dtn", lead("tps", 1).over(w) - col("tps"))
      .where(col("__dfp").isNull || col("__dfn").isNull ||
        col("__dfp") =!= col("__dfn") || col("__dtp") =!= col("__dtn"))
      .drop("__dfp", "__dfn", "__dtp", "__dtn")
  }

  /** G15 — threshold at target FPR. Ref: select_threshold_at_fpr,
    * func_aux/func_test.py:252-269: take the LAST curve point with
    * fpr <= target. sklearn's `roc_curve` always emits a virtual
    * (fpr=0, tpr=0, thr=+inf) start point, so that set is never empty in
    * the reference (its |fpr−target| fallback is unreachable); our
    * [[rocCurve]] omits the anchor from the table, so when no REAL point
    * satisfies the target we return the anchor itself — threshold=+inf,
    * i.e. "predict nothing", which honors the FPR budget exactly as the
    * reference would. Pass the curve through [[dropIntermediate]] first for
    * sklearn parity (the reference selects on roc_curve's thinned points).
    * Returns 1 row (threshold, fpr, tpr). */
  def thresholdAtFpr(curve: DataFrame, fprTarget: Double): DataFrame = {
    // "last index with fpr <= target" on a curve ordered by descending
    // threshold == max fpr among candidates, ties broken by the latest
    // (lowest-threshold) point, matching np.where(...)[−1]. Real points
    // always beat the virtual anchor (they have lower thresholds).
    val candidates = curve.where(col("fpr") <= fprTarget)
      .orderBy(col("fpr").desc, col("threshold").asc).limit(1)
      .select(col("threshold"), col("fpr"), col("tpr"))
    // driver-side collect is bounded by the limit(1) above — at most ONE
    // row crosses, regardless of curve size (same loud-guard convention
    // as the PQ maxQueries / all-pairs maxDomain caps)
    val picked = candidates.collect()
    val rows =
      if (picked.nonEmpty) picked
      else Array(org.apache.spark.sql.Row(Double.PositiveInfinity, 0.0, 0.0))
    curve.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), candidates.schema)
  }

  /** Macro one-vs-rest ROC-AUC over a probability array column —
    * `roc_auc_score(y_onehot, proba, average="macro")`
    * (func_aux/func_test.py:92-97): mean over classes of the binary AUC of
    * class-k indicator vs proba[k]. ONE pass over the data via the shared
    * [[ovrCurve]] (posexplode → per-class cumulative curve), trapezoid per
    * class, then the unweighted class mean — k never multiplies the data
    * scans. `nClasses` kept for signature stability (the explode derives
    * classes from the array itself). */
  def rocAucMacro(df: DataFrame, yTrue: Column, proba: Column, nClasses: Int): DataFrame = {
    val w = Window.partitionBy("cls").orderBy(col("threshold").desc)
    val tot = Window.partitionBy("cls")
    ovrCurve(df, yTrue, proba)
      .withColumn("fpr", col("fps") / max("fps").over(tot))
      .withColumn("fpr_prev", coalesce(lag("fpr", 1).over(w), lit(0.0)))
      .withColumn("tpr_prev", coalesce(lag("recall", 1).over(w), lit(0.0)))
      .groupBy("cls")
      .agg(sum((col("fpr") - col("fpr_prev")) * (col("recall") + col("tpr_prev")) / 2)
        .as("auc"))
      .agg(avg("auc").as("roc_auc_macro"))
  }

  /** One-vs-rest per-class cumulative curve over a proba array in ONE pass
    * over the data: posexplode the k probabilities to (class, score,
    * indicator) pairs, groupBy (class, threshold), then cumulative windows
    * PARTITIONED BY class — the window input is the D·k curve table, never
    * the data, and the per-class partitions parallelize. */
  private def ovrCurve(df: DataFrame, yTrue: Column, proba: Column): DataFrame = {
    val pairs = df.select(yTrue.as("yt"), posexplode(proba))
      .select(col("pos").as("cls"), col("col").cast("double").as("threshold"),
        (col("yt") === col("pos")).cast("int").as("y"))
    val byScore = pairs.groupBy("cls", "threshold")
      .agg(sum(col("y")).as("pos_n"), sum(lit(1) - col("y")).as("neg_n"))
    val w = Window.partitionBy("cls").orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("cls")
    byScore
      .withColumn("tps", sum("pos_n").over(w))
      .withColumn("fps", sum("neg_n").over(w))
      .withColumn("recall", col("tps") / max("tps").over(tot))
  }

  /** `average_precision_score(y_onehot, proba, average="macro")`
    * (func_aux/func_test.py:84-88): per-class AP over the one-vs-rest
    * curves, then the unweighted class mean. Returns 1 row (pr_auc_macro). */
  def prAucMacro(df: DataFrame, yTrue: Column, proba: Column): DataFrame = {
    val w = Window.partitionBy("cls").orderBy(col("threshold").desc)
    ovrCurve(df, yTrue, proba)
      .withColumn("precision", col("tps") / (col("tps") + col("fps")))
      .withColumn("recall_prev", coalesce(lag("recall", 1).over(w), lit(0.0)))
      .groupBy("cls")
      .agg(sum((col("recall") - col("recall_prev")) * col("precision")).as("ap"))
      .agg(avg("ap").as("pr_auc_macro"))
  }

  /** `average_precision_score(y_onehot, proba, average="micro")`
    * (func_aux/func_test.py:80-83): ALL (row, class) pairs ranked as one
    * binary problem. Returns 1 row (pr_auc_micro). */
  def prAucMicro(df: DataFrame, yTrue: Column, proba: Column): DataFrame = {
    val pairs = df.select(yTrue.as("yt"), posexplode(proba))
      .select(col("col").cast("double").as("score"),
        (col("yt") === col("pos")).cast("int").as("y"))
    averagePrecision(pairs, col("y"), col("score"))
      .select(col("average_precision").as("pr_auc_micro"))
  }

  /** All three probability-ranked G13 fields from ONE corpus pass (r12):
    * the separate [[prAucMicro]] + [[prAucMacro]] + [[rocAucMacro]]
    * crossJoin paid three posexplode scans over the data for curves that
    * all derive from the same (class, threshold, pos, neg) cell table.
    * Here that table is built once (one map-side-combined groupBy over
    * the exploded pairs) and lazily checkpointed — bounded by
    * k·|distinct scores|, never the data — and the macro windows and the
    * micro re-collapse (Σ over classes per threshold, an exact integer
    * regroup of the same cells) both read it. Per-field arithmetic is
    * expression-identical to the singleton ops. Returns one row
    * (pr_auc_micro, pr_auc_macro, roc_auc_macro). */
  def multiclassAucSuite(df: DataFrame, yTrue: Column, proba: Column): DataFrame = {
    val pairs = df.select(yTrue.as("yt"), posexplode(proba))
      .select(col("pos").as("cls"), col("col").cast("double").as("threshold"),
        (col("yt") === col("pos")).cast("int").as("y"))
    val cells = pairs.groupBy("cls", "threshold")
      .agg(sum(col("y")).as("pos_n"), sum(lit(1) - col("y")).as("neg_n"))
      .localCheckpoint(false) // macro + micro both read it; built once

    val w = Window.partitionBy("cls").orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy("cls")
    val lagW = Window.partitionBy("cls").orderBy(col("threshold").desc)
    val macroDf = cells
      .withColumn("tps", sum("pos_n").over(w))
      .withColumn("fps", sum("neg_n").over(w))
      .withColumn("recall", col("tps") / max("tps").over(tot))
      .withColumn("fpr", col("fps") / max("fps").over(tot))
      .withColumn("precision", col("tps") / (col("tps") + col("fps")))
      .withColumn("recall_prev", coalesce(lag("recall", 1).over(lagW), lit(0.0)))
      .withColumn("fpr_prev", coalesce(lag("fpr", 1).over(lagW), lit(0.0)))
      .groupBy("cls")
      .agg(sum((col("recall") - col("recall_prev")) * col("precision")).as("ap"),
        sum((col("fpr") - col("fpr_prev")) * (col("recall") + col("recall_prev")) / 2).as("auc"))
      .agg(avg("ap").as("pr_auc_macro"), avg("auc").as("roc_auc_macro"))

    // micro: regroup the SAME cells by threshold (exact integer sums ==
    // grouping the raw pairs by score), then rocCurve/averagePrecision's
    // window arithmetic verbatim
    val mw = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val mtot = Window.partitionBy()
    val mlag = Window.orderBy(col("threshold").desc)
    val micro = cells.groupBy("threshold")
      .agg(sum("pos_n").as("pos"), sum("neg_n").as("neg"))
      .withColumn("tps", sum("pos").over(mw))
      .withColumn("fps", sum("neg").over(mw))
      .withColumn("recall", col("tps") / max("tps").over(mtot))
      .withColumn("precision", col("tps") / (col("tps") + col("fps")))
      .withColumn("recall_prev", coalesce(lag("recall", 1).over(mlag), lit(0.0)))
      .agg(sum((col("recall") - col("recall_prev")) * col("precision"))
        .as("pr_auc_micro"))

    micro.crossJoin(macroDf)
  }

  /** The probability-ranked G13 fields PER GROUP (F10 slices call the full
    * metric dict per state, pipeline_trainingmodels_power.py:235-311):
    * one row per `groupCol` value with `pr_auc_micro` / `pr_auc_macro` /
    * `roc_auc_macro`. Same shape as the global forms with the group key
    * prepended to every aggregation and window partition — thousands of
    * slices cost the same two passes over the exploded pairs, never a
    * driver loop. */
  def multiclassAucPerGroup(df: DataFrame, groupCol: String,
      yTrue: Column, proba: Column): DataFrame = {
    val pairs = df.select(col(groupCol).as("grp"), yTrue.as("yt"), posexplode(proba))
      .select(col("grp"), col("pos").as("cls"),
        col("col").cast("double").as("threshold"),
        (col("yt") === col("pos")).cast("int").as("y"))
    // ONE corpus-sized collapse feeds both legs (r12; micro and macro
    // each re-exploded the corpus before): the per-(grp, cls, threshold)
    // cells are checkpointed, and the micro leg's per-(grp, threshold)
    // totals are an exact integer regroup of them
    val cells = pairs.groupBy("grp", "cls", "threshold")
      .agg(sum(col("y")).as("pos_n"), sum(lit(1) - col("y")).as("neg_n"))
      .localCheckpoint(false)

    // micro: all of a group's (row, class) pairs as one binary problem
    val mw = Window.partitionBy("grp").orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val mtot = Window.partitionBy("grp")
    val mlag = Window.partitionBy("grp").orderBy(col("threshold").desc)
    val micro = cells.groupBy("grp", "threshold")
      .agg(sum("pos_n").as("pos_n"), sum("neg_n").as("neg_n"))
      .withColumn("tps", sum("pos_n").over(mw))
      .withColumn("fps", sum("neg_n").over(mw))
      .withColumn("recall", col("tps") / max("tps").over(mtot))
      .withColumn("precision", col("tps") / (col("tps") + col("fps")))
      .withColumn("recall_prev", coalesce(lag("recall", 1).over(mlag), lit(0.0)))
      .groupBy("grp")
      .agg(sum((col("recall") - col("recall_prev")) * col("precision")).as("pr_auc_micro"))

    // macro: per-(group, class) curves, AP + trapezoid AUC, class means
    val cw = Window.partitionBy("grp", "cls").orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ctot = Window.partitionBy("grp", "cls")
    val clag = Window.partitionBy("grp", "cls").orderBy(col("threshold").desc)
    val macroDf = cells
      .withColumn("tps", sum("pos_n").over(cw))
      .withColumn("fps", sum("neg_n").over(cw))
      .withColumn("recall", col("tps") / max("tps").over(ctot))
      .withColumn("fpr", col("fps") / max("fps").over(ctot))
      .withColumn("precision", col("tps") / (col("tps") + col("fps")))
      .withColumn("recall_prev", coalesce(lag("recall", 1).over(clag), lit(0.0)))
      .withColumn("fpr_prev", coalesce(lag("fpr", 1).over(clag), lit(0.0)))
      .groupBy("grp", "cls")
      .agg(sum((col("recall") - col("recall_prev")) * col("precision")).as("ap"),
        sum((col("fpr") - col("fpr_prev")) * (col("recall") + col("recall_prev")) / 2).as("auc"))
      .groupBy("grp")
      .agg(avg("ap").as("pr_auc_macro"), avg("auc").as("roc_auc_macro"))

    // both legs share the cells lineage: re-alias the macro key so the
    // join condition is explicit
    val macroR = macroDf.select(col("grp").as("__gmk"),
      col("pr_auc_macro"), col("roc_auc_macro"))
    micro.join(macroR, col("grp") === col("__gmk")).drop("__gmk")
  }

  /** DeLong variance + confidence interval for the ROC AUC (DeLong,
    * DeLong & Clarke-Pearson 1988 — the standard nonparametric AUC CI;
    * what `pROC`/`scikit-posthocs` compute):
    *
    *   V10_i = (#neg below s_i + ½·#neg tied) / n   (per positive i)
    *   V01_j = (#pos above s_j + ½·#pos tied) / m   (per negative j)
    *   AUC = mean(V10) = mean(V01),
    *   Var = S10/m + S01/n   (S = ddof-1 sample variances),
    *   CI  = AUC ± z·√Var.
    *
    * Scale shape — the g14 curve discipline: rows collapse to the
    * DISTINCT-score table first (one map-side-combined groupBy; equal
    * scores share their V values exactly, so grouping is lossless);
    * the cumulative below/above counts are windows over that SMALL
    * table, and the weighted moments fold in ONE aggregation. Returns
    * one row (auc, var_auc, ci_lo, ci_hi), CI clipped to [0, 1]. */
  def aucDeLong(df: DataFrame, y: Column, score: Column,
      z: Double = 1.959963984540054): DataFrame = {
    // null scores/labels out BEFORE the collapse: Spark windows order
    // nulls first, so a null-score group would silently count as the
    // lowest score (and DuckDB orders nulls last — the spearman
    // divergence shape)
    val byScore = df
      .where(y.isNotNull && score.isNotNull)
      .select(y.cast("int").as("y"), score.cast("double").as("s"))
      .groupBy("s")
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") =!= 1, 1L).otherwise(0L)).as("nn"))
    val asc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val desc = Window.orderBy(col("s").desc).rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy()
    val v = byScore
      .withColumn("negBelow", coalesce(sum("nn").over(asc), lit(0L)))
      .withColumn("posAbove", coalesce(sum("np").over(desc), lit(0L)))
      .withColumn("m", sum("np").over(tot))
      .withColumn("n", sum("nn").over(tot))
      .withColumn("v10",
        (col("negBelow") + col("nn") * 0.5) / col("n"))
      .withColumn("v01",
        (col("posAbove") + col("np") * 0.5) / col("m"))
    v.agg(
        (sum(col("np") * col("v10")) / first("m")).as("auc"),
        first("m").as("m"), first("n").as("n"),
        sum(col("np") * col("v10") * col("v10")).as("ss10"),
        sum(col("nn") * col("v01") * col("v01")).as("ss01"))
      .select(col("auc"),
        // ddof-1 sample variances of V10 (weighted by np) and V01:
        // S = (Σ w v² − m·auc²) / (m − 1); Var(AUC) = S10/m + S01/n
        (((col("ss10") - col("m") * col("auc") * col("auc")) / (col("m") - 1)) / col("m") +
          ((col("ss01") - col("n") * col("auc") * col("auc")) / (col("n") - 1)) / col("n"))
          .as("var_auc"))
      .select(col("auc"), col("var_auc"),
        greatest(lit(0.0), col("auc") - lit(z) * sqrt(col("var_auc"))).as("ci_lo"),
        least(lit(1.0), col("auc") + lit(z) * sqrt(col("var_auc"))).as("ci_hi"))
  }

  /** Lift / cumulative-gains table (the direct-marketing model readout —
    * Berry & Linoff 2004): score-quantile buckets (fitted bounds, so
    * ties share a bucket and no raw-row window is needed), per bucket
    * the response rate, lift vs the base rate, and walking from the
    * BEST bucket down the cumulative population and response shares
    * (the gains curve). One bin aggregation; windows over the bounded
    * bucket table. */
  def liftCurve(df: DataFrame, label: Column, score: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000, "buckets in [2, 1000]")
    import graft.ops.Stats
    val bounds = Stats.fitQuantileBins(df, score, buckets)
    val y = label.cast("double")
    // null scores out: applyQuantileBins would fold them into bucket 0
    // (every `null > bound` is 0) while the fit ignored them
    val byB = df.where(y.isNotNull && score.isNotNull)
      .groupBy(Stats.applyQuantileBins(score, bounds).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(y).as("__resp"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wDesc = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byB
      .withColumn("__N", sum("n").over(wAll))
      .withColumn("__R", sum("__resp").over(wAll))
      .withColumn("rate", col("__resp") / col("n"))
      .withColumn("lift", when(col("__R") > 0,
        col("rate") / (col("__R") / col("__N"))))
      .withColumn("cum_pop_share", sum("n").over(wDesc) / col("__N"))
      .withColumn("cum_gain", when(col("__R") > 0,
        sum("__resp").over(wDesc) / col("__R")))
      .select(col("bucket"), col("n"),
        col("__resp").cast("long").as("n_resp"), col("rate"), col("lift"),
        col("cum_pop_share"), col("cum_gain"))
      .orderBy(col("bucket").desc)
  }
}
