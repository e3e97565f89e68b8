package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1 — per-group chronological 70/15/15 split (SURVEY §2.5 G1).
  *
  * Reference: `split_df_per_attack_and_state_chronologically`
  * (func_aux/func_preproc.py:154-203): for each (Attack, State) group, sort
  * by time; the first floor(0.7·n) rows → train, the next floor(0.15·n) →
  * val, the remainder → test; with a guard that if train+val would swallow
  * the whole group, the last row is forced into test (func_preproc.py:175-177).
  *
  * Spark-first design: the reference loops over groups on the driver; here
  * the whole split is ONE window computation — `row_number` and `count`
  * over `partitionBy(groupCols).orderBy(orderCols)` — i.e. a single shuffle
  * on the group keys, no driver iteration, scaling to any number of groups
  * and rows. Per-group data never has to fit in memory beyond one window
  * partition, and with thousands of (Attack, State) groups at 100 TB the
  * shuffle is well balanced; a single monster group would be the only skew
  * risk (AQE skew handling applies).
  */
object ChronoSplit {

  /** Add a `split ∈ {train,val,test}` column.
    *
    * @param orderCols must make the intra-group order total (ties break
    *                  nondeterministically otherwise — pass a unique id last).
    */
  def withSplit(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15,
      out: String = "split"): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(orderCols: _*)
    df.withColumn(out,
      splitFromRank(row_number().over(w), count(lit(1)).over(part),
        trainFrac, valFrac))
  }

  /** The reference's rank→role arithmetic, shared by both physical forms.
    * Integer-truncation fractions, exactly as the reference:
    * n_train = int(n*0.7); n_val = int(n*0.15)  (func_preproc.py:168-171);
    * guard (func_preproc.py:174-177): if n_train + n_val >= n then
    * n_train = max(1, n_train); n_val = max(0, min(n - n_train - 1, n_val)). */
  private def splitFromRank(rn: Column, n: Column, trainFrac: Double,
      valFrac: Double): Column = {
    val nTrain0 = floor(n * trainFrac)
    val nVal0 = floor(n * valFrac)
    val guard = nTrain0 + nVal0 >= n
    val nTrain = when(guard, greatest(lit(1L), nTrain0)).otherwise(nTrain0)
    val nVal = when(guard, greatest(lit(0L), least(n - nTrain - 1, nVal0))).otherwise(nVal0)
    when(rn <= nTrain, "train")
      .when(rn <= nTrain + nVal, "val")
      .otherwise("test")
  }

  /** Skew-immune physical form of [[withSplit]] — the salted two-phase
    * row_number for the monster-group shape (one (Attack, State) pair
    * holding 90% of the corpus). A `partitionBy(group)` window funnels
    * every row of a group through ONE task; AQE's skew handling splits
    * joins, not windows, so at 100 TB a dominant group serializes the
    * whole split. Here the group is range-salted on the order key first:
    *
    *  1. per-group approximate `ts`-quantiles (ONE mergeable aggregation,
    *     #groups×(buckets−1) values, broadcast back) define `buckets`
    *     time ranges — the "salt" that respects chronology;
    *  2. exact per-(group, bucket) counts (ONE tiny map-combined agg)
    *     give each bucket its rank offset via a prefix sum over the
    *     bucket index — a window over #groups×buckets rows, not corpus
    *     rows — plus the exact group total `n`;
    *  3. `row_number` within (group, bucket) ordered by (`ts`, tieCols),
    *     shifted by the bucket offset, reproduces the EXACT global rank:
    *     the bucket map is monotone in `ts` and equal-`ts` rows always
    *     land in the same bucket, so sketch wobble in the boundary
    *     VALUES cannot reorder ranks — only rebalance task sizes.
    *
    * Same output as [[withSplit]] row-for-row (parity is spec-pinned);
    * the window shuffle now carries ≈ |group|/buckets rows per task.
    * `ts` must be numeric (cast timestamps to epoch micros first) and
    * (`ts`, tieCols) must be a total order within each group. Null
    * `ts` rows agree with the window form by construction: the
    * quantile fit ignores them, `t > bound` is null so they fall to
    * bucket 0, and asc-nulls-first in-bucket ordering gives them the
    * lowest ranks — the same place `orderBy(ts.asc)` puts them
    * (spec-pinned alongside the tie cases). */
  def withSplitSalted(
      df: DataFrame,
      groupCols: Seq[String],
      ts: Column,
      tieCols: Seq[Column],
      buckets: Int = 32,
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15,
      out: String = "split"): DataFrame = {
    require(buckets >= 2, s"withSplitSalted: buckets $buckets < 2")
    // the salted path buckets/ranks on the DOUBLE face of ts; beyond
    // 2^53 distinct longs collapse to equal doubles and the salted
    // ranks silently diverge from withSplit's long ordering (epoch
    // NANOS is already 1.7e18) — raise instead of mis-splitting
    val t = when(ts.isNull
        || abs(ts.cast("double")) < lit(9.007199254740992e15),
      ts.cast("double"))
      .otherwise(raise_error(concat(
        lit("withSplitSalted: |ts| >= 2^53 ("), ts.cast("string"),
        lit(") — rank parity with the window form would break; " +
          "coarsen the clock (epoch micros/millis) first"))))
    val g = groupCols.map(col)
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    // The approx-quantile subtree is NON-DETERMINISTIC across
    // evaluations (QuantileSummaries merge order follows shuffle-fetch
    // order), and it feeds BOTH the counts pass and the rank pass —
    // broadcast-exchange reuse usually unifies them, but correctness
    // must not hang on a plan-canonicalization accident. Collect the
    // per-group bounds ONCE (#groups rows) and re-inject as a local
    // frame: both branches then read the identical boundary values, and
    // the wobble in WHERE a boundary lands stays harmless (the bucket
    // map only has to be monotone and consistent).
    val boundsPlan = df.groupBy(g: _*)
      .agg(percentile_approx(t, probs, lit(10000)).as("__bounds"))
    val bounds = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(boundsPlan.collect(): _*), boundsPlan.schema)
    val bkt = aggregate(col("__bounds"), lit(0),
      (acc, bnd) => acc + when(t > bnd, 1).otherwise(0))
    // coalesce: a group whose ts values are ALL null fits a null
    // __bounds array, so the fold yields null — without the sentinel
    // the equi-joins on (group, __bkt) would silently DROP that whole
    // group, where the window form assigns it (nulls-first) ranks
    val withB = df.join(broadcast(bounds), groupCols)
      .withColumn("__bkt", coalesce(bkt, lit(0)))
    val counts = withB.groupBy((g :+ col("__bkt")): _*)
      .agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(g: _*)
    val offsets = counts
      .withColumn("__off", coalesce(sum("__c").over(
        wg.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__c").over(wg))
      .drop("__c")
    val wb = Window.partitionBy((groupCols :+ "__bkt").map(col): _*)
      .orderBy(t +: tieCols: _*)
    val rn = row_number().over(wb) + col("__off")
    withB.join(broadcast(offsets), groupCols :+ "__bkt")
      .withColumn(out, splitFromRank(rn, col("__n"), trainFrac, valFrac))
      .drop("__bounds", "__bkt", "__off", "__n")
  }

  /** Purged K-fold time split with embargo (López de Prado 2018,
    * "Advances in Financial Machine Learning" ch. 7 — the leakage-safe
    * CV for temporally-correlated data): rows fall into `nFolds`
    * contiguous time folds; for the chosen `evalFold`, training rows in
    * the `embargo` time units immediately AFTER the eval fold are
    * dropped to the `embargoed` role (their features/labels overlap the
    * eval horizon — the leak [[withSplit]]'s plain chronology can't
    * see). Roles: `eval` / `embargoed` / `train`.
    *
    * Scale shape: fold boundaries are the (nFolds−1) ts-quantiles from
    * ONE aggregation ([[Stats.fitQuantileBins]] — `sketchK > 0` swaps in
    * the mergeable KLL sketch, the 100 TB path); fold and role are then
    * pure branch-free projections against the rounded literal bounds.
    * No window over raw rows, no join, nothing global — unlike the
    * rank-based ntile form, which would funnel every row through one
    * reducer. Bounds are 6-dp-rounded so assignment is ulp-robust and
    * engine-replayable. */
  def purgedTimeSplit(df: DataFrame, ts: Column, nFolds: Int,
      evalFold: Int, embargo: Double, out: String = "role",
      sketchK: Int = 0): DataFrame = {
    require(nFolds >= 2, s"purgedTimeSplit: nFolds $nFolds < 2")
    require(evalFold >= 0 && evalFold < nFolds,
      s"purgedTimeSplit: evalFold $evalFold outside [0, $nFolds)")
    require(embargo >= 0.0, "purgedTimeSplit: embargo must be >= 0")
    val t = ts.cast("double")
    val bounds = Stats.fitQuantileBins(df, t, nFolds, sketchK = sketchK)
    val fold = Stats.applyQuantileBins(t, bounds)
    // eval fold f covers (bounds(f-1), bounds(f)]; the embargo zone is
    // the `embargo` units after its upper edge (none after the last fold)
    val role =
      if (evalFold == nFolds - 1)
        when(fold === evalFold, "eval").otherwise("train")
      else {
        val hi = bounds(evalFold)
        when(fold === evalFold, "eval")
          .when(fold > evalFold && t <= lit(hi) + lit(embargo), "embargoed")
          .otherwise("train")
      }
    df.withColumn("fold", fold).withColumn(out, role)
  }
}
