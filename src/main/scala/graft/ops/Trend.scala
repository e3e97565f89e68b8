package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust trend and structural-change analysis over a REGULARIZED series
  * — the monitoring layer for ingest-rate / quality-score time series
  * (SURVEY §2.12 extension; [[Stats.cusum]] is the online cousin, these
  * are the offline verdicts).
  *
  * Every op here takes a (order, value) SERIES — one value per order
  * point — not raw rows: the caller aggregates first (e.g.
  * [[Stats.downsample]]'s time bins, one mean per hour). That contract
  * is what makes the pairwise ops scale: a 100 TB event stream collapses
  * to a bounded series (hours of a year ≈ 8.8k points) in ONE
  * map-side-combined aggregation, and everything pairwise operates on
  * the bounded series. The `maxPoints` guards fail LOUDLY when the
  * series isn't actually bounded (the [[Dedup]] small-domain
  * discipline) — the fix is coarser bins, never a bigger limit.
  */
object Trend {

  private def series(df: DataFrame, order: Column, value: Column,
      op: String, maxPoints: Int): DataFrame = {
    val s = df.select(order.cast("double").as("__x"),
        value.cast("double").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    // ONE guard aggregation (distinct-point count capped by the probe
    // limit + the worst per-point multiplicity) — the op's own passes
    // scan the series anyway, so the guard adds one bounded job
    val g = s.groupBy("__x").agg(count(lit(1)).as("__c"))
      .limit(maxPoints + 1)
      .agg(count(lit(1)).as("__nd"), max("__c").as("__mx")).head()
    require(g.getLong(0) <= maxPoints,
      s"$op: series has > $maxPoints distinct order points — aggregate " +
        "to coarser bins first (Stats.downsample); pairwise trend " +
        "statistics over an unbounded series do not scale")
    require(g.getLong(1) <= 1,
      s"$op: multiple values per order point — aggregate to ONE value " +
        "per point first (the series contract)")
    s
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975): S = Σ_{i<j}
    * sign(y_j − y_i) over the time-ordered series, tie-corrected
    * variance (n(n−1)(2n+5) − Σt(t−1)(2t+5))/18, and the
    * continuity-corrected z = (S∓1)/σ (0 when S = 0) — the standard
    * monotone-trend detector for environmental/ops series, immune to
    * outliers and distribution shape. Returns ONE row (n, s, var_s, z).
    *
    * Pairwise by construction — hence the bounded-series contract
    * (`maxPoints`, default 4096 ⇒ ≤ 8.4M pair rows of 3 scalars). */
  def mannKendall(df: DataFrame, order: Column, value: Column,
      maxPoints: Int = 4096): DataFrame = {
    val s = series(df, order, value, "mannKendall", maxPoints)
    val a = s.select(col("__x").as("__xi"), col("__y").as("__yi"))
    val b = s.select(col("__x").as("__xj"), col("__y").as("__yj"))
    val pairs = a.join(b, col("__xi") < col("__xj"))
      .select(signum(col("__yj") - col("__yi")).as("__sgn"))
    val ties = s.groupBy("__y").agg(count(lit(1)).as("__t"))
      .agg(sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))
        .as("__tcorr"), sum("__t").as("n"))
    pairs.agg(sum("__sgn").cast("double").as("s"))
      .crossJoin(broadcast(ties))
      .withColumn("var_s",
        (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("__tcorr"))
          .cast("double") / 18.0)
      .withColumn("z", when(col("var_s") <= 0, lit(0.0))
        .when(col("s") > 0, (col("s") - 1) / sqrt(col("var_s")))
        .when(col("s") < 0, (col("s") + 1) / sqrt(col("var_s")))
        .otherwise(lit(0.0)))
      .select(col("n"), col("s"), col("var_s"), col("z"))
  }

  /** Theil–Sen robust trend line (Theil 1950; Sen 1968): slope = median
    * of all pairwise slopes (y_j − y_i)/(x_j − x_i), intercept = median
    * of (y_i − slope·x_i). Medians are the interpolated
    * `percentile(…, 0.5)` = DuckDB's `quantile_cont` — identical order
    * statistic in both engines. Up to ~29% contaminated points leave
    * the fit unmoved — the robust alternative to
    * [[Experiment.olsPerGroup]] on spiky ops series. Returns ONE row
    * (n, slope, intercept). Bounded-series contract as [[mannKendall]]. */
  def theilSen(df: DataFrame, order: Column, value: Column,
      maxPoints: Int = 4096): DataFrame = {
    val s = series(df, order, value, "theilSen", maxPoints)
    val a = s.select(col("__x").as("__xi"), col("__y").as("__yi"))
    val b = s.select(col("__x").as("__xj"), col("__y").as("__yj"))
    val slope = a.join(b, col("__xi") < col("__xj"))
      .select(((col("__yj") - col("__yi")) / (col("__xj") - col("__xi")))
        .as("__m"))
      .agg(expr("percentile(__m, 0.5)").as("slope"),
        count(lit(1)).as("__npairs"))
    s.crossJoin(broadcast(slope))
      .select(col("__x"), col("__y"), col("slope"))
      .agg(count(lit(1)).as("n"), first("slope").as("slope"),
        expr("percentile(__y - slope * __x, 0.5)").as("intercept"))
      .select(col("n"), col("slope"), col("intercept"))
  }

  /** Single mean-shift changepoint by binary segmentation (the one-split
    * step of Scott & Knott 1974 / CUSUM-style AMOC): for every split
    * after point k, stat_k = √(k(n−k)/n)·|mean_left − mean_right|; the
    * argmax (ties → earliest split) is the changepoint. Returns ONE row
    * (split_x = LAST point of the left segment, k_left, n, mean_left,
    * mean_right, stat).
    *
    * Scale shape: one ordered window pass over the bounded series
    * (cumulative count/sum vs the totals) — no pairwise blow-up, so the
    * guard is only the series contract itself. */
  def changepointMeanShift(df: DataFrame, order: Column, value: Column,
      maxPoints: Int = 65536): DataFrame = {
    val s = series(df, order, value, "changepointMeanShift", maxPoints)
    val wCum = Window.orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val stats = s
      .withColumn("__k", count(lit(1)).over(wCum))
      .withColumn("__cs", sum("__y").over(wCum))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__ts", sum("__y").over(wAll))
      .where(col("__k") < col("__n"))
      .withColumn("__ml", col("__cs") / col("__k"))
      .withColumn("__mr", (col("__ts") - col("__cs"))
        / (col("__n") - col("__k")))
      .withColumn("__stat", sqrt(col("__k") * (col("__n") - col("__k"))
        / col("__n").cast("double")) * abs(col("__ml") - col("__mr")))
    val wBest = Window.orderBy(col("__stat").desc, col("__x").asc)
    stats.withColumn("__r", row_number().over(wBest))
      .where(col("__r") === 1)
      .select(col("__x").as("split_x"), col("__k").as("k_left"),
        col("__n").as("n"), col("__ml").as("mean_left"),
        col("__mr").as("mean_right"), col("__stat").as("stat"))
  }

  /** Additive seasonal index over a categorical season key (hour-of-day,
    * day-of-week, …): per season, n, the season mean, the additive index
    * (mean − grand mean) and multiplicative ratio (mean/grand mean) —
    * the one-pass decomposition that answers "is Tuesday 3am REALLY
    * quieter, and by how much?" before any drift test runs on a
    * seasonal series. Grand mean is the row-weighted overall mean (not
    * the mean of season means), so the indexes exactly sum to zero when
    * weighted by n. Returns one row per season, season-ordered.
    *
    * Scale shape: one map-side-combined groupBy(season); the grand mean
    * is a window over the bounded season table. */
  def seasonalIndex(df: DataFrame, season: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    df.where(v.isNotNull && season.isNotNull)
      .groupBy(season.as("season"))
      .agg(count(lit(1)).as("n"), sum(v).as("__s"))
      .withColumn("__grand", sum("__s").over(wAll) / sum("n").over(wAll))
      .withColumn("mean", col("__s") / col("n"))
      .select(col("season"), col("n"), col("mean"),
        (col("mean") - col("__grand")).as("index_add"),
        when(col("__grand") =!= 0.0, col("mean") / col("__grand"))
          .as("index_mult"))
      .orderBy("season")
  }
}
