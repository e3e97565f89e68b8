package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based k-sample / paired tests and standardized effect sizes —
  * the nonparametric siblings of [[Stats.anovaF]] / [[Stats.welchTTest]]
  * for skewed pipeline metrics (latencies, doc lengths, quality scores)
  * where mean-based instruments mislead. Extends the curation-analytics
  * surface (SURVEY §2.12); the reference's statistics layer stops at
  * per-run mean/std aggregation (func_test.py:478-520), so these are
  * engine extensions, not ports.
  *
  * Scale shape (all four ops): raw rows collapse to ONE map-side-combined
  * count per DISTINCT value (ties aggregated, never enumerated) — the
  * [[Stats.mannWhitneyU]] / ROC-curve collapse — then any window runs
  * over the bounded distinct-value table and the verdict is a scalar
  * aggregate. Nothing row-sized ever crosses a second shuffle.
  */
object RankTests {

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952): do k ≥ 2 groups share
    * a location? Midranks for ties; H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1),
    * reported raw and tie-corrected (H / (1 − Σ(t³−t)/(N³−N))). Null
    * values and null groups are ignored. Returns ONE row
    * (k, n, h, h_tie_corrected) — statistic + dof implicit in k, no
    * p-value, per the [[Stats.welchTTest]] convention.
    *
    * Scale shape: one groupBy(value, group) collapse; midranks come from
    * a single-ordered window over the DISTINCT-VALUE table (|distinct
    * values| rows, not N) joined back to the (value, group) cells on the
    * value key; per-group rank sums and the final scalar are two more
    * bounded aggregations. */
  def kruskalWallis(df: DataFrame, value: Column, group: Column): DataFrame = {
    val v = value.cast("double")
    val cells = df.where(v.isNotNull && group.isNotNull)
      .groupBy(v.as("__v"), group.cast("string").as("__g"))
      .agg(count(lit(1)).as("__c"))
      // two consumers (the rank spine + the per-group tagging join):
      // collapse the corpus once (r12)
      .localCheckpoint(false)
    val perV = cells.groupBy("__v").agg(sum("__c").as("__t"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV.withColumn("__rank",
      coalesce(sum("__t").over(w), lit(0L)).cast("double") +
        (col("__t") + 1).cast("double") / 2.0)
      // consumed by the per-group join AND the tie sum: run the
      // single-partition rank window once (r12)
      .localCheckpoint(false)
    val perG = cells.join(ranked, "__v")
      .groupBy("__g")
      .agg(sum(col("__c") * col("__rank")).as("__r"), sum("__c").as("__n"))
    // per-cell t³ in double (a single 3M-row tie would overflow long)
    val ties = ranked.agg(
      sum(pow(col("__t").cast("double"), 3) - col("__t")).as("__ties"))
    perG.agg(
        count(lit(1)).as("k"), sum("__n").as("n"),
        sum(col("__r") * col("__r") / col("__n")).as("__rr"))
      .crossJoin(broadcast(ties))
      // n³ in DOUBLE lanes: long n³ overflows past n ≈ 2.1M rows — the
      // exact probe regime this test is built for
      .withColumn("__n3", pow(col("n").cast("double"), 3)
        - col("n").cast("double"))
      .withColumn("h", lit(12.0) / (col("n").cast("double") * (col("n") + 1))
        * col("__rr") - (col("n") + 1) * 3.0)
      .withColumn("h_tie_corrected", when(col("__n3") > col("__ties"),
        col("h") / (lit(1.0) - col("__ties").cast("double") / col("__n3"))))
      .select(col("k"), col("n"), col("h"), col("h_tie_corrected"))
  }

  /** Wilcoxon signed-rank test (Wilcoxon 1945) on paired columns
    * (before, after): rank |d| over the pairwise-complete NONZERO
    * differences (the classic zero-drop convention), midranks for ties,
    * W⁺ = Σ ranks of positive d, normal approximation with the
    * tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48. Returns ONE
    * row (n, w_plus, w_minus, z); n counts the nonzero pairs. */
  def wilcoxonSignedRank(df: DataFrame, x: Column, y: Column): DataFrame = {
    val d = x.cast("double") - y.cast("double")
    val cells = df.where(d.isNotNull && d =!= 0.0)
      .groupBy(abs(d).as("__ad"))
      .agg(count(when(d > 0, lit(1))).as("__cp"),
        count(when(d < 0, lit(1))).as("__cn"))
      .withColumn("__t", col("__cp") + col("__cn"))
    val w = Window.orderBy(col("__ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells.withColumn("__rank",
      coalesce(sum("__t").over(w), lit(0L)).cast("double") +
        (col("__t") + 1).cast("double") / 2.0)
    ranked.agg(
        sum(col("__cp") * col("__rank")).as("w_plus"),
        sum(col("__cn") * col("__rank")).as("w_minus"),
        sum("__t").as("n"),
        sum(pow(col("__t").cast("double"), 3) - col("__t")).as("__ties"))
      .select(col("n"), col("w_plus"), col("w_minus"),
        when(col("n") > 0,
          // double lanes: the long triple product overflows past n ≈ 1.6M
          (col("w_plus") - col("n").cast("double") * (col("n") + 1) / 4.0) /
            sqrt(col("n").cast("double") * (col("n") + 1)
              * (col("n") * 2 + 1) / 24.0
              - col("__ties") / 48.0)).as("z"))
  }

  /** Brown–Forsythe robust variance-equality test (Brown & Forsythe
    * 1974; the median-centered Levene): one-way ANOVA F on
    * z = |x − median_g|. The median is the exact interpolated
    * `percentile(…, 0.5)` — the same order statistic DuckDB's
    * `quantile_cont` computes, so both engines center identically.
    * Returns [[Stats.anovaF]]'s row (k, n, ss_between, ss_within,
    * df_between, df_within, f_stat).
    *
    * Scale shape: one exact-percentile groupBy for the k medians
    * (bounded output, broadcast back — k is a category cardinality, not
    * data-sized), then anovaF's single fused moment pass. */
  def brownForsythe(df: DataFrame, value: Column, group: Column): DataFrame = {
    val v = value.cast("double")
    val base = df.where(v.isNotNull && group.isNotNull)
      .select(v.as("__v"), group.cast("string").as("__g"))
    val med = base.groupBy("__g")
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    base.join(broadcast(med), "__g")
      .select(col("__g"), abs(col("__v") - col("__med")).as("__z"))
      .transform(z => Stats.anovaF(z, col("__g"), col("__z")))
  }

  /** Standardized two-group effect sizes — the "is it LARGE?" companion
    * to the significance tests above (a 100 TB corpus makes everything
    * significant; only effect size still discriminates):
    *
    *  - Cohen's d = (mean_a − mean_b)/s_pooled (ddof=1 pooled sd);
    *  - Hedges' g = d·(1 − 3/(4(n_a+n_b) − 9)) (small-sample bias
    *    correction, Hedges 1981);
    *  - Cliff's delta = 2U_a/(n_a·n_b) − 1 (Cliff 1993) — the ordinal,
    *    outlier-immune size, derived from the SAME tie-corrected U the
    *    [[Stats.mannWhitneyU]] test reports.
    *
    * Returns ONE row (n_a, n_b, cohens_d, hedges_g, cliffs_delta).
    * Scale shape: one fused moment aggregation + mannWhitneyU's
    * distinct-value collapse; both single-row results cross-join. */
  def effectSizes(df: DataFrame, value: Column, group: Column,
      a: String, b: String): DataFrame = {
    val v = value.cast("double")
    val moments = df.where(v.isNotNull && group.isin(a, b))
      .agg(
        count(when(group === a, lit(1))).as("n_a"),
        count(when(group === b, lit(1))).as("n_b"),
        avg(when(group === a, v)).as("__ma"),
        avg(when(group === b, v)).as("__mb"),
        var_samp(when(group === a, v)).as("__va"),
        var_samp(when(group === b, v)).as("__vb"))
    val u = Stats.mannWhitneyU(df, value, group, a, b)
      .select(col("u_a").as("__ua"))
    moments.crossJoin(broadcast(u))
      .withColumn("__sp", sqrt(
        ((col("n_a") - 1) * col("__va") + (col("n_b") - 1) * col("__vb"))
          / (col("n_a") + col("n_b") - 2)))
      .withColumn("cohens_d", when(col("__sp") > 0,
        (col("__ma") - col("__mb")) / col("__sp")))
      .withColumn("hedges_g", col("cohens_d")
        * (lit(1.0) - lit(3.0) / ((col("n_a") + col("n_b")) * 4.0 - 9.0)))
      .withColumn("cliffs_delta",
        lit(2.0) * col("__ua") / (col("n_a") * col("n_b")) - 1.0)
      .select(col("n_a"), col("n_b"), col("cohens_d"), col("hedges_g"),
        col("cliffs_delta"))
  }

  /** Post-hoc pairwise contrasts after an omnibus test ([[kruskalWallis]]
    * / [[Stats.anovaF]] says "SOMETHING differs"; this says which pairs):
    * for every group pair (a < b lexicographically), the mean difference,
    * Welch's unpooled SE = √(v_a/n_a + v_b/n_b), z = Δ/SE, and the
    * Welch–Satterthwaite dof — the Games–Howell contrast set without the
    * studentized-range p (the engine reports statistics, not p-values —
    * the [[Stats.welchTTest]] convention; feed z into [[Stats.bhFdr]]'s
    * input if multiplicity control is needed). Returns
    * (grp_a, grp_b, n_a, n_b, mean_diff, se, z, dof), pair-ordered.
    *
    * Scale shape: ONE fused moment aggregation (k rows), then the k(k−1)/2
    * pair join runs on the bounded group table — never on raw rows. */
  def posthocPairs(df: DataFrame, value: Column, group: Column): DataFrame = {
    val v = value.cast("double")
    val byG = df.where(v.isNotNull && group.isNotNull)
      .groupBy(group.cast("string").as("g"))
      .agg(count(lit(1)).as("n"), avg(v).as("m"), var_samp(v).as("vv"))
    val a = byG.select(col("g").as("grp_a"), col("n").as("n_a"),
      col("m").as("__ma"), col("vv").as("__va"))
    val b = byG.select(col("g").as("grp_b"), col("n").as("n_b"),
      col("m").as("__mb"), col("vv").as("__vb"))
    a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("mean_diff", col("__ma") - col("__mb"))
      .withColumn("__sa", col("__va") / col("n_a"))
      .withColumn("__sb", col("__vb") / col("n_b"))
      .withColumn("se", sqrt(col("__sa") + col("__sb")))
      .withColumn("z", when(col("se") > 0, col("mean_diff") / col("se")))
      .withColumn("dof", when(col("n_a") > 1 && col("n_b") > 1
          && col("__sa") + col("__sb") > 0,
        pow(col("__sa") + col("__sb"), 2) /
          (pow(col("__sa"), 2) / (col("n_a") - 1)
            + pow(col("__sb"), 2) / (col("n_b") - 1))))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("mean_diff"), col("se"), col("z"), col("dof"))
      .orderBy("grp_a", "grp_b")
  }

  /** Kendall's τ-b rank correlation (Kendall 1938; tie treatment per
    * Kendall 1945): over all row pairs, S = C − D (concordant minus
    * discordant), τ_b = S / √((n₀ − n₁)(n₀ − n₂)) with n₀ = n(n−1)/2
    * and n₁/n₂ the x-/y-marginal tie-pair counts — the
    * concordance-based sibling of [[graft.ops.Stats.spearman]]
    * (bounded [−1, 1], exactly ±1 on strictly monotone data, robust to
    * monotone rescaling). Pairs tied on BOTH coordinates count in
    * neither C nor D nor the denominators' subtractions beyond their
    * marginals — the τ-b definition. Returns ONE row
    * (n, n_concordant, n_discordant, tau_b — null when either margin
    * is all ties). No p-value by the [[kruskalWallis]] convention (the
    * normal approximation under heavy ties needs the joint-tie
    * variance terms; use [[graft.ops.Trend.mannKendall]] for the
    * time-ordered z).
    *
    * Scale shape: raw rows collapse to DISTINCT (x, y) cells in ONE
    * map-side-combined aggregation — pair work is cells², never rows²
    * (a quality-score pair on a 100 TB corpus has bounded distinct
    * cells once scores are binned/rounded). The `maxCells` guard fails
    * loudly when the cell table isn't actually bounded (the
    * [[graft.ops.Trend]] discipline — bin first, never raise blindly):
    * 4096 cells ⇒ ≤ 8.4M cell pairs. */
  def kendallTau(df: DataFrame, x: Column, y: Column,
      maxCells: Int = 4096): DataFrame = {
    val xd = x.cast("double"); val yd = y.cast("double")
    val cells = df.where(xd.isNotNull && yd.isNotNull)
      .groupBy(xd.as("__x"), yd.as("__y"))
      .agg(count(lit(1)).as("__c"))
    val spark = df.sparkSession
    import spark.implicits._
    // the gate probe, the concordance join, and the three margin
    // reduces all read the bounded cell table — persist BEFORE the
    // probe so the corpus-sized collapse runs ONCE (every downstream
    // action is eager, so the unpersist is safe); products and tie
    // terms accumulate in EXACT decimal lanes — c1·c2 and t(t−1) wrap
    // a 64-bit long at multi-billion-row cells (the SCALE.md
    // double-lane discipline, but exact: these are counts on the
    // output face)
    cells.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val g = cells.limit(maxCells + 1).agg(count(lit(1))).head().getLong(0)
      require(g <= maxCells,
        s"kendallTau: > $maxCells distinct (x, y) cells — bin or round " +
          "the coordinates first; pairwise concordance over an unbounded " +
          "cell table does not scale")
      val a = cells.select(col("__x").as("__x1"), col("__y").as("__y1"),
        col("__c").as("__c1"))
      val b = cells.select(col("__x").as("__x2"), col("__y").as("__y2"),
        col("__c").as("__c2"))
      val dec = "decimal(38,0)"
      // lexicographic dedupe of unordered cell pairs
      val cdRow = a.join(b, col("__x1") < col("__x2")
          || (col("__x1") === col("__x2") && col("__y1") < col("__y2")))
        .select((col("__c1").cast("decimal(19,0)")
            * col("__c2").cast("decimal(19,0)")).as("__w"),
          (signum(col("__x2") - col("__x1"))
            * signum(col("__y2") - col("__y1"))).as("__s"))
        .agg(coalesce(sum(when(col("__s") > 0, col("__w"))),
            lit(0).cast(dec)).as("c"),
          coalesce(sum(when(col("__s") < 0, col("__w"))),
            lit(0).cast(dec)).as("d"))
        .head()
      val (cBig, dBig) = (cdRow.getDecimal(0), cdRow.getDecimal(1))
      val n = cells.agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
      def tiePairs2(key: Column): Double =
        cells.groupBy(key).agg(sum("__c").as("__t"))
          .agg(coalesce(sum(col("__t").cast("decimal(19,0)")
              * (col("__t") - 1).cast("decimal(19,0)")), lit(0).cast(dec)))
          .head().getDecimal(0).doubleValue
      val (tx2, ty2) = (tiePairs2(col("__x")), tiePairs2(col("__y")))
      // identical double sequence as the DuckDB twin's face
      val n0x2 = n.toDouble * (n - 1)
      val den = math.sqrt((n0x2 - tx2) * (n0x2 - ty2)) / 2.0
      val tau: Option[Double] = if (den > 0)
        Some(cBig.subtract(dBig).doubleValue / den) else None
      // the output face carries the pair counts as BIGINT (the twin's
      // type); past ~6e9 rows they overflow a long even though the
      // decimal lanes computed tau exactly — refuse loudly instead of
      // leaking a bare ArithmeticException from longValueExact
      val longMax = java.math.BigDecimal.valueOf(Long.MaxValue)
      require(cBig.compareTo(longMax) <= 0 && dBig.compareTo(longMax) <= 0,
        s"kendallTau: concordant/discordant pair counts ($cBig / $dBig) " +
          "exceed the BIGINT output face; tau is still exact — drop the " +
          "count columns or bin coarser")
      Seq((n, cBig.longValueExact(), dBig.longValueExact(), tau))
        .toDF("n", "n_concordant", "n_discordant", "tau_b")
    } finally cells.unpersist(blocking = false)
  }
}
