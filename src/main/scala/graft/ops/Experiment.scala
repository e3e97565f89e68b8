package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online-experimentation / causal analytics over event logs — the
  * measurement side of a corpus-curation loop (did the new filter or
  * mixture actually move the metric?). Complements the drift detectors
  * (Stats.psi / ksStatistic / cusum) with the assignment-health and
  * effect-size half of the story.
  *
  * Scale shape, every operator: raw rows collapse to per-unit or
  * per-cell aggregates in ONE map-side-combined pass (a single shuffle
  * on the unit/arm key); everything after runs on a bounded frame
  * (#arms, #cells, #groups rows). No windows over raw rows, no
  * driver-side math on unbounded data — at 100 TB the only cost is the
  * one keyed aggregation Spark would need to count rows anyway.
  */
object Experiment {

  /** Sample-ratio-mismatch check (the first A/B health gate): observed
    * arm counts vs the configured split, Pearson chi-square. A biased
    * assignment invalidates every downstream readout, and at 100 TB the
    * bias is invisible to eyeballing — the chi-square is not.
    *
    * `expected` maps arm label → configured weight (any positive scale;
    * normalized internally). Arms in `expected` but absent from the data
    * surface with n_obs = 0 (the most alarming mismatch of all); arms in
    * the data but not in `expected` fail loudly rather than silently
    * diluting the test.
    *
    * One count-aggregation over the raw rows; the chi-square runs on the
    * #arms-row result (the unpartitioned window is bounded by #arms).
    */
  def srmCheck(df: DataFrame, arm: Column, expected: Seq[(String, Double)])
      : DataFrame = {
    require(expected.nonEmpty && expected.forall(_._2 > 0),
      "srmCheck: expected weights must be positive")
    val spark = df.sparkSession
    val wSum = expected.map(_._2).sum
    // lazy localCheckpoint: the count aggregation feeds BOTH the
    // unknown-arm guard and the report — without it the full input scan
    // runs twice (measured 2× at 100M rows). The checkpoint is bounded
    // by #distinct arms.
    val obs = df.groupBy(arm.as("arm")).agg(count(lit(1)).as("n_obs"))
      .localCheckpoint(false)
    val exp = spark.createDataFrame(expected.map { case (a, w) =>
      (a, w / wSum) }).toDF("arm", "w")
    val unknown = obs.join(exp, Seq("arm"), "left_anti").limit(1)
      .collect() // bounded: at most 1 row by construction
    require(unknown.isEmpty,
      s"srmCheck: arm '${unknown.headOption.map(_.getString(0)).orNull}' " +
        "in data but not in expected — fix the assignment map")
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    exp.join(obs, Seq("arm"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .withColumn("n_exp", sum(col("n_obs")).over(wAll) * col("w"))
      .withColumn("contrib",
        (col("n_obs") - col("n_exp")) * (col("n_obs") - col("n_exp"))
          / col("n_exp"))
      .withColumn("chi2", sum(col("contrib")).over(wAll))
      .withColumn("dof", count(lit(1)).over(wAll) - 1)
      .select(col("arm"), col("n_obs"), col("n_exp"), col("contrib"),
        col("chi2"), col("dof"))
  }

  /** Two-proportion z-test on unit-level conversion (the classic A/B
    * readout). `perUnit` must carry ONE row per experiment unit with an
    * `arm` label and a 0/1 `conv` flag — build it with the per-unit
    * groupBy so a heavy user can't vote twice (the unit of analysis must
    * match the unit of randomization or the variance is wrong).
    *
    * Returns one row: per-arm n/x/rate, absolute lift (B − A), pooled-
    * variance z statistic, and the unpooled Wald 95% CI on the lift.
    */
  def abConversion(perUnit: DataFrame, arm: Column, conv: Column,
      armA: String, armB: String): DataFrame = {
    val a = arm === armA
    val b = arm === armB
    val c = conv.cast("long")
    perUnit.agg(
        sum(when(a, 1L).otherwise(0L)).as("n_a"),
        coalesce(sum(when(a, c)), lit(0L)).as("x_a"),
        sum(when(b, 1L).otherwise(0L)).as("n_b"),
        coalesce(sum(when(b, c)), lit(0L)).as("x_b"))
      // explicit null faces (not 0/0 artifacts) when an arm is absent —
      // an empty arm is a caller bug the readout must not paper over
      .withColumn("rate_a", when(col("n_a") > 0, col("x_a") / col("n_a")))
      .withColumn("rate_b", when(col("n_b") > 0, col("x_b") / col("n_b")))
      .withColumn("lift", col("rate_b") - col("rate_a"))
      .withColumn("__p", when(col("n_a") + col("n_b") > 0,
        (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))))
      .withColumn("z", col("lift") / sqrt(col("__p") * (lit(1.0) - col("__p"))
        * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .withColumn("__se", sqrt(
        col("rate_a") * (lit(1.0) - col("rate_a")) / col("n_a")
          + col("rate_b") * (lit(1.0) - col("rate_b")) / col("n_b")))
      .withColumn("ci_lo", col("lift") - lit(1.96) * col("__se"))
      .withColumn("ci_hi", col("lift") + lit(1.96) * col("__se"))
      .drop("__p", "__se")
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi, Walker WSDM 2013):
    * adjust the experiment metric `y` by the pre-period covariate `x`
    * with the pooled θ = cov(x, y) / var(x), then read per-arm means of
    * both the raw and adjusted metric plus the realized variance
    * reduction. The highest-leverage trick in large-scale A/B practice —
    * typically 40–60 % variance off for free when the pre-period metric
    * correlates.
    *
    * `perUnit`: one row per unit with (arm, x, y). θ is fitted POOLED
    * across arms (the standard form — per-arm θ leaks treatment into the
    * adjustment). Two bounded aggregations: one global scalar row for θ
    * and the x-mean, one per-arm pass on the adjusted column; the scalar
    * joins back as a broadcast singleton.
    */
  def cuped(perUnit: DataFrame, arm: Column, x: Column, y: Column)
      : DataFrame = {
    // lazy localCheckpoint: θ and the per-arm pass both read perUnit,
    // and perUnit's plan usually contains the expensive raw-events →
    // per-unit collapse — materialize that collapse once (measured 2×
    // at 100M events / 10M units without it).
    val per = perUnit.localCheckpoint(false)
    val scalars = per.agg(
      covar_pop(x, y).as("__cxy"), var_pop(x).as("__vx"),
      avg(x).as("__mx"))
    val theta = when(col("__vx") > 0, col("__cxy") / col("__vx"))
      .otherwise(lit(0.0))
    per.crossJoin(broadcast(scalars))
      .withColumn("__theta", theta)
      .withColumn("__yadj", y - col("__theta") * (x - col("__mx")))
      .groupBy(arm.as("arm"))
      .agg(count(lit(1)).as("n"),
        avg(y).as("mean_y"),
        avg(col("__yadj")).as("mean_y_adj"),
        var_samp(y).as("var_y"),
        var_samp(col("__yadj")).as("var_y_adj"),
        first(col("__theta")).as("theta"))
      .withColumn("var_reduction",
        when(col("var_y") > 0, lit(1.0) - col("var_y_adj") / col("var_y")))
  }

  /** 2×2 difference-in-differences: cell means of `y` over
    * treated × post, DiD = (T,post − T,pre) − (C,post − C,pre), with the
    * independent-cell normal SE √(Σ s²ᵢ/nᵢ) and a 95 % CI. The
    * before/after readout when randomization wasn't available (a filter
    * rollout, an infra change) — parallel-trends is the caller's claim,
    * the arithmetic is ours. ONE fused aggregation over the raw rows.
    */
  def diffInDiff(df: DataFrame, treated: Column, post: Column, y: Column)
      : DataFrame = {
    def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
      avg(when(treated === t && post === p, y)).as(s"m_$suffix"),
      var_samp(when(treated === t && post === p, y)).as(s"v_$suffix"),
      count(when(treated === t && post === p, y)).as(s"n_$suffix"))
    val aggs = cell(false, false, "c0") ++ cell(false, true, "c1") ++
      cell(true, false, "t0") ++ cell(true, true, "t1")
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("did", (col("m_t1") - col("m_t0"))
        - (col("m_c1") - col("m_c0")))
      .withColumn("se", sqrt(
        col("v_t1") / col("n_t1") + col("v_t0") / col("n_t0")
          + col("v_c1") / col("n_c1") + col("v_c0") / col("n_c0")))
      .withColumn("ci_lo", col("did") - lit(1.96) * col("se"))
      .withColumn("ci_hi", col("did") + lit(1.96) * col("se"))
  }

  /** Per-group simple OLS (y = a + b·x): slope, intercept, and R² from
    * the one-pass covariance/variance aggregates — k independent trend
    * fits in ONE map-side-combined scan (the grouped complement of
    * Stats.corrMatrix). Zero-variance x yields null slope (no division
    * blow-up under ANSI); R² is null when either variance is zero.
    */
  def olsPerGroup(df: DataFrame, group: Column, x: Column, y: Column)
      : DataFrame =
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"),
        covar_samp(x, y).as("__cxy"),
        var_samp(x).as("__vx"), var_samp(y).as("__vy"),
        avg(x).as("__mx"), avg(y).as("__my"))
      .withColumn("slope",
        when(col("__vx") > 0, col("__cxy") / col("__vx")))
      .withColumn("intercept", col("__my") - col("slope") * col("__mx"))
      .withColumn("r2", when(col("__vx") > 0 && col("__vy") > 0,
        col("__cxy") * col("__cxy") / (col("__vx") * col("__vy"))))
      .select(col("grp"), col("n"), col("slope"), col("intercept"),
        col("r2"))

  /** Per-group ridge regression (Hoerl & Kennard 1970), 1 feature:
    * minimize Σ(y − a − b·x)² + λb² — the L2-shrunk sibling of
    * [[olsPerGroup]] for near-constant-x groups where the OLS slope
    * explodes (and the convention big grid drivers use to keep per-slice
    * trend fits finite). Closed form on centered sums:
    * b = Sxy/(Sxx + λ), a = ȳ − b·x̄ (intercept unpenalized — the
    * standard convention), where Sxy = Σ(x−x̄)(y−ȳ), Sxx = Σ(x−x̄)².
    * λ = 0 reproduces olsPerGroup exactly. Also reports the penalized
    * fit's plain R² = 1 − SSE/Syy (null when Syy = 0). ONE fused
    * map-side-combined scan, k closed-form fits. */
  def ridgePerGroup(df: DataFrame, group: Column, x: Column, y: Column,
      lambda: Double): DataFrame = {
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"),
        covar_samp(x, y).as("__cxy"), var_samp(x).as("__vx"),
        var_samp(y).as("__vy"), avg(x).as("__mx"), avg(y).as("__my"))
      // ddof=1 moments → centered sums: S = (n−1)·moment
      .withColumn("__sxy", col("__cxy") * (col("n") - 1))
      .withColumn("__sxx", col("__vx") * (col("n") - 1))
      .withColumn("__syy", col("__vy") * (col("n") - 1))
      .withColumn("slope", when(col("__sxx") + lambda > 0,
        col("__sxy") / (col("__sxx") + lambda)))
      .withColumn("intercept", col("__my") - col("slope") * col("__mx"))
      .withColumn("r2", when(col("__syy") > 0,
        lit(1.0) - (col("__syy") - lit(2.0) * col("slope") * col("__sxy")
          + col("slope") * col("slope") * col("__sxx")) / col("__syy")))
      .select(col("grp"), col("n"), col("slope"), col("intercept"),
        col("r2"))
  }

  /** Plain 2×2 odds ratio + risk ratio with Wald 95% CIs (the
    * epidemiology basics [[cmh]] stratifies; use THIS when there is no
    * confounder to stratify on): a/b = exposed with/without outcome,
    * c/d = unexposed. OR = ad/bc with ln-scale CI
    * exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)); RR = risk_e/risk_u with
    * exp(ln RR ± 1.96·√(1/a − 1/(a+b) + 1/c − 1/(c+d))). Any zero
    * margin cell yields null ratios (no silent Haldane correction — add
    * 0.5 yourself if you want it, loudly). ONE fused aggregation.
    * Returns (a, b, c, d, risk_exposed, risk_unexposed, rr, rr_lo,
    * rr_hi, or_, or_lo, or_hi). */
  def oddsRatio(df: DataFrame, exposed: Column, outcome: Column)
      : DataFrame = {
    val e = exposed.cast("boolean")
    val o = outcome.cast("boolean")
    val cells = df.where(e.isNotNull && o.isNotNull).agg(
      sum(when(e && o, 1L).otherwise(0L)).as("a"),
      sum(when(e && !o, 1L).otherwise(0L)).as("b"),
      sum(when(!e && o, 1L).otherwise(0L)).as("c"),
      sum(when(!e && !o, 1L).otherwise(0L)).as("d"))
    val all = Seq("a", "b", "c", "d").map(col(_) > 0).reduce(_ && _)
    val lnOr = log(col("a").cast("double") * col("d")
      / (col("b").cast("double") * col("c")))
    val seOr = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
      + lit(1.0) / col("c") + lit(1.0) / col("d"))
    val riskE = col("a").cast("double") / (col("a") + col("b"))
    val riskU = col("c").cast("double") / (col("c") + col("d"))
    val lnRr = log(riskE / riskU)
    val seRr = sqrt(lit(1.0) / col("a") - lit(1.0) / (col("a") + col("b"))
      + lit(1.0) / col("c") - lit(1.0) / (col("c") + col("d")))
    cells.select(col("a"), col("b"), col("c"), col("d"),
      when(col("a") + col("b") > 0, riskE).as("risk_exposed"),
      when(col("c") + col("d") > 0, riskU).as("risk_unexposed"),
      when(all, exp(lnRr)).as("rr"),
      when(all, exp(lnRr - lit(1.96) * seRr)).as("rr_lo"),
      when(all, exp(lnRr + lit(1.96) * seRr)).as("rr_hi"),
      when(all, exp(lnOr)).as("or_"),
      when(all, exp(lnOr - lit(1.96) * seOr)).as("or_lo"),
      when(all, exp(lnOr + lit(1.96) * seOr)).as("or_hi"))
  }

  /** Cochran–Mantel–Haenszel stratified 2×2 test + Mantel–Haenszel
    * common odds ratio (Cochran 1954; Mantel & Haenszel 1959) — the
    * confounding-robust binary-outcome readout: per stratum the 2×2
    * (arm × converted) table contributes O = x_a, E = n_a·m/n, and the
    * hypergeometric variance; χ²_CMH = (ΣO − ΣE)²/ΣV, and
    * OR_MH = Σ(x_a·(n_b−x_b)/n) / Σ(x_b·(n_a−x_a)/n). Simpson's-paradox
    * insurance for [[abConversion]] the way [[ipwAte]] is for means.
    * ONE cell aggregation; the combine runs over the bounded stratum
    * table. Strata with a zero margin contribute nothing (standard).
    */
  def cmh(df: DataFrame, stratum: Column, arm: Column, converted: Column,
      armA: String, armB: String): DataFrame = {
    val a = arm === armA
    val b = arm === armB
    val c = converted.cast("long")
    val byS = df.where(a || b).groupBy(stratum.as("stratum")).agg(
      sum(when(a, 1L).otherwise(0L)).as("n_a"),
      coalesce(sum(when(a, c)), lit(0L)).as("x_a"),
      sum(when(b, 1L).otherwise(0L)).as("n_b"),
      coalesce(sum(when(b, c)), lit(0L)).as("x_b"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val m1 = (col("x_a") + col("x_b")).cast("double")
    val m0 = n - m1
    val informative = col("n_a") > 0 && col("n_b") > 0 && m1 > 0 && m0 > 0
    // doubles from the first factor: long×long intermediates overflow
    // once a stratum holds >3e9 rows per arm
    val e = col("n_a").cast("double") * m1 / n
    val v = col("n_a").cast("double") * col("n_b") * m1 * m0 /
      (n * n * (n - 1))
    val orNum = col("x_a").cast("double") * (col("n_b") - col("x_b")) / n
    val orDen = col("x_b").cast("double") * (col("n_a") - col("x_a")) / n
    byS.agg(
        count(lit(1)).as("n_strata"),
        sum(when(informative, 1L).otherwise(0L)).as("n_informative"),
        coalesce(sum(when(informative, col("x_a"))), lit(0L)).as("observed_a"),
        coalesce(sum(when(informative, e)), lit(0.0)).as("expected_a"),
        coalesce(sum(when(informative, v)), lit(0.0)).as("variance"),
        coalesce(sum(when(informative, orNum)), lit(0.0)).as("__on"),
        coalesce(sum(when(informative, orDen)), lit(0.0)).as("__od"))
      .withColumn("chi2", when(col("variance") > 0,
        (col("observed_a") - col("expected_a"))
          * (col("observed_a") - col("expected_a")) / col("variance")))
      .withColumn("or_mh", when(col("__od") > 0, col("__on") / col("__od")))
      .select(col("n_strata"), col("n_informative"), col("observed_a"),
        col("expected_a"), col("variance"), col("chi2"), col("or_mh"))
  }

  /** Mixture sequential probability ratio test (mSPRT — Johari, Koomen,
    * Pekelis & Walsh 2017, "Peeking at A/B Tests"): the always-valid
    * p-value that lets an experiment be monitored continuously without
    * inflating false positives. Per ordered period, the CUMULATIVE
    * two-sample mean difference Δ_t with normal likelihood and a
    * N(0, τ²) mixture over the effect:
    * Λ_t = √(se²/(se²+τ²)) · exp(Δ²τ²/(2se²(se²+τ²))),
    * p_t = running min of 1/max(Λ, 1) — monotone nonincreasing, valid at
    * every look. Reject when p_t ≤ α, whenever you happen to look.
    *
    * Scale shape: raw rows collapse to per-period conditional moment
    * sums in ONE aggregation; the cumulative statistics, Λ, and the
    * running-min p are windows over the bounded period table. Returns
    * one row per period.
    */
  def msprt(df: DataFrame, arm: Column, period: Column, y: Column,
      armA: String, armB: String, tau2: Double): DataFrame = {
    require(tau2 > 0.0, "msprt: tau2 must be > 0")
    val a = arm === armA
    val b = arm === armB
    val yd = y.cast("double")
    val byP = df.where(a || b).groupBy(period.as("period")).agg(
      sum(when(a, 1L).otherwise(0L)).as("n_a"),
      coalesce(sum(when(a, yd)), lit(0.0)).as("s_a"),
      coalesce(sum(when(a, yd * yd)), lit(0.0)).as("ss_a"),
      sum(when(b, 1L).otherwise(0L)).as("n_b"),
      coalesce(sum(when(b, yd)), lit(0.0)).as("s_b"),
      coalesce(sum(when(b, yd * yd)), lit(0.0)).as("ss_b"))
    val wCum = Window.orderBy("period")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byP
      .withColumn("cn_a", sum("n_a").over(wCum))
      .withColumn("cs_a", sum("s_a").over(wCum))
      .withColumn("css_a", sum("ss_a").over(wCum))
      .withColumn("cn_b", sum("n_b").over(wCum))
      .withColumn("cs_b", sum("s_b").over(wCum))
      .withColumn("css_b", sum("ss_b").over(wCum))
    val defined = col("cn_a") >= 2 && col("cn_b") >= 2
    val meanA = col("cs_a") / col("cn_a")
    val meanB = col("cs_b") / col("cn_b")
    // pooled variance from cumulative moments (both arms share sigma)
    val sse = (col("css_a") - col("cs_a") * col("cs_a") / col("cn_a")) +
      (col("css_b") - col("cs_b") * col("cs_b") / col("cn_b"))
    val variance = sse / (col("cn_a") + col("cn_b") - 2)
    val se2 = variance * (lit(1.0) / col("cn_a") + lit(1.0) / col("cn_b"))
    val delta = meanB - meanA
    // ln Λ, not Λ: the likelihood ratio reaches e^600+ on a real effect
    // at moderate n — finite-but-astronomical doubles where round(x, k)
    // can no longer absorb last-ulp engine noise (and then overflows to
    // Inf outright). Everything downstream works on the 6-dp-rounded
    // log face, so p replays exactly cross-engine (the kaplanMeier
    // se-from-rounded discipline).
    val logLambda = round(
      lit(0.5) * log(se2 / (se2 + lit(tau2))) +
        delta * delta * lit(tau2) /
          (lit(2.0) * se2 * (se2 + lit(tau2))), 6)
    cum
      .withColumn("mean_a", when(col("cn_a") > 0, meanA))
      .withColumn("mean_b", when(col("cn_b") > 0, meanB))
      .withColumn("delta", when(defined, delta))
      .withColumn("log_lambda", when(defined && se2 > 0, logLambda))
      // p_t = exp(−max_{s≤t} max(0, lnΛ_s)): the always-valid running
      // min of min(1, 1/Λ), in log space
      .withColumn("p_always_valid", exp(-max(
          greatest(lit(0.0), coalesce(col("log_lambda"), lit(0.0))))
          .over(wCum)))
      .select(col("period"), col("cn_a").as("n_a"), col("cn_b").as("n_b"),
        col("mean_a"), col("mean_b"), col("delta"), col("log_lambda"),
        col("p_always_valid"))
  }

  /** Inverse-propensity-weighted ATE with a saturated (cell-level)
    * propensity model — stratification on discrete pre-treatment
    * covariates (Horvitz & Thompson 1952; Rosenbaum & Rubin 1983). With
    * cell propensities ê_c = n_{t,c}/n_c the Hájek and HT estimators
    * coincide and collapse to pure cell algebra:
    * μ̂₁ = Σ_c (Σ y·t)_c · n_c/n_{t,c} / N over OVERLAP cells (cells with
    * both arms present); no-overlap cells are dropped and counted — the
    * positivity violation a causal readout must report, never hide.
    *
    * Scale shape: ONE cell-level aggregation over the raw rows, then
    * the estimator combines the bounded cell table — no join back, no
    * per-row weights materialized. Returns one row: totals, overlap
    * diagnostics, μ̂₁/μ̂₀, and the ATE.
    */
  def ipwAte(df: DataFrame, treated: Column, y: Column,
      cells: Seq[Column]): DataFrame = {
    require(cells.nonEmpty, "ipwAte: need at least one covariate cell")
    val t = treated.cast("boolean")
    val byCell = df
      .groupBy(cells.zipWithIndex.map { case (c, i) => c.as(s"__c$i") }: _*)
      .agg(count(lit(1)).as("n_c"),
        sum(when(t, 1L).otherwise(0L)).as("nt_c"),
        coalesce(sum(when(t, y)), lit(0.0)).as("syt_c"),
        coalesce(sum(when(!t, y)), lit(0.0)).as("syc_c"))
    val overlap = col("nt_c") > 0 && col("nt_c") < col("n_c")
    byCell.agg(
        sum(col("n_c")).as("n_total"),
        count(lit(1)).as("n_cells"),
        sum(when(overlap, col("n_c")).otherwise(0L)).as("n_overlap"),
        sum(when(!overlap, 1L).otherwise(0L)).as("n_cells_dropped"),
        coalesce(sum(when(overlap, col("syt_c")
          * col("n_c").cast("double") / col("nt_c"))), lit(0.0)).as("__s1"),
        coalesce(sum(when(overlap, col("syc_c")
          * col("n_c").cast("double") / (col("n_c") - col("nt_c")))),
          lit(0.0)).as("__s0"))
      .withColumn("mu1", when(col("n_overlap") > 0,
        col("__s1") / col("n_overlap")))
      .withColumn("mu0", when(col("n_overlap") > 0,
        col("__s0") / col("n_overlap")))
      .withColumn("ate", col("mu1") - col("mu0"))
      .select(col("n_total"), col("n_cells"), col("n_overlap"),
        col("n_cells_dropped"), col("mu1"), col("mu0"), col("ate"))
  }
}
