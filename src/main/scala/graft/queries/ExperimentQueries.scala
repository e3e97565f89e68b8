package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{DataQuality, Experiment, Stats}
import graft.queries.Q._

/** Experimentation / causal-measurement surface: assignment health
  * (SRM), conversion z-test, CUPED variance reduction, difference-in-
  * differences, grouped OLS trends, Nelson–Aalen hazards, and the
  * Benford fabrication screen. All hash-oracled against DuckDB twins.
  */
object ExperimentQueries {

  /** 2024-01-16 00:00 UTC in epoch µs — the mid-January experiment cut
    * shared with AnalyticsQueries' g_bh_fdr slices. */
  private val cutUs = 1705363200000000L

  val queries: Map[String, QueryFn] = Map(
    "g_srm" -> ((s, dir) => {
      // Assignment-health gate: user_id % 3 vs the configured equal
      // thirds — the chi-square that catches a biased bucketing hash
      // long before any metric readout is trusted.
      val ev = table(s, dir, "events")
      Experiment.srmCheck(ev,
          concat(lit("arm_"), pmod(col("user_id"), lit(3))),
          Seq("arm_0" -> 1.0, "arm_1" -> 1.0, "arm_2" -> 1.0))
        .select(col("arm"), col("n_obs"),
          round(col("n_exp"), 4).as("n_exp"),
          round(col("contrib"), 6).as("contrib"),
          round(col("chi2"), 4).as("chi2"), col("dof"))
        .orderBy("arm")
    }),

    "g_ab_conversion" -> ((s, dir) => {
      // Unit-level conversion readout: converted = ever purchased above
      // 250 (≈8 % of users — non-degenerate at every SF); arms split on
      // user_id parity. Per-user collapse FIRST so heavy users can't
      // vote twice.
      val per = table(s, dir, "events").groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase"
          && col("value") > 250, 1).otherwise(0)).as("conv"))
        .withColumn("arm", concat(lit("arm_"), pmod(col("user_id"), lit(2))))
      Experiment.abConversion(per, col("arm"), col("conv"), "arm_0", "arm_1")
        .select(col("n_a"), col("x_a"), round(col("rate_a"), 6).as("rate_a"),
          col("n_b"), col("x_b"), round(col("rate_b"), 6).as("rate_b"),
          round(col("lift"), 6).as("lift"), round(col("z"), 4).as("z"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"))
    }),

    "g_cuped" -> ((s, dir) => {
      // CUPED: per-user pre-period value sum (before Jan 16) adjusts the
      // post-period sum; pooled θ, per-arm adjusted means + realized
      // variance reduction.
      val per = table(s, dir, "events").groupBy("user_id")
        .agg(coalesce(sum(when(col("ts") < cutUs, col("value"))), lit(0.0))
            .as("x"),
          coalesce(sum(when(col("ts") >= cutUs, col("value"))), lit(0.0))
            .as("y"))
        .withColumn("arm", concat(lit("arm_"), pmod(col("user_id"), lit(2))))
      Experiment.cuped(per, col("arm"), col("x"), col("y"))
        .select(col("arm"), col("n"),
          round(col("mean_y"), 4).as("mean_y"),
          round(col("mean_y_adj"), 4).as("mean_y_adj"),
          round(col("var_y"), 2).as("var_y"),
          round(col("var_y_adj"), 2).as("var_y_adj"),
          round(col("theta"), 6).as("theta"),
          round(col("var_reduction"), 6).as("var_reduction"))
        .orderBy("arm")
    }),

    "g_did" -> ((s, dir) =>
      // 2×2 diff-in-diff on event value: treated = odd users, post =
      // after the Jan-16 cut; one fused aggregation.
      Experiment.diffInDiff(table(s, dir, "events"),
          pmod(col("user_id"), lit(2)) === 1, col("ts") >= cutUs,
          col("value"))
        .select(round(col("m_c0"), 4).as("m_c0"),
          round(col("m_c1"), 4).as("m_c1"),
          round(col("m_t0"), 4).as("m_t0"),
          round(col("m_t1"), 4).as("m_t1"),
          col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
          round(col("did"), 4).as("did"), round(col("se"), 4).as("se"),
          round(col("ci_lo"), 4).as("ci_lo"),
          round(col("ci_hi"), 4).as("ci_hi"))),

    "g_ols_per_group" -> ((s, dir) =>
      // Per-returnflag price-on-quantity trend: slope/intercept/R² from
      // the one-pass covariance aggregates (corrMatrix's ANSI-safe form,
      // grouped).
      Experiment.olsPerGroup(table(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .select(col("grp"), col("n"), round(col("slope"), 4).as("slope"),
          round(col("intercept"), 4).as("intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy("grp")),

    "g_cronbach_alpha" -> ((s, dir) => {
      // Internal consistency of a 5-item per-user "battery" (mean value
      // per event type, 6-dp-rounded; users with all five present).
      val items = Seq("click", "view", "purchase", "signup", "error")
      val per = table(s, dir, "events").groupBy("user_id").agg(
        items.map(t => round(avg(when(col("event_type") === t,
          col("value"))), 6).as(s"i_$t")).head,
        items.tail.map(t => round(avg(when(col("event_type") === t,
          col("value"))), 6).as(s"i_$t")): _*)
      graft.ops.Calibration.cronbachAlpha(per,
          items.map(t => col(s"i_$t")))
        .select(col("n"), col("k"),
          round(col("sum_item_var"), 4).as("sum_item_var"),
          round(col("total_var"), 4).as("total_var"),
          round(col("alpha"), 6).as("alpha"))
    }),

    "g_icc" -> ((s, dir) =>
      // ICC(1) on the fleiss fixture's continuous sibling: 400 items ×
      // exactly 25 ratings (value) — item-variance share with the n0
      // balanced-design correction.
      graft.ops.Calibration.icc1(table(s, dir, "events"),
          pmod(col("event_id"), lit(400)), col("value"))
        .select(col("k_groups"), col("n"), round(col("msb"), 6).as("msb"),
          round(col("msw"), 6).as("msw"), round(col("k0"), 6).as("k0"),
          round(col("icc1"), 6).as("icc1"))),

    "g_odds_ratio" -> ((s, dir) =>
      // 2×2 epidemiology basics: exposed = odd users, outcome = error
      // event; OR/RR with Wald ln-scale bands, zero cells → null.
      Experiment.oddsRatio(table(s, dir, "events"),
          pmod(col("user_id"), lit(2)) === 1, col("event_type") === "error")
        .select(col("a"), col("b"), col("c"), col("d"),
          round(col("risk_exposed"), 6).as("risk_exposed"),
          round(col("risk_unexposed"), 6).as("risk_unexposed"),
          round(col("rr"), 6).as("rr"), round(col("rr_lo"), 6).as("rr_lo"),
          round(col("rr_hi"), 6).as("rr_hi"),
          round(col("or_"), 6).as("or_"),
          round(col("or_lo"), 6).as("or_lo"),
          round(col("or_hi"), 6).as("or_hi"))),

    "eval_token_f1" -> ((s, dir) =>
      // SQuAD-style token F1 + EM: reference = the same doc with every
      // lowercase 'e' turned into 'a' (translate is engine-identical),
      // so overlap = the words untouched by the substitution — partial
      // credit per doc, EM only on e-free docs. Multiset intersection
      // via the native zero-shuffle MultisetOverlap expression (the
      // (id, token)-keyed count join survives as tokenF1Exploded, the
      // parity baseline, and as the DuckDB twin's mechanism).
      graft.ops.Eval.tokenF1(
          table(s, dir, "documents").where(col("doc_id") < 400),
          col("doc_id"), col("text"), translate(col("text"), "e", "a"))
        .select(col("id").as("doc_id"), col("n_pred"), col("n_ref"),
          col("n_common"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"), col("exact_match"))
        .orderBy("doc_id")),

    "eval_bradley_terry" -> ((s, dir) => {
      // Preference-arena ratings over 8 "models": each event is one
      // pairwise judgment (i, j from event_id digits, i ≠ j); the
      // winner rule event_id % (i + j + 2) <= i makes higher-indexed
      // items win more — a deterministic, engine-replayable skill
      // gradient. 12 MM iterations; the twin recomputes the identical
      // trajectory as chained CTEs.
      val ev = table(s, dir, "events")
      val i = pmod(col("event_id"), lit(8L))
      val j = pmod(floor(col("event_id") / lit(8)).cast("long"), lit(8L))
      val win = when(pmod(col("event_id"), i + j + lit(2L)) <= i, i)
        .otherwise(j)
      val pairs = ev
        .select(i.as("__i"), j.as("__j"), win.as("__w"))
        .where(col("__i") =!= col("__j"))
        .select(concat(lit("m"), col("__w")).as("w"),
          concat(lit("m"), col("__i") + col("__j") - col("__w")).as("l"))
      graft.ops.Eval.bradleyTerry(pairs, col("w"), col("l"),
          iterations = 12)
        .select(col("item"), col("n_wins"), col("n_games"),
          round(col("rating"), 6).as("rating"), col("rank"))
        .orderBy("rank")
    }),

    "g_pass_at_k" -> ((s, dir) =>
      // Unbiased pass@5 over 500 synthetic "problems" of exactly 20
      // samples each (event_id % 500): correct = value > 40; the
      // C(n−c,k)/C(n,k) product replays term-by-term in the twin.
      graft.ops.Eval.passAtK(table(s, dir, "events"),
          pmod(col("event_id"), lit(500)).as("problem"),
          col("value") > 40.0, k = 5)
        .select(col("problem"), col("n"), col("c"),
          round(col("pass_at_k"), 6).as("pass_at_k"))
        .orderBy("problem")),

    "g_fleiss_kappa" -> ((s, dir) =>
      // Multi-rater agreement: 400 items × exactly 25 "raters"
      // (event_id % 400 — dense ids make the counts exactly equal),
      // category = event_type. The equal-n guard is load-bearing.
      graft.ops.Eval.fleissKappa(table(s, dir, "events"),
          pmod(col("event_id"), lit(400)), col("event_type"))
        .select(col("n_items"), col("n_raters"),
          round(col("p_bar"), 6).as("p_bar"),
          round(col("p_e"), 6).as("p_e"),
          round(col("kappa"), 6).as("kappa"))),

    "g_ridge_per_group" -> ((s, dir) =>
      // L2-shrunk sibling of g_ols_per_group: λ = 5e5 against per-flag
      // Sxx ≈ 4e6 shrinks the slope ~11% — visibly different from OLS at
      // 4 dp, same one-pass closed form.
      Experiment.ridgePerGroup(table(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          lambda = 500000.0)
        .select(col("grp"), col("n"), round(col("slope"), 4).as("slope"),
          round(col("intercept"), 4).as("intercept"),
          round(col("r2"), 6).as("r2"))
        .orderBy("grp")),

    "g_nelson_aalen" -> ((s, dir) => {
      // Cumulative-hazard twin of g_kaplan_meier: same per-user
      // whole-hour lifetimes and error terminal event.
      val per = table(s, dir, "events").groupBy("user_id").agg(
        ((max(col("ts")) - min(col("ts"))).cast("long") / lit(3600000000L))
          .cast("long").as("dur_h"),
        (sum(when(col("event_type") === "error", 1L).otherwise(0L)) > 0)
          .as("event"))
      Stats.nelsonAalen(per, col("dur_h"), col("event"))
    }),

    "g_ipw_ate" -> ((s, dir) =>
      // Stratified IPW ATE: treated = odd users, outcome = value, cells
      // = event_type × user-bucket (35 cells; single-arm cells drop and
      // are counted — the positivity diagnostic).
      Experiment.ipwAte(table(s, dir, "events"),
          pmod(col("user_id"), lit(2)) === 1, col("value"),
          Seq(col("event_type"), pmod(col("user_id"), lit(7))))
        .select(col("n_total"), col("n_cells"), col("n_overlap"),
          col("n_cells_dropped"), round(col("mu1"), 4).as("mu1"),
          round(col("mu0"), 4).as("mu0"), round(col("ate"), 4).as("ate"))),

    "g_anova" -> ((s, dir) =>
      // Multi-arm mean comparison: one-way F across the 5 event types.
      Stats.anovaF(table(s, dir, "events"), col("event_type"), col("value"))
        .select(col("k"), col("n"),
          round(col("ss_between"), 2).as("ss_between"),
          round(col("ss_within"), 2).as("ss_within"),
          col("df_between"), col("df_within"),
          round(col("f_stat"), 4).as("f_stat"))),

    "g_trend_test" -> ((s, dir) =>
      // Cochran–Armitage: is the error rate monotone in the value
      // century bucket? ONE fused row-level aggregation.
      Stats.cochranArmitage(table(s, dir, "events"),
          floor(col("value") / 100.0), (col("event_type") === "error").cast("int"))
        .select(col("n"), col("n_pos"), round(col("z"), 4).as("z"),
          round(col("t_num"), 4).as("t_num"),
          round(col("variance"), 4).as("variance"))),

    "g_brier_decomp" -> ((s, dir) =>
      // Murphy decomposition of the scored-events Brier: reliability /
      // resolution / uncertainty over 10 forecast bins + direct Brier.
      graft.ops.Calibration.brierDecomposition(scoredEvents(s, dir),
          col("y_true"), col("score"), bins = 10)
        .select(col("n"), col("n_bins"),
          round(col("reliability"), 6).as("reliability"),
          round(col("resolution"), 6).as("resolution"),
          round(col("uncertainty"), 6).as("uncertainty"),
          round(col("brier"), 6).as("brier"))),

    "g_lift_curve" -> ((s, dir) =>
      // Decile lift/gains on the scored events: response rate, lift vs
      // base, cumulative population and response shares from the best
      // bucket down.
      graft.ops.Curves.liftCurve(scoredEvents(s, dir), col("y_true"),
          col("score"), buckets = 10)
        .select(col("bucket"), col("n"), col("n_resp"),
          round(col("rate"), 6).as("rate"), round(col("lift"), 4).as("lift"),
          round(col("cum_pop_share"), 6).as("cum_pop_share"),
          round(col("cum_gain"), 6).as("cum_gain"))),

    "g_logrank" -> ((s, dir) => {
      // Do odd and even users' lifetimes differ? Same per-user
      // whole-hour durations and error terminal event as
      // g_kaplan_meier, split on user parity.
      val per = table(s, dir, "events").groupBy("user_id").agg(
        ((max(col("ts")) - min(col("ts"))).cast("long") / lit(3600000000L))
          .cast("long").as("dur_h"),
        (sum(when(col("event_type") === "error", 1L).otherwise(0L)) > 0)
          .as("event"))
        .withColumn("grp", concat(lit("arm_"), pmod(col("user_id"), lit(2))))
      Stats.logRank(per, col("dur_h"), col("event"), col("grp"),
          "arm_0", "arm_1")
        .select(col("observed_a"),
          round(col("expected_a"), 6).as("expected_a"),
          round(col("variance"), 6).as("variance"),
          round(col("chi2"), 4).as("chi2"))
    }),

    "g_cmh" -> ((s, dir) => {
      // Stratified conversion test: per-user purchase>250 conversion,
      // arms by parity, strata = user_id % 5 — the Simpson's-paradox-
      // robust chi-square + MH common odds ratio.
      val per = table(s, dir, "events").groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase"
          && col("value") > 250, 1).otherwise(0)).as("conv"))
        .withColumn("arm", concat(lit("arm_"), pmod(col("user_id"), lit(2))))
        .withColumn("stratum", pmod(col("user_id"), lit(5)))
      Experiment.cmh(per, col("stratum"), col("arm"), col("conv"),
          "arm_0", "arm_1")
        .select(col("n_strata"), col("n_informative"), col("observed_a"),
          round(col("expected_a"), 6).as("expected_a"),
          round(col("variance"), 6).as("variance"),
          round(col("chi2"), 4).as("chi2"),
          round(col("or_mh"), 4).as("or_mh"))
    }),

    "g_msprt" -> ((s, dir) =>
      // Always-valid sequential test: daily looks at click-vs-error
      // value means (genuinely different distributions, so the p-value
      // actually falls); τ² = 100 (effect prior on the tens scale).
      Experiment.msprt(table(s, dir, "events"), col("event_type"),
          expr("ts div 86400000000"), col("value"), "click", "error",
          tau2 = 100.0)
        .select(col("period"), col("n_a"), col("n_b"),
          round(col("mean_a"), 4).as("mean_a"),
          round(col("mean_b"), 4).as("mean_b"),
          round(col("delta"), 4).as("delta"), col("log_lambda"),
          round(col("p_always_valid"), 6).as("p_always_valid"))
        .orderBy("period")),

    "g_attribution" -> ((s, dir) => {
      // Last-touch revenue attribution: purchases credit the latest
      // non-purchase event of the same user within 24 h (ms clock);
      // out-of-window purchases report 'direct'.
      val ev = table(s, dir, "events")
      // event_id rides the tie-break RAW: max driver SF has event_id
      // < 2^20, and past that the op raises loudly — a pmod wrap would
      // instead collide (t, tie) keys and pick engine-dependent labels
      graft.ops.Sessionize.lastTouchAttribution(ev, col("user_id"),
          expr("ts div 1000"), col("event_id"),
          col("event_type") === "purchase", col("event_type"),
          col("value"), lookback = 86400000L)
        .groupBy(coalesce(col("touch_label"), lit("direct")).as("touch"))
        .agg(count(lit(1)).as("n_conversions"),
          round(sum(col("value")), 4).as("revenue"))
        .orderBy("touch")
    }),

    "g_quantile_ci" -> ((s, dir) =>
      // Distribution-free p90 bracket on event value: order-statistic
      // ranks nq ± z·sqrt(nq(1−q)) over the ROC-collapsed value table.
      graft.ops.Stats.quantileCI(table(s, dir, "events"), col("value"),
        q = 0.9)),

    "dq_benford" -> ((s, dir) =>
      // Fabrication screen on lineitem amounts: first-digit law with
      // integer-exact digit extraction (cents-string, never float log).
      DataQuality.benford(table(s, dir, "lineitem"),
          col("l_extendedprice"), scale = 2)
        .select(col("digit").cast("long").as("digit"), col("n_obs"),
          round(col("p_exp"), 6).as("p_exp"),
          round(col("share"), 6).as("share"),
          round(col("contrib"), 4).as("contrib"),
          round(col("chi2"), 2).as("chi2"))
        .orderBy("digit"))
  )

  val oracle: Map[String, String] = Map(
    "eval_token_f1" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS np,
        |    trim(regexp_replace(lower(translate(text, 'e', 'a')),
        |      '[^a-z0-9]+', ' ', 'g')) AS nr
        |  FROM documents WHERE doc_id < 400 AND text IS NOT NULL),
        |tp AS (
        |  SELECT doc_id, t, count(*) AS cp FROM (
        |    SELECT doc_id, unnest(string_split(np, ' ')) AS t FROM docs)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |tr AS (
        |  SELECT doc_id, t, count(*) AS cr FROM (
        |    SELECT doc_id, unnest(string_split(nr, ' ')) AS t FROM docs)
        |  WHERE length(t) > 0 GROUP BY 1, 2),
        |ov AS (
        |  SELECT coalesce(tp.doc_id, tr.doc_id) AS doc_id,
        |    CAST(sum(coalesce(cp, 0)) AS BIGINT) AS n_pred,
        |    CAST(sum(coalesce(cr, 0)) AS BIGINT) AS n_ref,
        |    CAST(sum(least(coalesce(cp, 0), coalesce(cr, 0))) AS BIGINT)
        |      AS n_common
        |  FROM tp FULL OUTER JOIN tr
        |    ON tp.doc_id = tr.doc_id AND tp.t = tr.t
        |  GROUP BY 1),
        |em AS (
        |  SELECT doc_id, CAST(np = nr AS BIGINT) AS exact_match FROM docs),
        |f AS (
        |  SELECT em.doc_id,
        |    coalesce(n_pred, 0) AS n_pred, coalesce(n_ref, 0) AS n_ref,
        |    coalesce(n_common, 0) AS n_common, exact_match,
        |    CASE WHEN coalesce(n_pred, 0) > 0
        |      THEN CAST(n_common AS DOUBLE) / n_pred END AS pr,
        |    CASE WHEN coalesce(n_ref, 0) > 0
        |      THEN CAST(n_common AS DOUBLE) / n_ref END AS rc
        |  FROM em LEFT JOIN ov ON em.doc_id = ov.doc_id)
        |SELECT doc_id, n_pred, n_ref, n_common,
        |  round(pr, 6) AS precision, round(rc, 6) AS recall,
        |  round(CASE WHEN n_pred = 0 OR n_ref = 0
        |      THEN CAST(exact_match AS DOUBLE)
        |    WHEN n_common = 0 THEN 0.0
        |    ELSE 2.0 * pr * rc / (pr + rc) END, 6) AS f1,
        |  exact_match
        |FROM f ORDER BY doc_id""".stripMargin,

    "eval_bradley_terry" -> graft.ops.Eval.bradleyTerrySql(
      """SELECT 'm' || CAST(CASE WHEN event_id % (i + j + 2) <= i
        |    THEN i ELSE j END AS VARCHAR) AS w,
        |  'm' || CAST(i + j - CASE WHEN event_id % (i + j + 2) <= i
        |    THEN i ELSE j END AS VARCHAR) AS l
        |FROM (SELECT event_id, event_id % 8 AS i,
        |        CAST(floor(event_id / 8) AS BIGINT) % 8 AS j
        |      FROM events) t
        |WHERE i <> j""".stripMargin, iterations = 12),

    "g_srm" ->
      """WITH obs AS (
        |  SELECT 'arm_' || CAST(user_id % 3 AS VARCHAR) AS arm,
        |         count(*) AS n_obs
        |  FROM events GROUP BY 1),
        |e AS (SELECT * FROM (VALUES ('arm_0'), ('arm_1'), ('arm_2')) t(arm)),
        |j AS (SELECT e.arm, coalesce(n_obs, 0) AS n_obs
        |      FROM e LEFT JOIN obs USING (arm)),
        |w AS (SELECT arm, n_obs,
        |        CAST(sum(n_obs) OVER () AS DOUBLE) * (1.0 / 3.0) AS n_exp,
        |        count(*) OVER () - 1 AS dof
        |      FROM j),
        |c AS (SELECT *,
        |        (n_obs - n_exp) * (n_obs - n_exp) / n_exp AS contrib
        |      FROM w)
        |SELECT arm, n_obs, round(n_exp, 4) AS n_exp,
        |  round(contrib, 6) AS contrib,
        |  round(sum(contrib) OVER (), 4) AS chi2, dof
        |FROM c ORDER BY arm""".stripMargin,

    "g_ab_conversion" ->
      """WITH per AS (
        |  SELECT user_id, 'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 250
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT
        |  count(*) FILTER (WHERE arm = 'arm_0') AS n_a,
        |  CAST(coalesce(sum(conv) FILTER (WHERE arm = 'arm_0'), 0) AS BIGINT) AS x_a,
        |  count(*) FILTER (WHERE arm = 'arm_1') AS n_b,
        |  CAST(coalesce(sum(conv) FILTER (WHERE arm = 'arm_1'), 0) AS BIGINT) AS x_b
        |  FROM per),
        |r AS (SELECT n_a, x_a, n_b, x_b,
        |  CAST(x_a AS DOUBLE) / n_a AS rate_a,
        |  CAST(x_b AS DOUBLE) / n_b AS rate_b,
        |  CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS p FROM s),
        |z AS (SELECT *, rate_b - rate_a AS lift,
        |  sqrt(rate_a * (1.0 - rate_a) / n_a
        |    + rate_b * (1.0 - rate_b) / n_b) AS se FROM r)
        |SELECT n_a, x_a, round(rate_a, 6) AS rate_a,
        |  n_b, x_b, round(rate_b, 6) AS rate_b,
        |  round(lift, 6) AS lift,
        |  round(lift / sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b)), 4) AS z,
        |  round(lift - 1.96 * se, 6) AS ci_lo,
        |  round(lift + 1.96 * se, 6) AS ci_hi
        |FROM z""".stripMargin,

    "g_cuped" ->
      s"""WITH per AS (
         |  SELECT user_id, 'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm,
         |    coalesce(sum(value) FILTER (WHERE epoch_us(ts) < $cutUs), 0.0) AS x,
         |    coalesce(sum(value) FILTER (WHERE epoch_us(ts) >= $cutUs), 0.0) AS y
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT covar_pop(x, y) AS cxy, var_pop(x) AS vx,
         |        avg(x) AS mx FROM per),
         |t AS (SELECT CASE WHEN vx > 0 THEN cxy / vx ELSE 0.0 END AS theta,
         |        mx FROM g),
         |adj AS (SELECT arm, y, y - theta * (x - mx) AS yadj, theta
         |        FROM per CROSS JOIN t)
         |SELECT arm, count(*) AS n, round(avg(y), 4) AS mean_y,
         |  round(avg(yadj), 4) AS mean_y_adj,
         |  round(var_samp(y), 2) AS var_y,
         |  round(var_samp(yadj), 2) AS var_y_adj,
         |  round(any_value(theta), 6) AS theta,
         |  round(CASE WHEN var_samp(y) > 0
         |    THEN 1.0 - var_samp(yadj) / var_samp(y) END, 6) AS var_reduction
         |FROM adj GROUP BY arm ORDER BY arm""".stripMargin,

    "g_did" ->
      s"""WITH s AS (SELECT
         |  avg(value)      FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) < $cutUs) AS m_c0,
         |  var_samp(value) FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) < $cutUs) AS v_c0,
         |  count(value)    FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) < $cutUs) AS n_c0,
         |  avg(value)      FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) >= $cutUs) AS m_c1,
         |  var_samp(value) FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) >= $cutUs) AS v_c1,
         |  count(value)    FILTER (WHERE user_id % 2 = 0 AND epoch_us(ts) >= $cutUs) AS n_c1,
         |  avg(value)      FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) < $cutUs) AS m_t0,
         |  var_samp(value) FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) < $cutUs) AS v_t0,
         |  count(value)    FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) < $cutUs) AS n_t0,
         |  avg(value)      FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) >= $cutUs) AS m_t1,
         |  var_samp(value) FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) >= $cutUs) AS v_t1,
         |  count(value)    FILTER (WHERE user_id % 2 = 1 AND epoch_us(ts) >= $cutUs) AS n_t1
         |  FROM events),
         |d AS (SELECT *, (m_t1 - m_t0) - (m_c1 - m_c0) AS did,
         |  sqrt(v_t1 / n_t1 + v_t0 / n_t0 + v_c1 / n_c1 + v_c0 / n_c0) AS se
         |  FROM s)
         |SELECT round(m_c0, 4) AS m_c0, round(m_c1, 4) AS m_c1,
         |  round(m_t0, 4) AS m_t0, round(m_t1, 4) AS m_t1,
         |  n_c0, n_c1, n_t0, n_t1,
         |  round(did, 4) AS did, round(se, 4) AS se,
         |  round(did - 1.96 * se, 4) AS ci_lo,
         |  round(did + 1.96 * se, 4) AS ci_hi
         |FROM d""".stripMargin,

    "g_ols_per_group" ->
      """WITH s AS (SELECT l_returnflag AS grp, count(*) AS n,
        |    covar_samp(l_quantity, l_extendedprice) AS cxy,
        |    var_samp(l_quantity) AS vx, var_samp(l_extendedprice) AS vy,
        |    avg(l_quantity) AS mx, avg(l_extendedprice) AS my
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1)
        |SELECT grp, n,
        |  round(CASE WHEN vx > 0 THEN cxy / vx END, 4) AS slope,
        |  round(my - (CASE WHEN vx > 0 THEN cxy / vx END) * mx, 4) AS intercept,
        |  round(CASE WHEN vx > 0 AND vy > 0
        |    THEN cxy * cxy / (vx * vy) END, 6) AS r2
        |FROM s ORDER BY grp""".stripMargin,

    "g_cronbach_alpha" ->
      """WITH per AS (
        |  SELECT user_id,
        |    round(avg(CASE WHEN event_type = 'click' THEN value END), 6)
        |      AS i1,
        |    round(avg(CASE WHEN event_type = 'view' THEN value END), 6)
        |      AS i2,
        |    round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6)
        |      AS i3,
        |    round(avg(CASE WHEN event_type = 'signup' THEN value END), 6)
        |      AS i4,
        |    round(avg(CASE WHEN event_type = 'error' THEN value END), 6)
        |      AS i5
        |  FROM events GROUP BY 1),
        |c AS (SELECT * FROM per
        |  WHERE i1 IS NOT NULL AND i2 IS NOT NULL AND i3 IS NOT NULL
        |    AND i4 IS NOT NULL AND i5 IS NOT NULL),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    var_samp(i1 + i2 + i3 + i4 + i5) AS vt,
        |    var_samp(i1) + var_samp(i2) + var_samp(i3) + var_samp(i4)
        |      + var_samp(i5) AS sv
        |  FROM c)
        |SELECT n, CAST(5 AS INT) AS k, round(sv, 4) AS sum_item_var,
        |  round(vt, 4) AS total_var,
        |  round(CASE WHEN vt > 0
        |    THEN 5.0 / 4.0 * (1.0 - sv / vt) END, 6) AS alpha
        |FROM agg""".stripMargin,

    "g_icc" ->
      """WITH byg AS (
        |  SELECT event_id % 400 AS g, count(*) AS ng, sum(value) AS s,
        |    sum(value * value) AS ss
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(s) / sum(ng) AS grand,
        |    sum(CAST(ng AS DOUBLE) * ng) AS sn2
        |  FROM byg),
        |agg AS (SELECT k, n, sn2,
        |    sum(ng * pow(s / ng - grand, 2)) AS ssb,
        |    sum(ss - s * s / ng) AS ssw
        |  FROM byg CROSS JOIN tot GROUP BY 1, 2, 3),
        |m AS (SELECT k AS k_groups, n, ssb / (k - 1) AS msb,
        |    CASE WHEN n > k THEN ssw / (n - k) END AS msw,
        |    (n - sn2 / n) / (k - 1) AS k0
        |  FROM agg)
        |SELECT k_groups, n, round(msb, 6) AS msb, round(msw, 6) AS msw,
        |  round(k0, 6) AS k0,
        |  round(CASE WHEN msw IS NOT NULL
        |      AND msb + (k0 - 1) * msw > 0
        |    THEN (msb - msw) / (msb + (k0 - 1) * msw) END, 6) AS icc1
        |FROM m""".stripMargin,

    "g_odds_ratio" ->
      """WITH cells AS (
        |  SELECT
        |    sum(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
        |      THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN user_id % 2 = 1 AND event_type != 'error'
        |      THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
        |      THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN user_id % 2 = 0 AND event_type != 'error'
        |      THEN 1 ELSE 0 END) AS d
        |  FROM events),
        |t AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |    CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |    a > 0 AND b > 0 AND c > 0 AND d > 0 AS ok,
        |    CAST(a AS DOUBLE) / (a + b) AS re,
        |    CAST(c AS DOUBLE) / (c + d) AS ru,
        |    ln(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c)) AS lo,
        |    sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d) AS seo,
        |    ln((CAST(a AS DOUBLE) / (a + b))
        |      / (CAST(c AS DOUBLE) / (c + d))) AS lr,
        |    sqrt(1.0/a - 1.0/(a + b) + 1.0/c - 1.0/(c + d)) AS ser
        |  FROM cells)
        |SELECT a, b, c, d,
        |  round(CASE WHEN a + b > 0 THEN re END, 6) AS risk_exposed,
        |  round(CASE WHEN c + d > 0 THEN ru END, 6) AS risk_unexposed,
        |  round(CASE WHEN ok THEN exp(lr) END, 6) AS rr,
        |  round(CASE WHEN ok THEN exp(lr - 1.96 * ser) END, 6) AS rr_lo,
        |  round(CASE WHEN ok THEN exp(lr + 1.96 * ser) END, 6) AS rr_hi,
        |  round(CASE WHEN ok THEN exp(lo) END, 6) AS or_,
        |  round(CASE WHEN ok THEN exp(lo - 1.96 * seo) END, 6) AS or_lo,
        |  round(CASE WHEN ok THEN exp(lo + 1.96 * seo) END, 6) AS or_hi
        |FROM t""".stripMargin,

    "g_pass_at_k" ->
      """WITH agg AS (
        |  SELECT event_id % 500 AS problem,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value > 40.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM events
        |  WHERE value IS NOT NULL -- NULL correctness rows are excluded
        |  GROUP BY 1              -- (neither pass nor fail), as in the op
        |  HAVING count(*) >= 5),
        |t AS (SELECT problem, n, c,
        |    product(CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))
        |      AS surv
        |  FROM agg, unnest(generate_series(0, 4)) AS u(i)
        |  GROUP BY 1, 2, 3)
        |SELECT problem, n, c, round(1.0 - surv, 6) AS pass_at_k
        |FROM t ORDER BY problem""".stripMargin,

    "g_fleiss_kappa" ->
      """WITH cells AS (
        |  SELECT event_id % 400 AS i, event_type AS c, count(*) AS n
        |  FROM events
        |  WHERE event_type IS NOT NULL GROUP BY 1, 2),
        |per AS (SELECT i, sum(n * n) AS ss, sum(n) AS ni
        |  FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(max(ni) AS BIGINT) AS nr FROM per),
        |pb AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |    CAST(max(nr) AS BIGINT) AS n_raters,
        |    avg(CAST(ss - ni AS DOUBLE) / (nr * (nr - 1.0))) AS p_bar
        |  FROM per CROSS JOIN nn),
        |pe AS (SELECT sum(CAST(nc AS DOUBLE) * nc)
        |      / (CAST(sum(nc) AS DOUBLE) * sum(nc)) AS p_e
        |  FROM (SELECT sum(n) AS nc FROM cells GROUP BY c))
        |SELECT n_items, n_raters, round(p_bar, 6) AS p_bar,
        |  round(p_e, 6) AS p_e,
        |  round((p_bar - p_e) / (1.0 - p_e), 6) AS kappa
        |FROM pb CROSS JOIN pe""".stripMargin,

    "g_ridge_per_group" ->
      """WITH s AS (SELECT l_returnflag AS grp, count(*) AS n,
        |    covar_samp(l_quantity, l_extendedprice) AS cxy,
        |    var_samp(l_quantity) AS vx, var_samp(l_extendedprice) AS vy,
        |    avg(l_quantity) AS mx, avg(l_extendedprice) AS my
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |c AS (SELECT grp, n, mx, my,
        |    cxy * (n - 1) AS sxy, vx * (n - 1) AS sxx, vy * (n - 1) AS syy
        |  FROM s),
        |f AS (SELECT grp, n, mx, my, sxy, sxx, syy,
        |    CASE WHEN sxx + 500000.0 > 0
        |      THEN sxy / (sxx + 500000.0) END AS b
        |  FROM c)
        |SELECT grp, n, round(b, 4) AS slope,
        |  round(my - b * mx, 4) AS intercept,
        |  round(CASE WHEN syy > 0
        |    THEN 1.0 - (syy - 2.0 * b * sxy + b * b * sxx) / syy END, 6)
        |    AS r2
        |FROM f ORDER BY grp""".stripMargin,

    "g_nelson_aalen" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000
        |      AS BIGINT) AS dur_h,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0 AS event
        |  FROM events GROUP BY 1),
        |byt AS (SELECT CAST(dur_h AS DOUBLE) AS t,
        |    sum(CASE WHEN event THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN event THEN 0 ELSE 1 END) AS c
        |  FROM per GROUP BY 1),
        |w AS (SELECT t, d, c,
        |    sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM byt),
        |s AS (SELECT t, d, c, n_risk,
        |    round(sum(CAST(d AS DOUBLE) / n_risk)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS h,
        |    sum(CAST(d AS DOUBLE)
        |        / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS v
        |  FROM w)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
        |  h AS cum_hazard, round(sqrt(v), 6) AS se,
        |  round(exp(-h), 6) AS survival_fh
        |FROM s WHERE d > 0 ORDER BY t""".stripMargin,

    "g_ipw_ate" ->
      """WITH c AS (
        |  SELECT event_type, user_id % 7 AS ub, count(*) AS n_c,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nt_c,
        |    coalesce(sum(value) FILTER (WHERE user_id % 2 = 1), 0.0) AS syt_c,
        |    coalesce(sum(value) FILTER (WHERE user_id % 2 = 0), 0.0) AS syc_c
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT CAST(sum(n_c) AS BIGINT) AS n_total,
        |    count(*) AS n_cells,
        |    CAST(sum(CASE WHEN nt_c > 0 AND nt_c < n_c THEN n_c ELSE 0 END)
        |      AS BIGINT) AS n_overlap,
        |    CAST(sum(CASE WHEN nt_c > 0 AND nt_c < n_c THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_cells_dropped,
        |    sum(CASE WHEN nt_c > 0 AND nt_c < n_c
        |      THEN syt_c * n_c / nt_c ELSE 0 END) AS s1,
        |    sum(CASE WHEN nt_c > 0 AND nt_c < n_c
        |      THEN syc_c * n_c / (n_c - nt_c) ELSE 0 END) AS s0
        |  FROM c)
        |SELECT n_total, n_cells, n_overlap, n_cells_dropped,
        |  round(s1 / n_overlap, 4) AS mu1, round(s0 / n_overlap, 4) AS mu0,
        |  round(s1 / n_overlap - s0 / n_overlap, 4) AS ate
        |FROM s""".stripMargin,

    "g_anova" ->
      """WITH g AS (SELECT event_type AS grp, count(*) AS n_g,
        |    sum(value) AS s_g, sum(value * value) AS ss_g
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |w AS (SELECT *, CAST(sum(n_g) OVER () AS BIGINT) AS nn,
        |    count(*) OVER () AS k,
        |    sum(s_g) OVER () / CAST(sum(n_g) OVER () AS BIGINT) AS grand
        |  FROM g),
        |s AS (SELECT max(k) AS k, max(nn) AS n,
        |    sum(n_g * (s_g / n_g - grand) * (s_g / n_g - grand)) AS ssb,
        |    sum(ss_g - s_g * s_g / n_g) AS ssw
        |  FROM w)
        |SELECT k, n, round(ssb, 2) AS ss_between,
        |  round(ssw, 2) AS ss_within,
        |  k - 1 AS df_between, n - k AS df_within,
        |  round((ssb / (k - 1)) / (ssw / (n - k)), 4) AS f_stat
        |FROM s""".stripMargin,

    "g_trend_test" ->
      """WITH b AS (
        |  SELECT floor(value / 100.0) AS s,
        |    CAST(event_type = 'error' AS INT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |a AS (SELECT count(*) AS n, sum(CAST(y AS DOUBLE)) AS x,
        |    sum(s) AS ssum, sum(s * s) AS s2,
        |    sum(s * CAST(y AS DOUBLE)) AS sy
        |  FROM b),
        |t AS (SELECT n, x, x / n AS p,
        |    sy - (x / n) * ssum AS t_num,
        |    (x / n) * (1.0 - x / n) * (s2 - ssum * ssum / n) AS variance
        |  FROM a)
        |SELECT n, CAST(x AS BIGINT) AS n_pos,
        |  round(CASE WHEN variance > 0 THEN t_num / sqrt(variance) END, 4)
        |    AS z,
        |  round(t_num, 4) AS t_num, round(variance, 4) AS variance
        |FROM t""".stripMargin,

    "g_brier_decomp" -> {
      s"""WITH sc AS (${Q.scoredEventsSql}),
         |b AS (SELECT least(CAST(floor(score * 10) AS INT), 9) AS bin,
         |    count(*) AS n_b, sum(score) AS sp,
         |    sum(CAST(y_true AS DOUBLE)) AS sy,
         |    sum((score - y_true) * (score - y_true)) AS sq
         |  FROM sc GROUP BY 1),
         |w AS (SELECT *, CAST(sum(n_b) OVER () AS BIGINT) AS nn,
         |    sum(sy) OVER () / CAST(sum(n_b) OVER () AS BIGINT) AS obar
         |  FROM b),
         |f AS (SELECT max(nn) AS n, count(*) AS n_bins,
         |    sum(n_b * (sp / n_b - sy / n_b) * (sp / n_b - sy / n_b))
         |      AS reln,
         |    sum(n_b * (sy / n_b - obar) * (sy / n_b - obar)) AS resn,
         |    max(obar) AS obar, sum(sq) AS sq
         |  FROM w)
         |SELECT n, n_bins, round(reln / n, 6) AS reliability,
         |  round(resn / n, 6) AS resolution,
         |  round(obar * (1.0 - obar), 6) AS uncertainty,
         |  round(sq / n, 6) AS brier
         |FROM f""".stripMargin
    },

    "g_lift_curve" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(score, 0.$i), 6) AS q$i").mkString(", ")
      val bins = (1 to 9).map(i =>
        s"(CASE WHEN score > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH sc AS (${Q.scoredEventsSql}),
         |bounds AS (SELECT $qs FROM sc),
         |byb AS (SELECT $bins AS bucket, count(*) AS n,
         |    sum(CAST(y_true AS DOUBLE)) AS resp
         |  FROM sc CROSS JOIN bounds GROUP BY 1),
         |w AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS nn,
         |    sum(resp) OVER () AS rr,
         |    sum(n) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING)
         |      AS cn,
         |    sum(resp) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING)
         |      AS cr
         |  FROM byb)
         |SELECT bucket, n, CAST(resp AS BIGINT) AS n_resp,
         |  round(resp / n, 6) AS rate,
         |  round(CASE WHEN rr > 0 THEN (resp / n) / (rr / nn) END, 4)
         |    AS lift,
         |  round(cn / nn, 6) AS cum_pop_share,
         |  round(CASE WHEN rr > 0 THEN cr / rr END, 6) AS cum_gain
         |FROM w ORDER BY bucket DESC""".stripMargin
    },

    "g_logrank" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000
        |      AS BIGINT) AS dur_h,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0 AS event,
        |    user_id % 2 = 0 AS ga
        |  FROM events GROUP BY 1),
        |byt AS (SELECT CAST(dur_h AS DOUBLE) AS t,
        |    sum(CASE WHEN ga AND event THEN 1 ELSE 0 END) AS d_a,
        |    sum(CASE WHEN NOT ga AND event THEN 1 ELSE 0 END) AS d_b,
        |    sum(CASE WHEN ga THEN 1 ELSE 0 END) AS tot_a,
        |    sum(CASE WHEN ga THEN 0 ELSE 1 END) AS tot_b
        |  FROM per GROUP BY 1),
        |w AS (SELECT t, d_a, d_b,
        |    sum(tot_a) OVER () - coalesce(sum(tot_a) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_a,
        |    sum(tot_b) OVER () - coalesce(sum(tot_b) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_b
        |  FROM byt),
        |r AS (SELECT *, d_a + d_b AS d, n_a + n_b AS n FROM w
        |      WHERE d_a + d_b > 0),
        |s AS (SELECT
        |    CAST(sum(d_a) AS BIGINT) AS observed_a,
        |    sum(CAST(d AS DOUBLE) * n_a / n) AS expected_a,
        |    sum(CASE WHEN n > 1 THEN CAST(d AS DOUBLE) * n_a * n_b * (n - d)
        |      / (CAST(n AS DOUBLE) * n * (n - 1)) ELSE 0.0 END) AS variance
        |  FROM r)
        |SELECT observed_a, round(expected_a, 6) AS expected_a,
        |  round(variance, 6) AS variance,
        |  round((observed_a - expected_a) * (observed_a - expected_a)
        |    / variance, 4) AS chi2
        |FROM s""".stripMargin,

    "g_cmh" ->
      """WITH per AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 250
        |      THEN 1 ELSE 0 END) AS conv,
        |    user_id % 2 = 0 AS ga, user_id % 5 AS stratum
        |  FROM events GROUP BY 1),
        |bys AS (SELECT stratum,
        |    sum(CASE WHEN ga THEN 1 ELSE 0 END) AS n_a,
        |    coalesce(sum(conv) FILTER (WHERE ga), 0) AS x_a,
        |    sum(CASE WHEN ga THEN 0 ELSE 1 END) AS n_b,
        |    coalesce(sum(conv) FILTER (WHERE NOT ga), 0) AS x_b
        |  FROM per GROUP BY 1),
        |k AS (SELECT *, CAST(n_a + n_b AS DOUBLE) AS n,
        |    CAST(x_a + x_b AS DOUBLE) AS m1,
        |    CAST(n_a + n_b AS DOUBLE) - CAST(x_a + x_b AS DOUBLE) AS m0
        |  FROM bys),
        |inf AS (SELECT *,
        |    (n_a > 0 AND n_b > 0 AND m1 > 0 AND m0 > 0) AS ok FROM k),
        |s AS (SELECT count(*) AS n_strata,
        |    CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_informative,
        |    CAST(coalesce(sum(x_a) FILTER (WHERE ok), 0) AS BIGINT)
        |      AS observed_a,
        |    coalesce(sum(CAST(n_a AS DOUBLE) * m1 / n) FILTER (WHERE ok),
        |      0.0) AS expected_a,
        |    coalesce(sum(CAST(n_a AS DOUBLE) * n_b * m1 * m0
        |      / (n * n * (n - 1))) FILTER (WHERE ok), 0.0) AS variance,
        |    coalesce(sum(CAST(x_a AS DOUBLE) * (n_b - x_b) / n)
        |      FILTER (WHERE ok), 0.0) AS onum,
        |    coalesce(sum(CAST(x_b AS DOUBLE) * (n_a - x_a) / n)
        |      FILTER (WHERE ok), 0.0) AS oden
        |  FROM inf)
        |SELECT n_strata, n_informative, observed_a,
        |  round(expected_a, 6) AS expected_a,
        |  round(variance, 6) AS variance,
        |  round(CASE WHEN variance > 0 THEN
        |    (observed_a - expected_a) * (observed_a - expected_a)
        |      / variance END, 4) AS chi2,
        |  round(CASE WHEN oden > 0 THEN onum / oden END, 4) AS or_mh
        |FROM s""".stripMargin,

    "g_msprt" ->
      """WITH byp AS (
        |  SELECT epoch_us(ts) // 86400000000 AS period,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_a,
        |    coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0.0) AS s_a,
        |    coalesce(sum(value * value) FILTER (WHERE event_type = 'click'), 0.0) AS ss_a,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_b,
        |    coalesce(sum(value) FILTER (WHERE event_type = 'error'), 0.0) AS s_b,
        |    coalesce(sum(value * value) FILTER (WHERE event_type = 'error'), 0.0) AS ss_b
        |  FROM events WHERE event_type IN ('click', 'error') GROUP BY 1),
        |cum AS (SELECT period,
        |    CAST(sum(n_a) OVER w AS BIGINT) AS cn_a,
        |    sum(s_a) OVER w AS cs_a, sum(ss_a) OVER w AS css_a,
        |    CAST(sum(n_b) OVER w AS BIGINT) AS cn_b,
        |    sum(s_b) OVER w AS cs_b, sum(ss_b) OVER w AS css_b
        |  FROM byp
        |  WINDOW w AS (ORDER BY period ROWS UNBOUNDED PRECEDING)),
        |st AS (SELECT *, cs_a / cn_a AS mean_a, cs_b / cn_b AS mean_b,
        |    ((css_a - cs_a * cs_a / cn_a) + (css_b - cs_b * cs_b / cn_b))
        |      / (cn_a + cn_b - 2) AS variance
        |  FROM cum),
        |lam AS (SELECT *, variance * (1.0 / cn_a + 1.0 / cn_b) AS se2,
        |    mean_b - mean_a AS delta FROM st),
        |ll AS (SELECT *,
        |    CASE WHEN cn_a >= 2 AND cn_b >= 2 AND se2 > 0 THEN
        |      round(0.5 * ln(se2 / (se2 + 100.0))
        |        + delta * delta * 100.0 / (2.0 * se2 * (se2 + 100.0)), 6)
        |    END AS log_lambda
        |  FROM lam)
        |SELECT period, cn_a AS n_a, cn_b AS n_b,
        |  round(CASE WHEN cn_a > 0 THEN mean_a END, 4) AS mean_a,
        |  round(CASE WHEN cn_b > 0 THEN mean_b END, 4) AS mean_b,
        |  round(CASE WHEN cn_a >= 2 AND cn_b >= 2 THEN delta END, 4) AS delta,
        |  log_lambda,
        |  round(exp(-max(greatest(0.0, coalesce(log_lambda, 0.0)))
        |    OVER (ORDER BY period ROWS UNBOUNDED PRECEDING)), 6)
        |    AS p_always_valid
        |FROM ll ORDER BY period""".stripMargin,

    "g_attribution" ->
      """WITH base AS (
        |  SELECT user_id AS k, epoch_us(ts) // 1000 AS t,
        |    event_id AS tie, event_type = 'purchase' AS conv,
        |    event_type AS label, value
        |  FROM events),
        |enc AS (SELECT *, t * 1048576 + tie AS e FROM base),
        |wnd AS (SELECT k, t, tie, conv, value,
        |    max(CASE WHEN NOT conv THEN e END) OVER (PARTITION BY k
        |      ORDER BY t, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS te,
        |    arg_max(CASE WHEN NOT conv THEN label END,
        |            CASE WHEN NOT conv THEN e END) OVER (PARTITION BY k
        |      ORDER BY t, tie
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tl
        |  FROM enc),
        |j AS (SELECT k, t, value, tl, te // 1048576 AS tt,
        |        (te IS NOT NULL AND t - (te // 1048576) <= 86400000) AS inw
        |      FROM wnd WHERE conv)
        |SELECT coalesce(CASE WHEN inw THEN tl END, 'direct') AS touch,
        |  count(*) AS n_conversions, round(sum(value), 4) AS revenue
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_quantile_ci" ->
      """WITH byv AS (SELECT value AS v, count(*) AS c FROM events
        |        WHERE value IS NOT NULL GROUP BY 1),
        |r AS (SELECT v,
        |        CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS cum,
        |        CAST(sum(c) OVER () AS BIGINT) AS n
        |      FROM byv),
        |-- (1.0 - 0.9) spelled out, NOT 0.1: the Spark side computes the
        |-- complement in IEEE doubles (= 0.09999999999999998) and the
        |-- rank floors must see the identical product
        |k AS (SELECT *, n * CAST(0.9 AS DOUBLE) AS nq,
        |        1.96 * sqrt(n * CAST(0.9 AS DOUBLE)
        |          * (CAST(1.0 AS DOUBLE) - CAST(0.9 AS DOUBLE))) AS half
        |      FROM r),
        |b AS (SELECT *,
        |        greatest(1, CAST(floor(nq - half) AS BIGINT)) AS rlo,
        |        CAST(ceil(nq) AS BIGINT) AS rmid,
        |        least(n, CAST(ceil(nq + half) AS BIGINT)) AS rhi
        |      FROM k)
        |SELECT CAST(0.9 AS DOUBLE) AS q, max(n) AS n,
        |  max(rlo) AS rank_lo, max(rmid) AS rank_mid, max(rhi) AS rank_hi,
        |  min(CASE WHEN cum >= rlo THEN v END) AS ci_lo,
        |  min(CASE WHEN cum >= rmid THEN v END) AS estimate,
        |  min(CASE WHEN cum >= rhi THEN v END) AS ci_hi
        |FROM b""".stripMargin,

    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  -- isnan mirror: both engines order NaN above every number,
        |  -- so "> 0" alone would admit it on either side
        |  FROM lineitem WHERE l_extendedprice > 0
        |    AND NOT isnan(l_extendedprice)),
        |o AS (SELECT digit, count(*) AS n_obs FROM d
        |      WHERE digit >= 1 GROUP BY 1),
        |sp AS (SELECT CAST(r AS INT) AS digit,
        |         log10(1.0 + 1.0 / r) AS p_exp
        |       FROM (SELECT unnest(range(1, 10)) AS r)),
        |j AS (SELECT sp.digit, coalesce(n_obs, 0) AS n_obs, p_exp
        |      FROM sp LEFT JOIN o USING (digit)),
        |w AS (SELECT *, CAST(sum(n_obs) OVER () AS DOUBLE) AS n FROM j),
        |c AS (SELECT *,
        |        (n_obs - n * p_exp) * (n_obs - n * p_exp) / (n * p_exp)
        |          AS contrib
        |      FROM w)
        |SELECT CAST(digit AS BIGINT) AS digit, n_obs,
        |  round(p_exp, 6) AS p_exp, round(n_obs / n, 6) AS share,
        |  round(contrib, 4) AS contrib,
        |  round(sum(contrib) OVER (), 2) AS chi2
        |FROM c ORDER BY digit""".stripMargin
  )
}
