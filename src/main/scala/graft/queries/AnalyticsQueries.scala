package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Sessionize, Stats, TextOps}
import graft.queries.Q._

/** Analytic surface beyond plain group-aggregate: exact percentiles,
  * fixed-width histograms, ROLLUP super-aggregates, PIVOT, mutual
  * information, and RAG document chunking. All hash-oracled.
  */
object AnalyticsQueries {

  /** Shared hourly mean-value series for the trend family (g_mann_kendall
    * / g_theil_sen / g_changepoint): epoch-hour bins, means rounded to
    * 6 dp so both engines hand the trend ops bit-identical series. */
  private def hourlySeries(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    table(s, dir, "events")
      .where(col("value").isNotNull)
      .groupBy((col("ts") / lit(3600000000L)).cast("long").as("h"))
      .agg(round(avg("value"), 6).as("mv"))

  val queries: Map[String, QueryFn] = Map(
    "layout_zorder" -> ((s, dir) => {
      // Morton z-order key over two bucketed event dimensions — the
      // multi-dim layout key (sort 100 TB by this; every file's footer
      // stays tight on BOTH dims). Top-100 keyed rows pin the exact
      // interleaving arithmetic against the DuckDB twin.
      val e = table(s, dir, "events")
      val x = col("user_id") % 256
      val y = floor(col("value") * 100).cast("long") % 256
      e.select(col("event_id"),
          graft.ops.Skew.zorderKey(Seq(x, y), 8).as("zkey"))
        .orderBy(col("zkey"), col("event_id")).limit(100)
    }),

    "g_psi" -> ((s, dir) =>
      // Population Stability Index of `value` between the view (reference)
      // and error (current) event slices — decile bins fitted on the
      // reference only, Laplace alpha = 0.5 over the 10-bin domain.
      Stats.psi(table(s, dir, "events"), col("value"), col("event_type"),
          ref = "view", cur = "error", k = 10, alpha = 0.5)
        .select(round(col("psi"), 6).as("psi"), col("n_ref"), col("n_cur"))),

    "g_robust_scale" -> ((s, dir) => {
      // Median/MAD robust z-scores of `value`, per-type moments of the
      // scaled column (fences fitted once on the whole frame).
      val z = Stats.robustScale(table(s, dir, "events"), col("value"))
      z.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("robust_z"), 6).as("avg_z"),
          round(max(abs(col("robust_z"))), 6).as("max_abs_z"))
        .orderBy("event_type")
    }),

    "g_k_anonymity" -> ((s, dir) =>
      // Privacy audit: (lang, source) quasi-identifier combos with the
      // under-k re-identification flag (k = 8 so both flag values occur).
      Stats.kAnonymity(table(s, dir, "documents"),
          Seq(col("lang"), col("source")), k = 8)
        .orderBy("lang", "source")),

    "g_l_diversity" -> ((s, dir) =>
      // Beyond-k privacy audit: per-lang diversity of the `source`
      // attribute — distinct-l flag (l = 18 so both flag values occur)
      // plus the entropy form via the cancellation-free
      // ln(n) − Σ c·ln(c)/n identity that both engines replay exactly.
      Stats.lDiversity(table(s, dir, "documents"),
          Seq("lang"), "source", l = 18)
        .select(col("lang"), col("n"), col("n_sensitive"),
          round(col("entropy"), 6).as("entropy"), col("at_risk"))
        .orderBy("lang")),

    "g_interval_score" -> ((s, dir) => {
      // Proper scoring of the g_conformal bands on the test third: the
      // metric that ranks interval producers where coverage alone can be
      // gamed by width. Same fixture as g_conformal (α = 0.125).
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val model = ev.where(col("event_id") % 3 === 0)
        .groupBy("event_type").agg(round(avg("value"), 6).as("yhat"))
        // broadcast-joined twice (calibration + test preds): fit once (r12)
        .localCheckpoint(false)
      def pred(df: org.apache.spark.sql.DataFrame) =
        df.join(broadcast(model), "event_type")
      val qhat = Stats.conformalFit(pred(ev.where(col("event_id") % 3 === 1)),
        col("value"), col("yhat"), alpha = 0.125)
      val test = Stats.conformalApply(pred(ev.where(col("event_id") % 3 === 2)),
        col("value"), col("yhat"), qhat)
      Stats.intervalScore(test, col("value"), col("conf_lo"), col("conf_hi"),
        alpha = 0.125)
    }),

    "g_cluster_eval" -> ((s, dir) =>
      // Dedup-clustering eval: pred = user_id % 6 merges truth classes
      // (user_id % 12) pairwise, so completeness = 1 (every truth class
      // lives in one cluster) while homogeneity < 1 (each cluster holds
      // two classes) — the asymmetry the V-measure exists to expose.
      Stats.clusterAgreement(table(s, dir, "events"),
        col("user_id") % 6, col("user_id") % 12)),

    "g_ess" -> ((s, dir) =>
      // Importance-weight diagnostics over a deterministic skewed weight
      // column: Kish ESS, ESS ratio, and the heaviest row's weight share.
      Stats.effectiveSampleSize(table(s, dir, "events"),
        (lit(1) + col("event_id") % 9) / 3.0)),

    "g_conformal" -> ((s, dir) => {
      // Split conformal: per-type mean model on the train third, q̂ =
      // ceil((n+1)·0.875)-th smallest |residual| on the calibration
      // third (α = 0.125 — exactly binary, no decimal-parse skew), bands
      // applied + coverage audited on the test third.
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val model = ev.where(col("event_id") % 3 === 0)
        .groupBy("event_type").agg(round(avg("value"), 6).as("yhat"))
      def pred(df: org.apache.spark.sql.DataFrame) =
        df.join(broadcast(model), "event_type")
      val qhat = Stats.conformalFit(pred(ev.where(col("event_id") % 3 === 1)),
        col("value"), col("yhat"), alpha = 0.125)
      Stats.conformalApply(pred(ev.where(col("event_id") % 3 === 2)),
          col("value"), col("yhat"), qhat)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("conf_covered").cast("long")).as("n_covered"),
          round(avg(col("conf_covered").cast("double")), 6).as("coverage"))
        .withColumn("qhat", round(lit(qhat), 6))
        .orderBy("event_type")
    }),

    "g_conformal_grouped" -> ((s, dir) => {
      // Group-conditional conformal: per-group rank-k radius from each
      // group's own calibration residuals; `tiny` (event_id < 10, 3
      // calibration rows) is too small for rank ceil((n+1)·0.875) and
      // must surface a NULL radius, not a shrunk one.
      val ev = table(s, dir, "events").select(col("event_id"),
        when(col("event_id") < 10, "tiny").otherwise(col("event_type")).as("g"),
        col("value"))
      val model = ev.where(col("event_id") % 3 === 0)
        .groupBy("g").agg(round(avg("value"), 6).as("yhat"))
      val cal = ev.where(col("event_id") % 3 === 1).join(broadcast(model), "g")
      Stats.conformalFitGrouped(cal, col("g"), col("value"), col("yhat"),
          alpha = 0.125)
        .select(col("grp").as("g"), col("n"), round(col("qhat"), 6).as("qhat"))
        .orderBy("g")
    }),

    "g_bradley_terry" -> ((s, dir) => {
      // BT preference ratings (20 MM rounds) from a synthetic arena
      // whose ground truth IS Bradley–Terry: the integer-mod draw gives
      // P(a beats b) = (a+1)/(a+b+2), i.e. strengths ∝ item index + 1.
      // Runs on the ONE Bradley–Terry implementation ([[Eval
      // .bradleyTerry]] — gate-probe-before-collect, Ford condition
      // enforced); the twin recomputes the identical MM trajectory as
      // chained CTEs. A second arena shape next to `eval_bradley_terry`
      // (5 items / different winner rule / 20 iterations vs 8 / 12).
      val a = col("event_id") % 5
      val b = (col("event_id") % 5 + 1 + col("user_id") % 4) % 5
      val aw = col("user_id") % (a + b + lit(2)) < a + 1
      val g = table(s, dir, "events").select(
        concat(lit("m"), when(aw, a).otherwise(b)).as("w"),
        concat(lit("m"), when(aw, b).otherwise(a)).as("l"))
      graft.ops.Eval.bradleyTerry(g, col("w"), col("l"), iterations = 20)
        .select(col("item"), col("n_wins"), col("n_games"),
          round(col("rating"), 6).as("rating"), col("rank"))
        .orderBy("rank")
    }),

    "g_mondrian" -> ((s, dir) => {
      // Mondrian k-anonymization over (value, user_id % 97), k = 100:
      // the released leaf table — every box holds >= k rows by
      // construction. The dynamic twin re-assigns every row to the
      // literal leaf boxes in DuckDB and recomputes n / min / max — a
      // mismatch would mean overlapping or leaky boxes.
      val src = table(s, dir, "events").select(col("value"),
        (col("user_id") % 97).cast("double").as("uid"))
      val m = graft.ops.Mondrian.fit(src, Seq("value", "uid"), k = 100)
      graft.ops.Mondrian(src, m)
        .groupBy("pid", "value_lo", "value_hi", "uid_lo", "uid_hi")
        .agg(count(lit(1)).as("n"))
        .select(col("pid"), col("n"),
          round(col("value_lo"), 6).as("value_lo"),
          round(col("value_hi"), 6).as("value_hi"),
          round(col("uid_lo"), 6).as("uid_lo"),
          round(col("uid_hi"), 6).as("uid_hi"),
          (col("n") >= 100).as("ok_k"))
        .orderBy("pid")
    }),

    "g_t_closeness" -> ((s, dir) =>
      // Third leg of the privacy triad: per-lang distance between the
      // group's source distribution and the corpus-wide one — TVD
      // (categorical) and ordered EMD over the 20 sources in sort order.
      // at_risk gated on the ordered EMD, t = 0.04, so both flag values
      // occur at sf0.01 (de/fr over, en/es/zh under).
      Stats.tCloseness(table(s, dir, "documents"),
          Seq("lang"), "source", t = 0.04, ordered = true)
        .orderBy("lang")),

    "g_mannwhitney" -> ((s, dir) =>
      // Nonparametric two-sample test on skewed event values: click vs
      // view, midranks on ties (6.5k distinct values over 4k rows), the
      // tie-corrected normal z. Rows collapse to one count per distinct
      // value before any window.
      Stats.mannWhitneyU(table(s, dir, "events"), col("value"),
        col("event_type"), a = "click", b = "view")),

    "g_kruskal_wallis" -> ((s, dir) =>
      // k-sample location test across ALL FIVE event types at once (the
      // nonparametric ANOVA): midranks on the distinct-value collapse,
      // tie-corrected H.
      graft.ops.RankTests.kruskalWallis(table(s, dir, "events"),
          col("value"), col("event_type"))
        .select(col("k"), col("n"), round(col("h"), 6).as("h"),
          round(col("h_tie_corrected"), 6).as("h_tie_corrected"))),

    "g_kendall_tau" -> ((s, dir) =>
      // Concordance-based rank correlation between two coarse value
      // bins (correlated by construction, heavy ties — the tau-b tie
      // denominators are load-bearing): cells² pair join over ≤ ~60
      // distinct (x, y) cells, never rows².
      graft.ops.RankTests.kendallTau(table(s, dir, "events"),
          floor(col("value") / 50.0),
          floor(col("value") / 80.0) + pmod(col("event_id"), lit(3)))
        .select(col("n"), col("n_concordant"), col("n_discordant"),
          round(col("tau_b"), 6).as("tau_b"))),

    "g_mcnemar" -> ((s, dir) =>
      // Paired model comparison on the same rows: truth = high-value
      // event; "model A" and "model B" are two deterministic perturbed
      // thresholds, so all four agreement cells fill and the discordant
      // counts differ.
      graft.ops.Eval.mcnemar(table(s, dir, "events"),
          col("value") > 150.0,
          col("value") + pmod(col("event_id"), lit(20)) > 155.0,
          col("value") + pmod(col("user_id"), lit(30)) > 160.0)
        .select(col("n"), col("n_both_correct"), col("n_a_only"),
          col("n_b_only"), col("n_both_wrong"),
          round(col("acc_a"), 6).as("acc_a"),
          round(col("acc_b"), 6).as("acc_b"),
          round(col("chi2_cc"), 6).as("chi2_cc"))),

    "g_brown_forsythe" -> ((s, dir) =>
      // Robust variance-equality across event types: ANOVA F on
      // |value − per-type median| (exact interpolated median both
      // engines).
      graft.ops.RankTests.brownForsythe(table(s, dir, "events"),
          col("value"), col("event_type"))
        .select(col("k"), col("n"), round(col("ss_between"), 4)
            .as("ss_between"), round(col("ss_within"), 4).as("ss_within"),
          col("df_between"), col("df_within"),
          round(col("f_stat"), 6).as("f_stat"))),

    "g_wilcoxon_signed" -> ((s, dir) => {
      // Paired location test: per-user mean click value vs mean view
      // value (150 users at sf0.01 have both), means rounded to 6 dp on
      // both engines so the |d| rank order is float-stable; zero-drop +
      // midranks + tie-corrected z.
      val per = table(s, dir, "events")
        .where(col("event_type").isin("click", "view"))
        .groupBy("user_id").agg(
          round(avg(when(col("event_type") === "click", col("value"))), 6)
            .as("x"),
          round(avg(when(col("event_type") === "view", col("value"))), 6)
            .as("y"))
        .where(col("x").isNotNull && col("y").isNotNull)
      graft.ops.RankTests.wilcoxonSignedRank(per, col("x"), col("y"))
        .select(col("n"), round(col("w_plus"), 4).as("w_plus"),
          round(col("w_minus"), 4).as("w_minus"), round(col("z"), 6).as("z"))
    }),

    "g_effect_sizes" -> ((s, dir) =>
      // Cohen's d / Hedges' g / Cliff's delta for click vs view — the
      // "is it LARGE?" companion to g_mannwhitney on the same slice.
      graft.ops.RankTests.effectSizes(table(s, dir, "events"),
          col("value"), col("event_type"), a = "click", b = "view")
        .select(col("n_a"), col("n_b"),
          round(col("cohens_d"), 6).as("cohens_d"),
          round(col("hedges_g"), 6).as("hedges_g"),
          round(col("cliffs_delta"), 6).as("cliffs_delta"))),

    "g_mann_kendall" -> ((s, dir) =>
      // Monotone-trend test on the hourly mean-value series (720 points
      // over the 30-day window; means rounded to 6 dp so the pairwise
      // sign pattern is engine-exact).
      graft.ops.Trend.mannKendall(hourlySeries(s, dir), col("h"), col("mv"))
        .select(col("n"), col("s"), round(col("var_s"), 4).as("var_s"),
          round(col("z"), 6).as("z"))),

    "g_theil_sen" -> ((s, dir) =>
      // Robust trend line over the same hourly series: median of 259k
      // pairwise slopes + median-residual intercept (interpolated median
      // = quantile_cont both engines).
      graft.ops.Trend.theilSen(hourlySeries(s, dir), col("h"), col("mv"))
        .select(col("n"), round(col("slope"), 9).as("slope"),
          round(col("intercept"), 4).as("intercept"))),

    "g_changepoint" -> ((s, dir) =>
      // Single mean-shift changepoint (binary-segmentation AMOC) over
      // the hourly series: argmax of the √(k(n−k)/n)·|Δmean| statistic,
      // earliest split on ties.
      graft.ops.Trend.changepointMeanShift(hourlySeries(s, dir),
          col("h"), col("mv"))
        .select(col("split_x"), col("k_left"), col("n"),
          round(col("mean_left"), 6).as("mean_left"),
          round(col("mean_right"), 6).as("mean_right"),
          round(col("stat"), 6).as("stat"))),

    "g_seasonality" -> ((s, dir) =>
      // Hour-of-day seasonal decomposition of event values: additive
      // index (mean − grand mean) and multiplicative ratio per hour 0-23.
      // hour-of-day from the canonical epoch-µs ts (UTC) — matches
      // DuckDB's hour(ts) on the naive UTC timestamp
      graft.ops.Trend.seasonalIndex(table(s, dir, "events"),
          pmod((col("ts") / lit(3600000000L)).cast("long"), lit(24L))
            .cast("int"),
          col("value"))
        .select(col("season"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("index_add"), 6).as("index_add"),
          round(col("index_mult"), 6).as("index_mult"))),

    "g_rmst" -> ((s, dir) => {
      // Restricted mean survival time at τ = 200h over the same per-user
      // lifetime frame as g_kaplan_meier — the area under the KM step
      // curve, the hazard-shape-free retention scalar.
      val per = table(s, dir, "events").groupBy("user_id").agg(
        ((max(col("ts")) - min(col("ts"))).cast("long") / lit(3600000000L))
          .cast("long").as("dur_h"),
        (sum(when(col("event_type") === "error", 1L).otherwise(0L)) > 0)
          .as("event"))
      Stats.rmst(per, col("dur_h"), col("event"), tau = 200.0)
        .select(col("tau"), round(col("rmst"), 6).as("rmst"),
          col("n_event_times_used"))
    }),

    "g_cum_incidence" -> ((s, dir) => {
      // Competing risks: per user, the FIRST terminal event among
      // error/purchase sets the cause; users with neither are censored
      // at their observed span. Aalen–Johansen CIF per cause over the
      // whole-hour duration table — per-cause "1 − KM" would overstate
      // both risks; the CIFs here sum to 1 − S by construction.
      val ev = table(s, dir, "events")
      val per = ev.groupBy("user_id").agg(
        min(col("ts")).as("t0"), max(col("ts")).as("t1"),
        min(when(col("event_type") === "error", col("ts"))).as("te"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      val first = when(col("te").isNotNull
          && (col("tp").isNull || col("te") <= col("tp")), col("te"))
        .when(col("tp").isNotNull, col("tp"))
      val cause = when(col("te").isNotNull
          && (col("tp").isNull || col("te") <= col("tp")), "error")
        .when(col("tp").isNotNull, "purchase")
      val dur = ((coalesce(first, col("t1")) - col("t0"))
        / lit(3600000000L)).cast("long")
      Stats.cumulativeIncidence(
          per.select(dur.as("dur_h"), cause.as("cause")),
          col("dur_h"), col("cause"))
        .select(col("t"), col("cause"), col("n_risk"), col("d_cause"),
          round(col("cif"), 6).as("cif"))
        .orderBy("cause", "t")
    }),

    "dq_profile_compare" -> ((s, dir) =>
      // Snapshot drift gate: full events vs the error-free slice.
      // distinctRelTol = 0.15 makes event_type's 5 → 4 distinct drop
      // (exactly 0.2) FAIL — a gate that can't fail proves nothing.
      // Sliced form (r12): both sides are slices of ONE scan, so the
      // two profileTable passes (each with its own countDistinct
      // Expand) fuse into a single conditional aggregation — same
      // counts, same verdicts, half the scans.
      graft.ops.DataQuality.profileCompareSlices(
          table(s, dir, "events"),
          lit(true), col("event_type") =!= "error",
          Seq("value", "user_id", "event_type"),
          nullFracTol = 0.01, meanRelTol = 0.05, distinctRelTol = 0.15,
          // exact distinct ONLY here: the DuckDB twin counts exactly,
          // so the oracle face needs the precise counter; production
          // default is the HLL sketch (36.6 s vs 382.8 s at 100M)
          exact = true)
        .select(col("col_name"), col("n_a"), col("n_b"),
          round(col("null_frac_a"), 6).as("null_frac_a"),
          round(col("null_frac_b"), 6).as("null_frac_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          round(col("mean_rel_delta"), 6).as("mean_rel_delta"),
          col("distinct_a"), col("distinct_b"), col("null_ok"),
          col("mean_ok"), col("distinct_ok"), col("ok"))
        .orderBy("col_name")),

    "g_weighted_quantiles" -> ((s, dir) =>
      // Token-weighted length quantiles: "the median CHARACTER's document
      // length" (value = weight = n_chars) — the mixture-math cousin of
      // q_percentiles, exact weighted percentile_disc semantics.
      Stats.weightedQuantiles(table(s, dir, "documents"),
          col("n_chars"), col("n_chars"), Seq(0.25, 0.5, 0.9, 0.99))
        .select(col("q"), col("value"),
          round(col("cum_weight"), 4).as("cum_weight"),
          round(col("total_weight"), 4).as("total_weight"))
        .orderBy("q")),

    "g_tost" -> ((s, dir) =>
      // Equivalence gate: click vs view event values at margin ±5 — the
      // "prove the metric DIDN'T move" verdict (both one-sided z's must
      // clear 1.645; verdict on unrounded statistics).
      Stats.tost(table(s, dir, "events"), col("value"), col("event_type"),
          a = "click", b = "view", margin = 5.0)
        .select(col("n_a"), col("n_b"),
          round(col("mean_diff"), 6).as("mean_diff"),
          round(col("se"), 6).as("se"),
          round(col("z_lower"), 6).as("z_lower"),
          round(col("z_upper"), 6).as("z_upper"), col("equivalent"))),

    "g_markov_transitions" -> ((s, dir) =>
      // First-order user-journey model: event_type → next event_type per
      // user (ordered by ts with the event_id tie-break), transition
      // counts + row-conditional probabilities over the 5×5 grid.
      Sessionize.markovTransitions(table(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .select(col("cur"), col("nxt"), col("n"),
          round(col("p"), 6).as("p"))
        .orderBy("cur", "nxt")),

    "g_rfm" -> ((s, dir) =>
      // RFM quintile segmentation of every user: recency vs the corpus's
      // last event, frequency, Σvalue; ntile(5) with entity tie-breaks so
      // bucket edges are engine-exact.
      Stats.rfm(table(s, dir, "events"), col("user_id"), col("ts"),
          col("value"), q = 5)
        .select(col("entity"), col("recency_h"), col("frequency"),
          round(col("monetary"), 4).as("monetary"), col("r"), col("f"),
          col("m"), col("rfm"))
        .orderBy("entity")),

    "g_poisson_rates" -> ((s, dir) =>
      // Per-type events-per-hour with the ±1.96√n normal band over the
      // shared 720h observation span — the ingest-rate monitor readout.
      Stats.poissonRates(table(s, dir, "events"), col("event_type"),
          col("ts"))
        .select(col("grp"), col("n"), round(col("exposure_h"), 6)
            .as("exposure_h"), round(col("rate_per_h"), 6).as("rate_per_h"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"))
        .orderBy("grp")),

    "g_posthoc_pairs" -> ((s, dir) =>
      // Games–Howell-style pairwise contrasts across all 10 event-type
      // pairs: Welch SE, z, Welch–Satterthwaite dof — the "which pairs?"
      // follow-up to g_anova / g_kruskal_wallis.
      graft.ops.RankTests.posthocPairs(table(s, dir, "events"),
          col("value"), col("event_type"))
        .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
          round(col("mean_diff"), 6).as("mean_diff"),
          round(col("se"), 6).as("se"), round(col("z"), 6).as("z"),
          round(col("dof"), 4).as("dof"))
        .orderBy("grp_a", "grp_b")),

    "g_chi2_drift" -> ((s, dir) =>
      // Categorical drift: is `source` independent of `lang`? Full 5×20
      // contingency grid (empty cells contribute expected mass), chi2 +
      // dof + Cramér's V.
      Stats.chi2Drift(table(s, dir, "documents"),
        col("lang"), col("source"))),

    "g_dp_counts" -> ((s, dir) =>
      // ε-DP per-source counts: Laplace(1/ε) noise from the portable
      // seeded hash RNG keyed on the group value — deterministic per
      // (seed, group), exactly replayable in the twin.
      Stats.dpGroupCounts(table(s, dir, "documents"), col("source"),
          epsilon = 0.5, seed = 11L)
        .select(col("grp").as("source"), col("n_true"),
          round(col("n_noisy"), 6).as("n_noisy"))
        .orderBy("source")),

    "g_spearman" -> ((s, dir) =>
      // Monotone-association drift check: Spearman (midrank Pearson)
      // between quantity and extended price — each variable collapses to
      // its distinct-value table before any ranking.
      Stats.spearman(table(s, dir, "lineitem"), col("l_quantity"),
        col("l_extendedprice"))),

    "g_cohort_retention" -> ((s, dir) =>
      // Calendar-aligned retention: weekly cohorts by first activity,
      // distinct-active by week offset 0..6 — exact integer counts.
      Stats.cohortRetention(table(s, dir, "events"), col("user_id"),
        col("ts"), periodUs = 604800000000L, maxOffset = 6)),

    "g_gini_tokens" -> ((s, dir) =>
      // Corpus-concentration diagnostic: Lorenz curve + exact discrete
      // Gini of token mass across sources — the dial mixture reweighting
      // exists to correct.
      Stats.giniConcentration(table(s, dir, "documents"), col("source"),
          TextOps.tokenCount(col("text")))
        .select(col("rank").cast("long").as("rank"),
          col("grp").as("source"), col("w"), col("share"),
          col("cum_share"), col("gini"))
        .orderBy("rank")),

    "g_kaplan_meier" -> ((s, dir) => {
      // Right-censored retention: per-user lifetime = observed span in
      // whole hours (integer DIV — exact), terminal event = the user
      // ever errored; KM survival over the distinct-lifetime table.
      val per = table(s, dir, "events").groupBy("user_id").agg(
        ((max(col("ts")) - min(col("ts"))).cast("long") / lit(3600000000L))
          .cast("long").as("dur_h"),
        (sum(when(col("event_type") === "error", 1L).otherwise(0L)) > 0)
          .as("event"))
      Stats.kaplanMeier(per, col("dur_h"), col("event"))
    }),

    "dq_constraints" -> ((s, dir) => {
      // Deequ-style contract gate over lineitem: 7 fused row-local rules
      // + 1 FK anti-join. l_quantity's [1, 45] range is DELIBERATELY
      // tighter than the data (1..50) so the report carries a failing
      // rule — a gate that can't fail proves nothing.
      import graft.ops.DataQuality.Rule._
      graft.ops.DataQuality.check(table(s, dir, "lineitem"), Seq(
        NotNull("l_orderkey"),
        Unique(Seq("l_orderkey", "l_linenumber")),
        InRange("l_discount", 0.0, 0.1),
        InRange("l_quantity", 1.0, 45.0),
        InSet("l_returnflag", Seq("A", "N", "R")),
        MatchesRegex("l_linestatus", "^[OF]$"),
        RowCountBetween(1000L, 10000000L),
        RefIntegrity("l_orderkey", table(s, dir, "orders"), "o_orderkey")))
        .orderBy("rule")
    }),

    "g_grouped_quantiles" -> ((s, dir) =>
      // Per-language token-length quantiles (exact face; sketchK > 0 is
      // the spec-pinned 100 TB path): one map-side-combined aggregation.
      Stats.groupedQuantiles(
          table(s, dir, "documents").select(col("lang"),
            TextOps.tokenCount(col("text")).as("v")),
          col("lang"), col("v"), Seq(0.5, 0.9, 0.99))
        .select(col("grp").as("lang"), col("p50"), col("p90"), col("p99"))
        .orderBy("lang")),

    "g_join_cardinality" -> ((s, dir) => {
      // Pre-join explosion audit on the worst case: the events SELF-join
      // on user_id — output = Σ n_u², predicted from the count tables
      // without running the join.
      val ev = table(s, dir, "events")
      graft.ops.Skew.joinCardinality(ev, ev, col("user_id"), col("user_id"))
    }),

    "g_histogram" -> ((s, dir) =>
      // Fixed-width released histogram of events.value: 20 cells over
      // [0, 100) + underflow/overflow, empty cells emitted.
      Stats.histogram(table(s, dir, "events"), col("value"),
        lo = 0.0, hi = 100.0, bins = 20)),

    "g_purged_split" -> ((s, dir) =>
      // Purged 5-fold time split, eval fold 2, 12-hour embargo after the
      // eval window — quantile fold bounds fitted in one pass, fold/role
      // assignment a pure projection against the rounded literals.
      graft.ops.ChronoSplit.purgedTimeSplit(
          table(s, dir, "events").select(col("event_id"), col("ts")),
          col("ts"), nFolds = 5, evalFold = 2,
          embargo = 12.0 * 3600.0 * 1e6)
        .select(col("event_id"), col("fold"), col("role"))
        .orderBy("event_id")),

    "g_funnel" -> ((s, dir) =>
      // Ordered signup → click → purchase funnel within 72 hours of
      // signup (discriminative at sf0.01: 150 → 128 → 70 users):
      // per-step user counts + conversion vs step 1.
      Stats.funnel(table(s, dir, "events"), col("user_id"), col("ts"),
          col("event_type"), Seq("signup", "click", "purchase"),
          maxSpan = 72.0 * 3600.0 * 1e6)
        .orderBy("step_idx")),

    "g_skew_report" -> ((s, dir) =>
      // Key-skew diagnosis before a big shuffle: exact per-key counts →
      // heaviest key, its share, skew ratio vs the uniform mean, and the
      // salt factor that would level it across 32-way parallelism.
      graft.ops.Skew.skewReport(table(s, dir, "events"),
        col("event_type"), parallelism = 32)),

    "g_dp_mean" -> ((s, dir) =>
      // ε-DP per-event-type mean of `value`: clipped to [0, 50], budget
      // split ε/2 count + ε/2 sum, independent salted noise streams —
      // the bounded-mean release completing the dpGroupCounts family.
      Stats.dpGroupMean(table(s, dir, "events"), col("event_type"),
          col("value"), lo = 0.0, hi = 50.0, epsilon = 0.5, seed = 13L)
        .select(col("grp").as("event_type"), col("n_true"),
          round(col("sum_true").cast("double"), 6).as("sum_true"),
          round(col("n_noisy"), 6).as("n_noisy"),
          round(col("sum_noisy"), 6).as("sum_noisy"),
          round(col("mean_dp"), 6).as("mean_dp"))
        .orderBy("event_type")),

    "g_winsorize" -> ((s, dir) => {
      // Winsorize `value` at the exact 5%/95% quantile fences, then
      // per-type moments of the clipped column — the heavy-tail guard
      // before scaling (fences fitted once on the whole frame).
      val w = Stats.winsorize(table(s, dir, "events"), col("value"),
        lowerQ = 0.05, upperQ = 0.95)
      w.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("winsorized"), 6).as("avg_w"),
          round(min("winsorized"), 6).as("min_w"),
          round(max("winsorized"), 6).as("max_w"))
        .orderBy("event_type")
    }),

    "g_winsorize_sketch" -> ((s, dir) => {
      // Same contract as g_winsorize, fences fitted on the mergeable
      // KLL(16384) sketch path — the 100 TB fit (one sketch per
      // partition through the shuffle instead of every value buffered).
      // At the verify SF (10k rows) n <= k keeps the sketch in its EXACT
      // regime: fences are inclusive-rank order statistics, which is
      // precisely DuckDB's quantile_disc — a deterministic twin. Past k
      // the sketch is error-bounded (KllSketchSpec) but order-dependent,
      // so only the exact regime is hash-oracled.
      val w = Stats.winsorize(table(s, dir, "events"), col("value"),
        lowerQ = 0.05, upperQ = 0.95, sketchK = 16384)
      w.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("winsorized"), 6).as("avg_w"),
          round(min("winsorized"), 6).as("min_w"),
          round(max("winsorized"), 6).as("max_w"))
        .orderBy("event_type")
    }),

    "g_bootstrap_ci" -> ((s, dir) =>
      // Poisson-bootstrap 95% CI for mean(value): 50 hash-deterministic
      // replicates in ONE wide aggregation pass, driver percentile over
      // the 50 replicate means.
      Stats.bootstrapMeanCI(table(s, dir, "events"), col("value"),
          col("event_id"), b = 50, seed = 7L, level = 0.95)
        .select(round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"), col("n"), col("b"))),

    "q_percentiles" -> ((s, dir) =>
      // Exact linear-interpolation percentiles (sort-based `percentile`,
      // not the t-digest approx) per group — the approx_percentile form is
      // the 100 TB scale path; this pins the exact semantics.
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
          round(avg("l_extendedprice"), 4).as("mean_price"))
        .orderBy("l_returnflag")),

    "q_histogram" -> ((s, dir) =>
      // Fixed-width histogram as pure arithmetic: bin = floor(x/w) keeps
      // the plan a single map-side-combinable aggregation (no sort, no
      // per-bin subquery) at any scale.
      table(s, dir, "orders")
        .withColumn("bin", floor(col("o_totalprice") / lit(25000.0)).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 4).as("avg_price"))
        .orderBy("bin")),

    "q_rollup" -> ((s, dir) =>
      // ROLLUP super-aggregates (status, priority) -> (status) -> () with a
      // text sentinel so ordering is deterministic across engines.
      table(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority")),

    "q_profile" -> ((s, dir) =>
      // One-pass table profiler over three lineitem measures (exact
      // distinct counts; the approx path is the documented 100 TB form).
      graft.ops.Stats.profileTable(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), round(col("min_v"), 4).as("min_v"),
          round(col("max_v"), 4).as("max_v"),
          round(col("mean_v"), 4).as("mean_v"))
        .orderBy("col_name")),

    "q_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS — the explicit-sets sibling of q_cube/q_rollup:
      // per-type, per-user-bucket, and grand-total rows in ONE pass
      // (Spark expands sets into a single Expand + aggregate, no
      // re-scan per set).
      table(s, dir, "events")
        .withColumn("user_bucket", (col("user_id") % 4).cast("int"))
        .createOrReplaceTempView("ev_gs")
      s.sql("""
        SELECT event_type, user_bucket, count(*) AS n,
               round(sum(value), 2) AS total
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        ORDER BY event_type NULLS LAST, user_bucket NULLS LAST""")
    }),

    "q_unpivot" -> ((s, dir) =>
      // UNPIVOT/melt (the inverse of q_pivot): wide per-part measures to
      // (part, measure, value) long form — a narrow per-row expansion
      // (stack/unpivot lowers to Generate, no shuffle before the agg).
      table(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice").cast("double").as("retail"),
          col("p_size").cast("double").as("size_v"))
        .unpivot(Array(col("p_partkey")),
          Array(col("retail"), col("size_v")), "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .orderBy("measure")),

    "q_pivot" -> ((s, dir) =>
      // PIVOT on the known status domain; the twin is conditional
      // aggregation, which is also exactly the physical plan Spark lowers
      // pivot to (no extra shuffle vs a plain groupBy).
      table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .withColumnRenamed("F", "revenue_f")
        .withColumnRenamed("O", "revenue_o")
        .withColumnRenamed("P", "revenue_p")
        .orderBy("o_orderpriority")),

    "g_mutual_info" -> ((s, dir) => {
      // Feature scoring: MI(event_type; decile-binned value) in nats.
      val ev = table(s, dir, "events")
        .withColumn("vbin", floor(col("value") / lit(50.0)).cast("long"))
      Stats.mutualInfo(ev, col("event_type"), col("vbin"))
        .select(round(col("mi_nats"), 6).as("mi_nats"))
    }),

    "g_ks_drift" -> ((s, dir) => {
      // Distribution-drift detector: two-sample KS between click and view
      // event values (exact distributed ECDF gap; see Stats.ksStatistic).
      val ev = table(s, dir, "events")
      Stats.ksStatistic(ev, col("value"), col("event_type"), "click", "view")
        .select(round(col("ks_stat"), 6).as("ks_stat"), col("n_a"), col("n_b"))
    }),

    "g_wasserstein" -> ((s, dir) => {
      // Magnitude-sensitive drift companion to g_ks_drift: W1 between
      // click and view values in the value's own units. Values are
      // quantized to 0.1 by the fixture generator, so the distinct
      // table is bounded without extra binning.
      val ev = table(s, dir, "events")
      Stats.wasserstein1(ev, col("value"), col("event_type"),
          "click", "view")
        .select(round(col("w1"), 6).as("w1"), col("n_a"), col("n_b"),
          col("n_distinct"))
    }),

    "g_cvm_drift" -> ((s, dir) => {
      // Whole-curve drift test between click and view values: every
      // observation's ECDF gap counts, not just the worst one (KS) or
      // the unit-weighted integral (W1).
      val ev = table(s, dir, "events")
      Stats.cramerVonMises(ev, col("value"), col("event_type"),
          "click", "view")
        .select(round(col("cvm"), 6).as("cvm"), col("n_a"), col("n_b"))
    }),

    "g_drift_report" -> ((s, dir) => {
      // The fused drift monitor: KS + W1 + CvM + exact-ECDF-decile PSI
      // for THREE features in ONE corpus scan (vs one scan per (op,
      // column) for the single-column faces above — the 100-feature
      // production case pays 1 pass, not 400).
      val ev = table(s, dir, "events").select(col("event_type"),
        col("value"),
        (col("user_id") % 97).cast("double").as("uid_mod"),
        (col("event_id") % 101).cast("double").as("eid_mod"))
      Stats.driftReport(ev, Seq("value", "uid_mod", "eid_mod"),
          col("event_type"), "click", "view")
        .select(col("feature"), col("n_a"), col("n_b"), col("n_distinct"),
          round(col("ks"), 6).as("ks"), round(col("w1"), 6).as("w1"),
          round(col("cvm"), 6).as("cvm"), round(col("psi"), 6).as("psi"))
        .orderBy("feature")
    }),

    "g_welch_ttest" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      Stats.welchTTest(ev, col("value"), col("event_type"), "click", "view")
        .select(round(col("t_stat"), 6).as("t_stat"), round(col("dof"), 4).as("dof"),
          round(col("mean_a"), 6).as("mean_a"), round(col("mean_b"), 6).as("mean_b"),
          col("n_a"), col("n_b"))
    }),

    "g_krippendorff" -> ((s, dir) => {
      // Multi-rater agreement QA: Krippendorff's nominal alpha over
      // synthesized ratings (item = user bucket, label = value century
      // bin) — exact rational arithmetic end to end.
      val ev = table(s, dir, "events")
      Stats.krippendorffAlpha(ev, pmod(col("user_id"), lit(200)),
          floor(col("value") / lit(100.0)).cast("long"))
        .select(round(col("alpha"), 6).as("alpha"), col("n_items"),
          col("n_ratings"))
    }),

    "g_bh_fdr" -> ((s, dir) => {
      // Per-slice drift screen with multiple-testing control: 20 slices
      // (event_type × user_id mod 4), Welch t between the first and
      // second half of January 2024, two-sided distribution-free
      // Chebyshev p-bound min(1, 1/t²) (conservative but exact rational
      // arithmetic — no incomplete-beta, so both engines agree to the
      // ulp), then Benjamini–Hochberg step-up at q = 0.2.
      val cut = 1705363200000000L // 2024-01-16 00:00 UTC, epoch µs
      val early = col("ts") < cut
      val ev = table(s, dir, "events").withColumn("feature",
        concat_ws("_", col("event_type"), pmod(col("user_id"), lit(4))))
      val tests = ev.groupBy("feature")
        .agg(avg(when(early, col("value"))).as("m1"),
          avg(when(!early, col("value"))).as("m2"),
          var_samp(when(early, col("value"))).as("s1"),
          var_samp(when(!early, col("value"))).as("s2"),
          count(when(early, col("value"))).as("n1"),
          count(when(!early, col("value"))).as("n2"))
        .withColumn("t", (col("m1") - col("m2")) /
          sqrt(col("s1") / col("n1") + col("s2") / col("n2")))
        .select(col("feature"),
          least(lit(1.0), lit(1.0) / (col("t") * col("t"))).as("p"))
      Stats.bhFdr(tests, col("feature"), col("p"), q = 0.2)
        .select(col("id").as("feature"), round(col("p"), 6).as("p"),
          col("rank"), round(col("p_adj"), 6).as("p_adj"), col("reject"))
        .orderBy("rank")
    }),

    "g_sessionize_gap" -> ((s, dir) => {
      // Inactivity-gap sessions per user (6 h gap), one row per session.
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      Sessionize.byGap(ev, col("user_id"), col("ts_us"), gap = 21600000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("ts_us").as("first_us"),
          max("ts_us").as("last_us"))
        .withColumn("duration_us", col("last_us") - col("first_us"))
        .orderBy("user_id", "session_id")
    }),

    "g_resample_ffill" -> ((s, dir) => {
      // Forward-fill each user's last event value onto a fixed 6-hour grid
      // over January 2024 (the testdata span) — series alignment for
      // fixed-rate features; grid points before a user's first event stay
      // null. Grid bounds are constants so the DuckDB twin can reproduce
      // the grid with generate_series.
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val series = ev.groupBy("user_id", "ts_us")
        .agg(round(max("value"), 4).as("last_value"))
        .withColumn("last_event_us", col("ts_us"))
      Stats.resampleFfill(series, Seq("user_id"), "ts_us",
          Seq("last_value", "last_event_us"),
          gridStart = 1704067200000000L, gridEnd = 1706745600000000L,
          step = 21600000000L)
        .orderBy("user_id", "ts_us")
    }),

    "text_chunks" -> ((s, dir) =>
      TextOps.chunkDocuments(table(s, dir, "documents"), col("text"),
          chunkSize = 32, stride = 24)
        .select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text")
        .orderBy("doc_id", "chunk_idx")),

    "g_ewma" -> ((s, dir) => {
      // Per-user EWMA of event values — the exact sequential recurrence,
      // distributed (one shuffle + one in-partition sort; see Stats.ewma).
      // The oracle replays the identical fold as a recursive CTE.
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      Stats.ewma(ev, "user_id", Seq("ts_us", "event_id"), "value", alpha = 0.3)
        .select(col("user_id"), col("ts_us"), round(col("ewma"), 6).as("ewma"))
        .orderBy("user_id", "ts_us")
    }),

    "g_cusum" -> ((s, dir) => {
      // CUSUM drift detector per event type, run in the exact-integer
      // regime (value pre-scaled to cents) so the prefix-scan form is
      // bit-identical across engines and partitionings. target 40.00,
      // slack 5.00, threshold 500.00 — in cents: 4000 / 500 / 50000.
      val ev = table(s, dir, "events")
        .withColumn("cents", round(col("value") * 100).cast("long"))
      Stats.cusum(ev, Seq(col("event_type")), Seq(col("ts"), col("event_id")),
          col("cents"), target = 4000.0, slack = 500.0, threshold = 50000.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(max("cusum_up") / 100.0, 2).as("max_cusum_up"),
          round(max("cusum_dn") / 100.0, 2).as("max_cusum_dn"),
          sum(when(col("alarm_up"), 1L).otherwise(0L)).as("n_alarm_up"),
          sum(when(col("alarm_dn"), 1L).otherwise(0L)).as("n_alarm_dn"),
          min(when(col("alarm_up"), col("event_id"))).as("first_alarm_id"))
        .orderBy("event_type")
    }),

    "g_outliers" -> ((s, dir) =>
      // Per-event-type anomaly profile: z-score and Tukey-IQR fence counts
      // (fences rounded to 6 inside the op for engine portability).
      Stats.outlierStats(table(s, dir, "events"), col("event_type"), col("value"))
        .orderBy("grp")),

    "g_quantile_bins" -> ((s, dir) => {
      // Decile feature discretization: exact quantile cuts fitted in one
      // aggregation pass (9 scalars to the driver), assignment a pure
      // branch-free projection.
      val ev = table(s, dir, "events")
      val bounds = Stats.fitQuantileBins(ev, col("value"), k = 10)
      ev.withColumn("bin", Stats.applyQuantileBins(col("value"), bounds))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min("value"), 6).as("lo"), round(max("value"), 6).as("hi"))
        .orderBy("bin")
    }),

    "q_scd2" -> ((s, dir) => {
      // Slowly-changing-dimension (type 2) interval builder: collapse each
      // user's event-type signal into validity intervals [valid_from,
      // valid_to) — gaps-and-islands (lag-change flag + running sum), one
      // per-user window stack, no self-join. valid_to of the open run is
      // null.
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
        .where(col("user_id") < 10)
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = ev
        .withColumn("chg", when(lag("event_type", 1).over(w).isNull ||
          lag("event_type", 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum("chg").over(cum))
        .groupBy("user_id", "run_id")
        .agg(min("event_type").as("event_type"), min("ts_us").as("valid_from"),
          count(lit(1)).as("n_rows"))
      val w2 = Window.partitionBy("user_id").orderBy("valid_from")
      runs.withColumn("valid_to", lead("valid_from", 1).over(w2))
        .select("user_id", "run_id", "event_type", "valid_from", "valid_to", "n_rows")
        .orderBy("user_id", "valid_from")
    }),

    "g_kl_drift" -> ((s, dir) => {
      // Categorical drift between the first and second half of January:
      // KL both ways + Jensen-Shannon over the event-type distribution
      // (the categorical complement of g_ks_drift).
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val mid = 1705363200000000L // 2024-01-16 UTC
      Stats.categoricalDivergence(ev, col("event_type"),
          col("ts_us") < mid, col("ts_us") >= mid)
        .select(round(col("kl_pq"), 6).as("kl_pq"),
          round(col("kl_qp"), 6).as("kl_qp"), round(col("js"), 6).as("js"),
          col("n_a"), col("n_b"), col("n_categories"))
    }),

    "g_sliding_distinct" -> ((s, dir) => {
      // Sliding-window distinct users (6 h window, 3 h slide) — the batch
      // twin of the streaming sliding aggregation; each event lands in
      // exactly windowLen/slide = 2 windows.
      val ev = table(s, dir, "events")
        .withColumn("t", timestamp_micros(col("ts")))
      ev.groupBy(window(col("t"), "6 hours", "3 hours"))
        .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("win_start_s"),
          col("u"), col("n"))
        .orderBy("win_start_s")
    }),

    "g_corr_matrix" -> ((s, dir) =>
      // Feature-correlation screen: all pairwise Pearson r in ONE pass.
      Stats.corrMatrix(table(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select(col("col_a"), col("col_b"), round(col("corr"), 6).as("corr"))
        .orderBy("col_a", "col_b")),

    "g_time_weighted_avg" -> ((s, dir) => {
      // Step-function time-weighted mean of each user's value signal —
      // the irregular-sampling-robust aggregate (plain avg over-weights
      // bursts).
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      Stats.timeWeightedAvg(ev, col("user_id"), col("ts_us"), col("value"))
        .select(col("k").as("user_id"), round(col("twa"), 6).as("twa"),
          col("n_intervals"), col("span"))
        .orderBy("user_id")
    }),

    "g_kfold" -> ((s, dir) =>
      // Engine-portable 5-fold assignment: per-fold sizes, id checksums,
      // and class balance — the cross-validation split as a pure
      // projection.
      table(s, dir, "events")
        .withColumn("fold", Stats.foldAssign(col("event_id"), k = 5, seed = 17L))
        .groupBy("fold")
        .agg(count(lit(1)).as("n"), sum("event_id").as("id_sum"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
        .orderBy("fold")),

    "q_json_extract" -> ((s, dir) => {
      // Semi-structured payloads: pull a typed field out of the JSON
      // `props` column and aggregate it — narrow extraction (codegen'd
      // path expression), one map-side-combined aggregation.
      val ev = table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
        .orderBy("event_type")
    }),

    "q_date_arith" -> ((s, dir) =>
      // Calendar arithmetic over a native TIMESTAMP column: monthly
      // revenue trend + order age in days against a fixed reference date.
      table(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("revenue"),
          round(avg(datediff(lit("1999-12-31").cast("date"),
            col("o_orderdate").cast("date"))), 4).as("avg_age_days"))
        .orderBy("yr", "mo")),

    "q_time_rollup" -> ((s, dir) => {
      // Calendar-dimension aggregation: (ISO weekday, hour-of-day) grid
      // from the raw epoch-nanos column (UTC session). weekday() is
      // Monday=0 — the twin uses DuckDB's isodow()-1.
      val ev = table(s, dir, "events")
        .withColumn("t", timestamp_micros(col("ts")))
      ev.groupBy(weekday(col("t")).as("dow"), hour(col("t")).as("hr"))
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
        .orderBy("dow", "hr")
    }),

    "q_cube" -> ((s, dir) =>
      // CUBE super-aggregates: all 4 grouping sets of (status, priority)
      // in one pass — same sentinel trick as q_rollup.
      table(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority")),

    "g_rolling_zscore" -> ((s, dir) => {
      // Online-style anomaly score: z of each event against the PREVIOUS
      // 10 events of its user (frame excludes the current row — no
      // self-contamination). Nulls until 2 prior points exist.
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-10, -1)
      val mu = avg("value").over(w)
      val sd = stddev_samp(col("value")).over(w)
      ev.select(col("user_id"), col("ts_us"),
          round(when(sd > 0, (col("value") - mu) / sd), 6).as("z"),
          when(sd > 0, (abs(col("value") - mu) / sd) > 3).as("is_anomaly"))
        .where(col("user_id") < 15)
        .orderBy("user_id", "ts_us")
    }),

    "q_rolling_median" -> ((s, dir) => {
      // Rolling 5-row median of event value per user — robust time-series
      // smoothing; exact percentile over a bounded rows frame (frame size
      // is the constant 5, so per-row cost is O(frame), not O(history)).
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-4, 0)
      ev.select(col("user_id"), col("ts_us"),
          round(percentile(col("value"), lit(0.5)).over(w), 6).as("med5"))
        .where(col("user_id") < 20)
        .orderBy("user_id", "ts_us")
    }),

    "q_funnel" -> ((s, dir) => {
      // Ordered-event funnel view -> click -> purchase: each stage is the
      // user's FIRST qualifying event at-or-after the previous stage.
      // Three map-side-combined aggregations + two user-keyed joins — no
      // per-user event sorting, no collect.
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      // each stage table feeds BOTH the next stage's join and the final
      // report join: checkpoint the bounded per-user tables so no stage
      // re-executes its predecessors (r12)
      val tv = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_us").as("t_view"))
        .localCheckpoint(false)
      val tc = ev.join(tv, "user_id")
        .where(col("event_type") === "click" && col("ts_us") >= col("t_view"))
        .groupBy("user_id").agg(min("ts_us").as("t_click"))
        .localCheckpoint(false)
      val tp = ev.join(tc, "user_id")
        .where(col("event_type") === "purchase" && col("ts_us") >= col("t_click"))
        .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
      tv.join(tc, Seq("user_id"), "left")
        .join(tp, Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"),
          round(avg((col("t_purchase") - col("t_view")) / 1000000.0), 4)
            .as("avg_delay_sec"))
    }),

    "q_cohort" -> ((s, dir) => {
      // Weekly cohort retention: cohort = week of a user's first event,
      // cell = distinct users of that cohort active `offset` weeks later.
      // One aggregation for first-activity, one user-keyed join, one
      // distinct-count aggregation.
      val ev = table(s, dir, "events")
        .withColumn("week", expr("ts div 604800000000"))
      val firstW = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
      ev.join(firstW, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("active_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    "q_window_suite" -> ((s, dir) => {
      // The general window-function surface in one plan: lag/lead +
      // row_number/ntile per user over time, rank/dense_rank/percent_rank/
      // cume_dist per event type over value. The user_id filter sits ABOVE
      // both windows (it is not a partition key of the value window), so
      // ranks are computed over the full table — same as the twin.
      import org.apache.spark.sql.expressions.Window
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val wU = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val wT = Window.partitionBy("event_type").orderBy("value")
      ev.select(col("event_id"), col("user_id"), col("ts_us"),
          round(lag("value", 1).over(wU), 6).as("prev_value"),
          round(lead("value", 1).over(wU), 6).as("next_value"),
          row_number().over(wU).cast("long").as("rn"),
          ntile(4).over(wU).cast("long").as("quartile"),
          rank().over(wT).cast("long").as("rnk"),
          dense_rank().over(wT).cast("long").as("drnk"),
          round(percent_rank().over(wT), 6).as("pct_rank"),
          round(cume_dist().over(wT), 6).as("cdist"))
        .where(col("user_id") < 15)
        .orderBy("event_id")
    }),

    "sketch_freq_rollup" -> ((s, dir) => {
      // Heavy-hitters sketch table in its exact regime: build per
      // (event_type, user bucket) frequent-items sketches over a
      // 50-value item domain, roll up to event_type by UNIONING sketches
      // (raw data scanned once). 50 distinct << 3/4 * 256 map slots, so
      // estimates are exact and DuckDB's GROUP BY count is the twin.
      val ev = table(s, dir, "events")
        .withColumn("item", (col("user_id") % 50).cast("string"))
        .withColumn("bucket", col("user_id") % 10)
      val sk = Stats.buildFreqSketches(ev, Seq("event_type", "bucket"),
        col("item"), maxMapSize = 256)
      Stats.rollupFreqSketches(sk, Seq("event_type"), maxMapSize = 256)
        .orderBy("event_type", "item")
    }),
  )

  val oracle: Map[String, String] = Map(
    // the unified Eval.bradleyTerry trajectory twin over the 5-item arena
    "g_bradley_terry" -> graft.ops.Eval.bradleyTerrySql(
      """SELECT CASE WHEN aw THEN a ELSE b END AS w,
        |  CASE WHEN aw THEN b ELSE a END AS l
        |FROM (SELECT 'm' || (event_id % 5) AS a,
        |    'm' || ((event_id % 5 + 1 + user_id % 4) % 5) AS b,
        |    user_id % (event_id % 5 + (event_id % 5 + 1 + user_id % 4) % 5 + 2)
        |      < event_id % 5 + 1 AS aw
        |  FROM events) t""".stripMargin, iterations = 20),

    "layout_zorder" -> {
      val z = graft.ops.Skew.zorderKeySql(
        Seq("user_id % 256", "CAST(floor(value * 100) AS BIGINT) % 256"), 8)
      s"""SELECT event_id, $z AS zkey FROM events
         |ORDER BY zkey, event_id LIMIT 100""".stripMargin
    },

    "g_bootstrap_ci" -> Stats.bootstrapMeanCISql(
      "SELECT value, event_id FROM events", "value", "event_id",
      b = 50, seed = 7L, level = 0.95),

    "g_psi" -> {
      val qs = (1 to 9).map(i =>
        s"round(quantile_cont(value, 0.$i), 6) AS q$i").mkString(", ")
      val bins = (1 to 9).map(i =>
        s"(CASE WHEN value > q$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT $qs FROM events WHERE event_type = 'view'),
         |binned AS (
         |  SELECT $bins AS bin,
         |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nr,
         |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS nc
         |  FROM events CROSS JOIN b
         |  WHERE event_type IN ('view', 'error') GROUP BY 1),
         |dense AS (SELECT r.b AS bin, coalesce(nr, 0) AS nr,
         |                 coalesce(nc, 0) AS nc
         |          FROM range(10) r(b) LEFT JOIN binned ON binned.bin = r.b),
         |t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM dense)
         |SELECT round(sum((p - q) * ln(p / q)), 6) AS psi,
         |  CAST(max(tr) AS BIGINT) AS n_ref, CAST(max(tc) AS BIGINT) AS n_cur
         |FROM (SELECT (nr + 0.5) / (tr + 5.0) AS p,
         |             (nc + 0.5) / (tc + 5.0) AS q, tr, tc
         |      FROM dense, t)""".stripMargin
    },

    "g_robust_scale" ->
      """WITH m AS (SELECT round(quantile_cont(value, 0.5), 6) AS med
        |           FROM events),
        |d AS (SELECT round(quantile_cont(abs(value - med), 0.5), 6) AS mad
        |      FROM events CROSS JOIN m)
        |SELECT event_type, count(*) AS n,
        |  round(avg((value - med) / (1.4826 * mad)), 6) AS avg_z,
        |  round(max(abs((value - med) / (1.4826 * mad))), 6) AS max_abs_z
        |FROM events CROSS JOIN m CROSS JOIN d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_k_anonymity" ->
      """SELECT lang, source, count(*) AS n, count(*) < 8 AS at_risk
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g_l_diversity" ->
      """WITH cells AS (SELECT lang, source, count(*) AS c
        |               FROM documents GROUP BY 1, 2),
        |g AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
        |        count(*) AS n_sensitive,
        |        sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clc
        |      FROM cells GROUP BY 1)
        |SELECT lang, n, n_sensitive,
        |  round(ln(CAST(n AS DOUBLE)) - clc / n, 6) AS entropy,
        |  n_sensitive < 18 AS at_risk
        |FROM g ORDER BY lang""".stripMargin,

    "g_interval_score" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |model AS (SELECT event_type, round(avg(value), 6) AS yhat
        |          FROM ev WHERE event_id % 3 = 0 GROUP BY 1),
        |cal AS (SELECT abs(e.value - m.yhat) AS nc
        |        FROM ev e JOIN model m USING (event_type)
        |        WHERE e.event_id % 3 = 1 AND e.value IS NOT NULL),
        |nn AS (SELECT CAST(ceil((count(*) + 1) * 0.875) AS BIGINT) AS k
        |       FROM cal),
        |q AS (SELECT ceil(nc * 1e9) / 1e9 AS qhat FROM (
        |        SELECT nc, row_number() OVER (ORDER BY nc) AS r FROM cal)
        |      WHERE r = (SELECT k FROM nn)),
        |test AS (SELECT e.value AS y, m.yhat - q.qhat AS lo,
        |           m.yhat + q.qhat AS hi
        |         FROM ev e JOIN model m USING (event_type) CROSS JOIN q
        |         WHERE e.event_id % 3 = 2),
        |s AS (SELECT y, lo, hi,
        |        (hi - lo) + (2.0 / 0.125) * greatest(lo - y, 0.0)
        |                  + (2.0 / 0.125) * greatest(y - hi, 0.0) AS sc
        |      FROM test WHERE y IS NOT NULL)
        |SELECT count(*) AS n,
        |  round(avg(CASE WHEN y >= lo AND y <= hi THEN 1.0 ELSE 0.0 END), 9)
        |    AS coverage,
        |  round(avg(hi - lo), 6) AS mean_width,
        |  round(avg(sc), 6) AS mean_interval_score
        |FROM s""".stripMargin,

    "g_cluster_eval" ->
      """WITH cells AS (
        |  SELECT user_id % 6 AS p, user_id % 12 AS t, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |mp AS (SELECT sum(nn * (nn - 1) / 2.0) AS pp,
        |         sum(nn * ln(nn)) AS hp FROM (
        |         SELECT CAST(sum(c) AS DOUBLE) AS nn FROM cells GROUP BY p)),
        |mt AS (SELECT sum(nn * (nn - 1) / 2.0) AS tpp,
        |         sum(nn * ln(nn)) AS ht FROM (
        |         SELECT CAST(sum(c) AS DOUBLE) AS nn FROM cells GROUP BY t)),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |          sum(c * (c - 1) / 2.0) AS tp,
        |          sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS hc
        |        FROM cells),
        |j AS (SELECT * FROM tot CROSS JOIN mp CROSS JOIN mt),
        |f AS (SELECT n, tp, pp, tpp,
        |        CAST(n AS DOUBLE) * (n - 1) / 2.0 AS np,
        |        ln(CAST(n AS DOUBLE)) - ht / n AS h_t,
        |        ln(CAST(n AS DOUBLE)) - hp / n AS h_p,
        |        (hp - hc) / n AS h_t_p,
        |        (ht - hc) / n AS h_p_t
        |      FROM j),
        |g AS (SELECT *,
        |        CASE WHEN h_t > 0 THEN 1.0 - h_t_p / h_t END AS homog,
        |        CASE WHEN h_p > 0 THEN 1.0 - h_p_t / h_p END AS compl,
        |        pp * tpp / np AS expected
        |      FROM f)
        |SELECT n, CAST(tp AS BIGINT) AS tp_pairs,
        |  round(CASE WHEN pp > 0 THEN tp / pp END, 9) AS precision,
        |  round(CASE WHEN tpp > 0 THEN tp / tpp END, 9) AS recall,
        |  round(CASE WHEN pp + tpp > 0 THEN 2.0 * tp / (pp + tpp) END, 9) AS f1,
        |  round(CASE WHEN np > 0 THEN (np - pp - tpp + 2 * tp) / np END, 9) AS rand,
        |  round(CASE WHEN abs((pp + tpp) / 2 - expected) > 0
        |    THEN (tp - expected) / ((pp + tpp) / 2 - expected) END, 9) AS ari,
        |  round(homog, 9) AS homogeneity,
        |  round(compl, 9) AS completeness,
        |  round(CASE WHEN homog + compl > 0
        |    THEN 2.0 * homog * compl / (homog + compl) END, 9) AS v_measure
        |FROM g""".stripMargin,

    "g_ess" ->
      """WITH w AS (
        |  SELECT (1 + event_id % 9) / 3.0 AS w FROM events)
        |SELECT count(*) AS n,
        |  round(sum(w), 6) AS sum_w,
        |  round(sum(w) * sum(w) / sum(w * w), 6) AS ess,
        |  round(sum(w) * sum(w) / sum(w * w) / count(*), 9) AS ess_ratio,
        |  round(max(w) / sum(w), 9) AS max_w_share
        |FROM w""".stripMargin,

    "g_conformal" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |model AS (SELECT event_type, round(avg(value), 6) AS yhat
        |          FROM ev WHERE event_id % 3 = 0 GROUP BY 1),
        |cal AS (SELECT abs(e.value - m.yhat) AS nc
        |        FROM ev e JOIN model m USING (event_type)
        |        WHERE e.event_id % 3 = 1 AND e.value IS NOT NULL),
        |nn AS (SELECT CAST(ceil((count(*) + 1) * 0.875) AS BIGINT) AS k
        |       FROM cal),
        |q AS (SELECT ceil(nc * 1e9) / 1e9 AS qhat FROM (
        |        SELECT nc, row_number() OVER (ORDER BY nc) AS r FROM cal)
        |      WHERE r = (SELECT k FROM nn)),
        |test AS (SELECT e.event_type, e.value, m.yhat
        |         FROM ev e JOIN model m USING (event_type)
        |         WHERE e.event_id % 3 = 2)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN abs(value - yhat) <= q.qhat
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  round(avg(CASE WHEN abs(value - yhat) <= q.qhat
        |    THEN 1.0 ELSE 0.0 END), 6) AS coverage,
        |  round(q.qhat, 6) AS qhat
        |FROM test CROSS JOIN q
        |GROUP BY event_type, q.qhat ORDER BY event_type""".stripMargin,

    "g_conformal_grouped" ->
      """WITH ev AS (
        |  SELECT event_id,
        |    CASE WHEN event_id < 10 THEN 'tiny' ELSE event_type END AS g,
        |    value
        |  FROM events),
        |model AS (SELECT g, round(avg(value), 6) AS yhat
        |          FROM ev WHERE event_id % 3 = 0 GROUP BY 1),
        |cal AS (SELECT e.g, abs(e.value - m.yhat) AS nc
        |        FROM ev e JOIN model m USING (g)
        |        WHERE e.event_id % 3 = 1 AND e.value IS NOT NULL),
        |sizes AS (SELECT g, count(*) AS n,
        |            CAST(ceil((count(*) + 1) * 0.875) AS BIGINT) AS k
        |          FROM cal GROUP BY 1),
        |ranked AS (SELECT g, nc,
        |             row_number() OVER (PARTITION BY g ORDER BY nc) AS r
        |           FROM cal),
        |hit AS (SELECT r.g, ceil(r.nc * 1e9) / 1e9 AS qhat
        |        FROM ranked r JOIN sizes s USING (g) WHERE r.r = s.k)
        |SELECT s.g, s.n, round(h.qhat, 6) AS qhat
        |FROM sizes s LEFT JOIN hit h USING (g) ORDER BY s.g""".stripMargin,

    "g_t_closeness" ->
      """WITH cells AS (SELECT lang, source, count(*) AS c
        |               FROM documents GROUP BY 1, 2),
        |grp AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
        |gq AS (SELECT source,
        |           count(*) * 1.0 / (SELECT count(*) FROM documents) AS q
        |         FROM documents GROUP BY 1),
        |grid AS (
        |  SELECT g.lang, g.n, gl.source,
        |    coalesce(c.c, 0) * 1.0 / g.n - gl.q AS d
        |  FROM grp g CROSS JOIN gq gl
        |  LEFT JOIN cells c ON c.lang = g.lang AND c.source = gl.source),
        |cum AS (
        |  SELECT lang, n, d,
        |    sum(d) OVER (PARTITION BY lang ORDER BY source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |  FROM grid)
        |SELECT lang, n,
        |  round(sum(abs(d)) / 2.0, 9) AS tvd,
        |  round(sum(abs(cd)) / ((SELECT count(*) FROM gq) - 1.0), 9) AS emd,
        |  round(sum(abs(cd)) / ((SELECT count(*) FROM gq) - 1.0), 9) > 0.04
        |    AS at_risk
        |FROM cum GROUP BY 1, 2 ORDER BY lang""".stripMargin,

    "g_mannwhitney" ->
      """WITH cells AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS ca,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS cb
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |  GROUP BY 1),
        |t AS (SELECT v, ca, cb, ca + cb AS tt FROM cells),
        |r AS (SELECT ca, cb, tt,
        |    coalesce(sum(tt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (tt + 1) / 2.0 AS rk
        |  FROM t),
        |s AS (SELECT sum(ca * rk) AS ra,
        |    CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        |    sum(tt * tt * tt - tt) AS ties FROM r),
        |u AS (SELECT round(ra - n_a * (n_a + 1) / 2.0, 6) AS u_a,
        |        n_a, n_b, ties FROM s)
        |SELECT u_a, round(n_a * n_b - u_a, 6) AS u_b,
        |  round((u_a - n_a * n_b / 2.0) /
        |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1)
        |      - ties / ((n_a + n_b) * (n_a + n_b - 1.0)))), 9) AS z,
        |  n_a, n_b
        |FROM u""".stripMargin,

    "g_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(floor(value / 50.0) AS DOUBLE) AS x,
        |    CAST(floor(value / 80.0) + (event_id % 3) AS DOUBLE) AS y,
        |    count(*) AS c
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN sgn > 0 THEN w END), 0) AS BIGINT)
        |      AS n_concordant,
        |    CAST(coalesce(sum(CASE WHEN sgn < 0 THEN w END), 0) AS BIGINT)
        |      AS n_discordant
        |  FROM (
        |    SELECT a.c * b.c AS w,
        |      sign(b.x - a.x) * sign(b.y - a.y) AS sgn
        |    FROM cells a JOIN cells b
        |      ON a.x < b.x OR (a.x = b.x AND a.y < b.y)) p),
        |m AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    (SELECT sum(t * (t - 1)) FROM
        |      (SELECT sum(c) AS t FROM cells GROUP BY x) mx) AS tx2,
        |    (SELECT sum(t * (t - 1)) FROM
        |      (SELECT sum(c) AS t FROM cells GROUP BY y) my) AS ty2
        |  FROM cells),
        |d AS (
        |  SELECT n, n_concordant, n_discordant,
        |    sqrt((CAST(n AS DOUBLE) * (n - 1) - tx2)
        |      * (CAST(n AS DOUBLE) * (n - 1) - ty2)) / 2.0 AS den
        |  FROM cd CROSS JOIN m)
        |SELECT n, n_concordant, n_discordant,
        |  -- + 0.0 normalizes a possible -0.0 (the embedding_pca_cov
        |  -- signed-zero lesson: a tiny negative tau rounds to -0.0 here
        |  -- but +0.0 under Spark's BigDecimal round)
        |  round(CASE WHEN den > 0 THEN
        |    CAST(n_concordant - n_discordant AS DOUBLE) / den END, 6)
        |    + 0.0 AS tau_b
        |FROM d""".stripMargin,

    "g_mcnemar" ->
      """WITH base AS (
        |  SELECT (value > 150.0) AS yt,
        |    (value + (event_id % 20) > 155.0) AS pa,
        |    (value + (user_id % 30) > 160.0) AS pb
        |  FROM events WHERE value IS NOT NULL),
        |ab AS (
        |  SELECT (pa = yt) AS a, (pb = yt) AS b FROM base
        |  WHERE yt IS NOT NULL AND pa IS NOT NULL AND pb IS NOT NULL),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both_correct,
        |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a_only,
        |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b_only,
        |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both_wrong
        |  FROM ab),
        |t AS (
        |  SELECT *,
        |    n_both_correct + n_a_only + n_b_only + n_both_wrong AS n,
        |    CAST(n_a_only AS DOUBLE) AS bb, CAST(n_b_only AS DOUBLE) AS cc
        |  FROM cells)
        |SELECT n, n_both_correct, n_a_only, n_b_only, n_both_wrong,
        |  round(CAST(n_both_correct + n_a_only AS DOUBLE) / n, 6) AS acc_a,
        |  round(CAST(n_both_correct + n_b_only AS DOUBLE) / n, 6) AS acc_b,
        |  round(CASE WHEN bb + cc > 0
        |    THEN pow(abs(bb - cc) - 1.0, 2) / (bb + cc) END, 6) AS chi2_cc
        |FROM t""".stripMargin,

    "g_kruskal_wallis" ->
      """WITH cells AS (
        |  SELECT CAST(value AS DOUBLE) AS v, event_type AS g,
        |    count(*) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |perv AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
        |ranked AS (SELECT v, t,
        |    coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (t + 1) / 2.0 AS rk
        |  FROM perv),
        |perg AS (SELECT g, sum(c * rk) AS r, sum(c) AS ng
        |  FROM cells JOIN ranked USING (v) GROUP BY 1),
        |ties AS (SELECT sum(t * t * t - t) AS tcorr FROM ranked),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(r * r / ng) AS rr
        |  FROM perg),
        |h AS (SELECT k, n,
        |    12.0 / (n * (n + 1.0)) * rr - (n + 1) * 3.0 AS h, tcorr
        |  FROM agg CROSS JOIN ties)
        |SELECT k, n, round(h, 6) AS h,
        |  round(CASE WHEN CAST(n AS DOUBLE) * n * n - n > tcorr
        |    THEN h / (1.0 - tcorr / (CAST(n AS DOUBLE) * n * n - n)) END, 6)
        |    AS h_tie_corrected
        |FROM h""".stripMargin,

    "g_brown_forsythe" ->
      """WITH base AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |med AS (SELECT g, quantile_cont(v, 0.5) AS m FROM base GROUP BY 1),
        |z AS (SELECT base.g, abs(v - m) AS z
        |  FROM base JOIN med ON base.g = med.g),
        |byg AS (SELECT g, count(*) AS ng, sum(z) AS sg, sum(z * z) AS ssg
        |  FROM z GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k, sum(sg) / sum(ng) AS grand
        |  FROM byg),
        |agg AS (SELECT k, n,
        |    sum(ng * (sg / ng - grand) * (sg / ng - grand)) AS ss_between,
        |    sum(ssg - sg * sg / ng) AS ss_within
        |  FROM byg CROSS JOIN tot GROUP BY 1, 2)
        |SELECT k, n, round(ss_between, 4) AS ss_between,
        |  round(ss_within, 4) AS ss_within,
        |  k - 1 AS df_between, n - k AS df_within,
        |  round(CASE WHEN k > 1 AND n > k AND ss_within > 0
        |    THEN (ss_between / (k - 1)) / (ss_within / (n - k)) END, 6)
        |    AS f_stat
        |FROM agg""".stripMargin,

    "g_wilcoxon_signed" ->
      """WITH per AS (
        |  SELECT user_id,
        |    round(avg(CASE WHEN event_type = 'click' THEN value END), 6)
        |      AS x,
        |    round(avg(CASE WHEN event_type = 'view' THEN value END), 6)
        |      AS y
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1
        |  HAVING x IS NOT NULL AND y IS NOT NULL),
        |d AS (SELECT x - y AS d FROM per WHERE x - y != 0),
        |cells AS (SELECT abs(d) AS ad,
        |    count(CASE WHEN d > 0 THEN 1 END) AS cp,
        |    count(CASE WHEN d < 0 THEN 1 END) AS cn
        |  FROM d GROUP BY 1),
        |t AS (SELECT ad, cp, cn, cp + cn AS tt FROM cells),
        |r AS (SELECT cp, cn, tt,
        |    coalesce(sum(tt) OVER (ORDER BY ad
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (tt + 1) / 2.0 AS rk
        |  FROM t),
        |s AS (SELECT sum(cp * rk) AS wp, sum(cn * rk) AS wm,
        |    CAST(sum(tt) AS BIGINT) AS n,
        |    sum(tt * tt * tt - tt) AS ties
        |  FROM r)
        |SELECT n, round(wp, 4) AS w_plus, round(wm, 4) AS w_minus,
        |  round(CASE WHEN n > 0 THEN (wp - n * (n + 1) / 4.0)
        |    / sqrt(n * (n + 1) * (n * 2 + 1) / 24.0 - ties / 48.0) END, 6)
        |    AS z
        |FROM s""".stripMargin,

    "g_effect_sizes" ->
      """WITH m AS (
        |  SELECT
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_a,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_b,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS ma,
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS mb,
        |    var_samp(CASE WHEN event_type = 'click' THEN value END) AS va,
        |    var_samp(CASE WHEN event_type = 'view' THEN value END) AS vb
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |cells AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS ca,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS cb
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')
        |  GROUP BY 1),
        |t AS (SELECT v, ca, cb, ca + cb AS tt FROM cells),
        |r AS (SELECT ca, tt,
        |    coalesce(sum(tt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (tt + 1) / 2.0 AS rk
        |  FROM t),
        |u AS (SELECT round(sum(ca * rk)
        |    - (SELECT n_a FROM m) * ((SELECT n_a FROM m) + 1) / 2.0, 6)
        |    AS ua FROM r),
        |d AS (SELECT n_a, n_b, ma, mb, ua,
        |    sqrt(((n_a - 1) * va + (n_b - 1) * vb) / (n_a + n_b - 2)) AS sp
        |  FROM m CROSS JOIN u),
        |e AS (SELECT n_a, n_b, ua,
        |    CASE WHEN sp > 0 THEN (ma - mb) / sp END AS cd
        |  FROM d)
        |SELECT n_a, n_b, round(cd, 6) AS cohens_d,
        |  round(cd * (1.0 - 3.0 / ((n_a + n_b) * 4.0 - 9.0)), 6) AS hedges_g,
        |  round(2.0 * ua / (CAST(n_a AS DOUBLE) * n_b) - 1.0, 6)
        |    AS cliffs_delta
        |FROM e""".stripMargin,

    "g_mann_kendall" ->
      """WITH s AS (
        |  SELECT CAST(epoch_us(ts) // 3600000000 AS DOUBLE) AS x,
        |    round(avg(value), 6) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |pairs AS (SELECT sign(b.y - a.y) AS sgn
        |  FROM s a JOIN s b ON a.x < b.x),
        |ties AS (SELECT sum(t * (t - 1) * (t * 2 + 5)) AS tcorr,
        |    CAST(sum(t) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS t FROM s GROUP BY y)),
        |agg AS (SELECT CAST(sum(sgn) AS DOUBLE) AS sv FROM pairs),
        |v AS (SELECT n, sv,
        |    (CAST(n AS DOUBLE) * (n - 1) * (n * 2 + 5) - tcorr) / 18.0
        |      AS var_s
        |  FROM agg CROSS JOIN ties)
        |SELECT n, sv AS s, round(var_s, 4) AS var_s,
        |  round(CASE WHEN var_s <= 0 THEN 0.0
        |    WHEN sv > 0 THEN (sv - 1) / sqrt(var_s)
        |    WHEN sv < 0 THEN (sv + 1) / sqrt(var_s)
        |    ELSE 0.0 END, 6) AS z
        |FROM v""".stripMargin,

    "g_theil_sen" ->
      """WITH s AS (
        |  SELECT CAST(epoch_us(ts) // 3600000000 AS DOUBLE) AS x,
        |    round(avg(value), 6) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |sl AS (SELECT quantile_cont((b.y - a.y) / (b.x - a.x), 0.5)
        |    AS slope
        |  FROM s a JOIN s b ON a.x < b.x)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(any_value(slope), 9) AS slope,
        |  round(quantile_cont(y - slope * x, 0.5), 4) AS intercept
        |FROM s CROSS JOIN sl""".stripMargin,

    "g_changepoint" ->
      """WITH s AS (
        |  SELECT CAST(epoch_us(ts) // 3600000000 AS DOUBLE) AS x,
        |    round(avg(value), 6) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |c AS (SELECT x,
        |    count(*) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k,
        |    sum(y) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |    count(*) OVER () AS n, sum(y) OVER () AS ts
        |  FROM s),
        |st AS (SELECT x, k, n, cs / k AS ml, (ts - cs) / (n - k) AS mr,
        |    sqrt(k * (n - k) / CAST(n AS DOUBLE)) * abs(cs / k
        |      - (ts - cs) / (n - k)) AS stat
        |  FROM c WHERE k < n),
        |best AS (SELECT *, row_number() OVER (ORDER BY stat DESC, x ASC)
        |    AS r FROM st)
        |SELECT x AS split_x, k AS k_left, n,
        |  round(ml, 6) AS mean_left, round(mr, 6) AS mean_right,
        |  round(stat, 6) AS stat
        |FROM best WHERE r = 1""".stripMargin,

    "g_seasonality" ->
      """WITH byh AS (
        |  SELECT CAST(hour(ts) AS INT) AS season, count(*) AS n,
        |    sum(value) AS s
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |g AS (SELECT sum(s) / sum(n) AS grand FROM byh)
        |SELECT season, n, round(s / n, 6) AS mean,
        |  round(s / n - grand, 6) AS index_add,
        |  round(CASE WHEN grand != 0 THEN (s / n) / grand END, 6)
        |    AS index_mult
        |FROM byh CROSS JOIN g ORDER BY season""".stripMargin,

    "g_rmst" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 3600000000
        |      AS BIGINT) AS dur_h,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0
        |      AS event
        |  FROM events GROUP BY 1),
        |byt AS (SELECT CAST(dur_h AS DOUBLE) AS t,
        |    sum(CASE WHEN event THEN 1 ELSE 0 END) AS d,
        |    sum(CASE WHEN event THEN 0 ELSE 1 END) AS c
        |  FROM per GROUP BY 1),
        |w AS (SELECT t, d, c,
        |    sum(d + c) OVER () - coalesce(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM byt),
        |km AS (SELECT t,
        |    round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
        |        CURRENT ROW) = 1 THEN 0.0
        |    ELSE exp(sum(CASE WHEN d > 0 AND d < n_risk
        |      THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |    END, 6) AS survival
        |  FROM w WHERE d > 0),
        |seg AS (SELECT t, survival,
        |    coalesce(lag(t) OVER (ORDER BY t), 0.0) AS pt,
        |    coalesce(lag(survival) OVER (ORDER BY t), 1.0) AS ps,
        |    row_number() OVER (ORDER BY t DESC) = 1 AS is_last
        |  FROM km WHERE t <= 200.0),
        |agg AS (SELECT
        |    sum(ps * (t - pt)) + sum(CASE WHEN is_last
        |      THEN survival * (200.0 - t) ELSE 0.0 END) AS rmst,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seg)
        |SELECT CAST(200.0 AS DOUBLE) AS tau,
        |  round(CASE WHEN n = 0 THEN 200.0 ELSE rmst END, 6) AS rmst,
        |  n AS n_event_times_used
        |FROM agg""".stripMargin,

    "g_cum_incidence" ->
      """WITH per AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
        |    min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
        |      AS te,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS tp
        |  FROM events GROUP BY 1),
        |d AS (SELECT
        |    CAST((coalesce(CASE
        |        WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp) THEN te
        |        WHEN tp IS NOT NULL THEN tp END, t1) - t0) // 3600000000
        |      AS BIGINT) AS t,
        |    CASE WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp)
        |        THEN 'error'
        |      WHEN tp IS NOT NULL THEN 'purchase' END AS c
        |  FROM per),
        |cells AS (SELECT CAST(t AS DOUBLE) AS t, c, count(*) AS cnt
        |  FROM d GROUP BY 1, 2),
        |byt AS (SELECT t,
        |    sum(CASE WHEN c IS NOT NULL THEN cnt ELSE 0 END) AS dd,
        |    sum(cnt) AS al
        |  FROM cells GROUP BY 1),
        |tot1 AS (SELECT t, dd,
        |    sum(al) OVER () - coalesce(sum(al) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM byt),
        |tot2 AS (SELECT t, n_risk,
        |    round(CASE WHEN coalesce(max(CASE WHEN dd = n_risk THEN 1
        |        ELSE 0 END) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
        |      THEN 0.0
        |      ELSE exp(coalesce(sum(CASE WHEN dd > 0 AND dd < n_risk
        |        THEN ln(1.0 - CAST(dd AS DOUBLE) / n_risk) ELSE 0.0 END)
        |        OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |      END, 6) AS s_prev
        |  FROM tot1)
        |SELECT cells.t, c AS cause, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(cnt AS BIGINT) AS d_cause,
        |  round(sum(s_prev * cnt / n_risk) OVER (PARTITION BY c
        |    ORDER BY cells.t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif
        |FROM cells JOIN tot2 ON cells.t = tot2.t
        |WHERE c IS NOT NULL
        |ORDER BY cause, cells.t""".stripMargin,

    "dq_profile_compare" -> {
      def side(src: String, suf: String) = Seq("value", "user_id",
        "event_type").map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_$suf,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS nulls_$suf,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS distinct_$suf,
           |  avg(TRY_CAST($c AS DOUBLE)) AS mean_$suf
           |FROM $src""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH bsrc AS (SELECT * FROM events WHERE event_type != 'error'),
         |pa AS (${side("events", "a")}),
         |pb AS (${side("bsrc", "b")}),
         |j AS (SELECT col_name, n_a, n_b,
         |    CAST(nulls_a AS DOUBLE) / n_a AS nfa,
         |    CAST(nulls_b AS DOUBLE) / n_b AS nfb,
         |    mean_a, mean_b,
         |    CASE WHEN mean_a IS NOT NULL AND mean_b IS NOT NULL THEN
         |      CASE WHEN abs(mean_a) > 0
         |        THEN abs(mean_b - mean_a) / abs(mean_a)
         |        ELSE abs(mean_b - mean_a) END END AS mrd,
         |    distinct_a, distinct_b,
         |    CAST(abs(distinct_b - distinct_a) AS DOUBLE)
         |      / greatest(distinct_a, 1) AS ddelta
         |  FROM pa JOIN pb USING (col_name))
         |SELECT col_name, n_a, n_b,
         |  round(nfa, 6) AS null_frac_a, round(nfb, 6) AS null_frac_b,
         |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
         |  round(mrd, 6) AS mean_rel_delta, distinct_a, distinct_b,
         |  abs(nfb - nfa) <= 0.01 AS null_ok,
         |  CASE WHEN mean_a IS NULL AND mean_b IS NULL THEN true
         |    WHEN mean_a IS NULL OR mean_b IS NULL THEN false
         |    ELSE mrd <= 0.05 END AS mean_ok,
         |  ddelta <= 0.15 AS distinct_ok,
         |  (abs(nfb - nfa) <= 0.01) AND (CASE WHEN mean_a IS NULL
         |    AND mean_b IS NULL THEN true WHEN mean_a IS NULL
         |    OR mean_b IS NULL THEN false ELSE mrd <= 0.05 END)
         |    AND (ddelta <= 0.15) AS ok
         |FROM j ORDER BY col_name""".stripMargin
    },

    "g_weighted_quantiles" ->
      """WITH cells AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS v,
        |    sum(CAST(n_chars AS DOUBLE)) AS w
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0
        |  GROUP BY 1),
        |cum AS (SELECT v,
        |    sum(w) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER () AS tw
        |  FROM cells),
        |qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |    CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q)
        |SELECT q, min(v) AS value,
        |  round(min_by(cw, v), 4) AS cum_weight,
        |  round(min_by(tw, v), 4) AS total_weight
        |FROM qs JOIN cum ON cw >= q * tw
        |GROUP BY q ORDER BY q""".stripMargin,

    "g_tost" ->
      """WITH m AS (
        |  SELECT
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS n_a,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_b,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS ma,
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS mb,
        |    var_samp(CASE WHEN event_type = 'click' THEN value END) AS va,
        |    var_samp(CASE WHEN event_type = 'view' THEN value END) AS vb
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |d AS (SELECT n_a, n_b, ma - mb AS md,
        |    sqrt(va / n_a + vb / n_b) AS se
        |  FROM m)
        |SELECT n_a, n_b, round(md, 6) AS mean_diff, round(se, 6) AS se,
        |  round(CASE WHEN se > 0 THEN (md + 5.0) / se END, 6) AS z_lower,
        |  round(CASE WHEN se > 0 THEN (5.0 - md) / se END, 6) AS z_upper,
        |  (CASE WHEN se > 0 THEN (md + 5.0) / se END) > 1.6448536269514722
        |    AND (CASE WHEN se > 0 THEN (5.0 - md) / se END)
        |      > 1.6448536269514722 AS equivalent
        |FROM d""".stripMargin,

    "g_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS nxt
        |  -- ts/event_id null filters mirror the op's pre-window drop
        |  -- (Spark orders NULLs first, DuckDB last — an unfiltered NULL
        |  -- would sit at different sequence positions per engine)
        |  FROM events WHERE event_type IS NOT NULL
        |    AND ts IS NOT NULL AND event_id IS NOT NULL),
        |t AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6) AS p
        |FROM t ORDER BY 1, 2""".stripMargin,

    "g_rfm" ->
      """WITH per AS (
        |  SELECT user_id AS entity, max(epoch_us(ts)) AS lastt,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    coalesce(sum(value), 0.0) AS monetary
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |rec AS (SELECT entity,
        |    CAST((max(lastt) OVER () - lastt) // 3600000000 AS BIGINT)
        |      AS recency_h,
        |    frequency, monetary
        |  FROM per),
        |scored AS (SELECT entity, recency_h, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency_h DESC, entity) AS INT)
        |      AS r,
        |    CAST(ntile(5) OVER (ORDER BY frequency ASC, entity) AS INT)
        |      AS f,
        |    CAST(ntile(5) OVER (ORDER BY monetary ASC, entity) AS INT)
        |      AS m
        |  FROM rec)
        |SELECT entity, recency_h, frequency, round(monetary, 4) AS monetary,
        |  r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
        |    AS rfm
        |FROM scored ORDER BY entity""".stripMargin,

    "g_poisson_rates" ->
      """WITH span AS (
        |  SELECT (max(epoch_us(ts)) - min(epoch_us(ts))) / 3600000000.0
        |    AS ex
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1)
        |SELECT grp, n, round(ex, 6) AS exposure_h,
        |  round(n / ex, 6) AS rate_per_h,
        |  round(greatest(0.0, (n - 1.96 * sqrt(n)) / ex), 6) AS ci_lo,
        |  round((n + 1.96 * sqrt(n)) / ex, 6) AS ci_hi
        |FROM g CROSS JOIN span ORDER BY grp""".stripMargin,

    "g_posthoc_pairs" ->
      """WITH byg AS (
        |  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
        |    avg(value) AS m, var_samp(value) AS vv
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |p AS (SELECT a.g AS grp_a, b.g AS grp_b, a.n AS n_a, b.n AS n_b,
        |    a.m - b.m AS md, a.vv / a.n AS sa, b.vv / b.n AS sb
        |  FROM byg a JOIN byg b ON a.g < b.g)
        |SELECT grp_a, grp_b, n_a, n_b, round(md, 6) AS mean_diff,
        |  round(sqrt(sa + sb), 6) AS se,
        |  round(CASE WHEN sqrt(sa + sb) > 0
        |    THEN md / sqrt(sa + sb) END, 6) AS z,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND sa + sb > 0
        |    THEN pow(sa + sb, 2)
        |      / (pow(sa, 2) / (n_a - 1) + pow(sb, 2) / (n_b - 1)) END, 4)
        |    AS dof
        |FROM p ORDER BY 1, 2""".stripMargin,

    "g_chi2_drift" ->
      """WITH obs AS (
        |  SELECT coalesce(CAST(lang AS VARCHAR), '§null§') AS g,
        |    coalesce(CAST(source AS VARCHAR), '§null§') AS c,
        |    count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |mg AS (SELECT g, sum(o) AS ng FROM obs GROUP BY 1),
        |mc AS (SELECT c, sum(o) AS nc FROM obs GROUP BY 1),
        |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM mg),
        |grid AS (
        |  SELECT CAST(mg.ng AS DOUBLE) * mc.nc / tot.n AS e,
        |    coalesce(obs.o, 0) AS o
        |  FROM mg CROSS JOIN mc CROSS JOIN tot
        |  LEFT JOIN obs ON obs.g = mg.g AND obs.c = mc.c),
        |agg AS (SELECT sum(pow(CAST(o AS DOUBLE) - e, 2) / e) AS chi2
        |        FROM grid)
        |SELECT round(chi2, 9) AS chi2,
        |  ((SELECT count(*) FROM mg) - 1) *
        |    ((SELECT count(*) FROM mc) - 1) AS dof,
        |  round(sqrt(chi2 / ((SELECT n FROM tot) *
        |    (least((SELECT count(*) FROM mg),
        |           (SELECT count(*) FROM mc)) - 1.0))), 9) AS cramers_v,
        |  (SELECT n FROM tot) AS n
        |FROM agg""".stripMargin,

    "g_dp_counts" -> {
      val b = 1.0 / 0.5
      val u0 = graft.ops.Robustness.seededUniformSql("11",
        Seq(graft.ops.IntHash.stringHashSql("gs")))
      s"""WITH c AS (SELECT source AS grp, count(*) AS n_true
         |           FROM documents GROUP BY 1),
         |g AS (SELECT grp, n_true,
         |        coalesce(CAST(grp AS VARCHAR), '') AS gs FROM c),
         |u AS (SELECT grp, n_true,
         |        greatest(least($u0, 1.0 - 1e-12), 1e-12) AS u FROM g)
         |SELECT grp AS source, n_true,
         |  round(n_true + CASE WHEN u < 0.5 THEN $b * ln(2.0 * u)
         |    ELSE -$b * ln(2.0 * (1.0 - u)) END, 6) AS n_noisy
         |FROM u ORDER BY source""".stripMargin
    },

    "g_spearman" ->
      """WITH t AS (SELECT CAST(l_quantity AS DOUBLE) AS vx,
        |             CAST(l_extendedprice AS DOUBLE) AS vy FROM lineitem
        |           WHERE l_quantity IS NOT NULL
        |             AND l_extendedprice IS NOT NULL),
        |cx AS (SELECT vx, count(*) AS n FROM t GROUP BY 1),
        |rx AS (SELECT vx,
        |  CAST(coalesce(sum(n) OVER (ORDER BY vx ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |  + CAST(n + 1 AS DOUBLE) / 2.0 AS rxx FROM cx),
        |cy AS (SELECT vy, count(*) AS n FROM t GROUP BY 1),
        |ry AS (SELECT vy,
        |  CAST(coalesce(sum(n) OVER (ORDER BY vy ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |  + CAST(n + 1 AS DOUBLE) / 2.0 AS ryy FROM cy)
        |SELECT count(*) AS n,
        |  round(CASE WHEN stddev_samp(rxx) > 0 AND stddev_samp(ryy) > 0
        |    THEN covar_samp(rxx, ryy)
        |      / (stddev_samp(rxx) * stddev_samp(ryy)) END, 6) AS spearman
        |FROM t JOIN rx USING (vx) JOIN ry USING (vy)""".stripMargin,

    "g_cohort_retention" ->
      """WITH e AS (SELECT user_id,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 604800000000.0)
        |      AS BIGINT) AS p
        |  FROM events),
        |f AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, p FROM e),
        |j AS (SELECT a.user_id, f.cohort,
        |        CAST(a.p - f.cohort AS INT) AS "offset"
        |      FROM a JOIN f USING (user_id)
        |      WHERE a.p - f.cohort BETWEEN 0 AND 6),
        |s AS (SELECT cohort, count(*) AS n_cohort FROM f GROUP BY 1)
        |SELECT j.cohort, j."offset",
        |  CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
        |  s.n_cohort,
        |  round(CAST(count(DISTINCT j.user_id) AS DOUBLE) / s.n_cohort, 6)
        |    AS retention
        |FROM j JOIN s USING (cohort)
        |GROUP BY 1, 2, s.n_cohort ORDER BY 1, 2""".stripMargin,

    "g_gini_tokens" ->
      """WITH byg AS (
        |  SELECT source AS grp,
        |    CAST(sum(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |      AS BIGINT) AS w
        |  FROM documents GROUP BY 1),
        |r AS (SELECT grp, w,
        |        row_number() OVER (ORDER BY w, grp) AS rank FROM byg),
        |a AS (SELECT *, sum(w) OVER () AS tot, count(*) OVER () AS n,
        |        sum(w) OVER (ORDER BY w, grp ROWS UNBOUNDED PRECEDING) AS cum,
        |        sum(rank * w) OVER () AS iw FROM r)
        |SELECT rank, grp AS source, w,
        |  round(CAST(w AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
        |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share,
        |  round(2.0 * CAST(iw AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
        |    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a ORDER BY rank""".stripMargin,

    "g_kaplan_meier" ->
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
        |    round(CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
        |      ELSE exp(sum(CASE WHEN d > 0 AND d < n_risk
        |        THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)) END, 6) AS survival,
        |    sum(CASE WHEN d > 0 AND d < n_risk
        |      THEN CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
        |        * CAST(n_risk - d AS DOUBLE)) ELSE 0.0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS gw
        |  FROM w),
        |z AS (SELECT *, round(survival * sqrt(gw), 6) AS se FROM s)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
        |  survival, se,
        |  round(greatest(0.0, survival - 1.96 * se), 6) AS ci_lo,
        |  round(least(1.0, survival + 1.96 * se), 6) AS ci_hi
        |FROM z WHERE d > 0 ORDER BY t""".stripMargin,

    // pass verdicts compare EXACT integer counts (num = base), never the
    // 6-dp metric face — mirrors DataQuality.check, where a sub-5e-7
    // violation rate would round to 1.000000 and silently pass
    "dq_constraints" ->
      """WITH c AS (SELECT
        |  count(l_orderkey) AS nn_num,
        |  count(DISTINCT (l_orderkey, l_linenumber)) AS uq_num,
        |  sum(CASE WHEN l_discount IS NOT NULL
        |    AND l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END) AS disc_num,
        |  count(l_discount) AS disc_base,
        |  sum(CASE WHEN l_quantity IS NOT NULL
        |    AND l_quantity BETWEEN 1.0 AND 45.0 THEN 1 ELSE 0 END) AS qty_num,
        |  count(l_quantity) AS qty_base,
        |  sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
        |    THEN 1 ELSE 0 END) AS inset_num,
        |  count(l_returnflag) AS inset_base,
        |  sum(CASE WHEN regexp_matches(l_linestatus, '^[OF]$')
        |    THEN 1 ELSE 0 END) AS re_num,
        |  count(l_linestatus) AS re_base,
        |  count(*) AS n
        |  FROM lineitem),
        |fkc AS (SELECT
        |  (SELECT count(*) FROM lineitem l
        |   JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |     ON l.l_orderkey = o.o_orderkey
        |   WHERE l.l_orderkey IS NOT NULL) AS hit,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL) AS total),
        |m AS (SELECT
        |  round(CAST(nn_num AS DOUBLE) / n, 6) AS not_null_ok,
        |  nn_num = n AS nn_pass,
        |  round(CAST(uq_num AS DOUBLE) / n, 6) AS uniq,
        |  uq_num = n AS uq_pass,
        |  round(CAST(disc_num AS DOUBLE) / disc_base, 6) AS r_disc,
        |  disc_num = disc_base AS disc_pass,
        |  round(CAST(qty_num AS DOUBLE) / qty_base, 6) AS r_qty,
        |  qty_num = qty_base AS qty_pass,
        |  round(CAST(inset_num AS DOUBLE) / inset_base, 6) AS inset,
        |  inset_num = inset_base AS inset_pass,
        |  round(CAST(re_num AS DOUBLE) / re_base, 6) AS re_ok,
        |  re_num = re_base AS re_pass,
        |  CAST(n AS DOUBLE) AS n,
        |  n >= 1000 AND n <= 10000000 AS n_pass
        |  FROM c),
        |fk AS (SELECT round(CAST(hit AS DOUBLE) / total, 6) AS cov,
        |  hit = total AS fk_pass FROM fkc)
        |SELECT * FROM (
        |  SELECT 'in_range(l_discount)' AS rule, r_disc AS metric,
        |    CAST(1.0 AS DOUBLE) AS threshold, disc_pass AS pass FROM m
        |  UNION ALL SELECT 'in_range(l_quantity)', r_qty, 1.0,
        |    qty_pass FROM m
        |  UNION ALL SELECT 'in_set(l_returnflag)', inset, 1.0,
        |    inset_pass FROM m
        |  UNION ALL SELECT 'matches_regex(l_linestatus)', re_ok, 1.0,
        |    re_pass FROM m
        |  UNION ALL SELECT 'not_null(l_orderkey)', not_null_ok, 1.0,
        |    nn_pass FROM m
        |  UNION ALL SELECT 'ref_integrity(l_orderkey)', cov, 1.0,
        |    fk_pass FROM fk
        |  UNION ALL SELECT 'row_count', n, CAST(1000.0 AS DOUBLE),
        |    n_pass FROM m
        |  UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', uniq, 1.0,
        |    uq_pass FROM m)
        |ORDER BY rule""".stripMargin,

    "g_grouped_quantiles" ->
      """WITH t AS (
        |  SELECT lang, CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS v
        |  FROM documents)
        |SELECT lang, round(quantile_cont(v, 0.5), 6) AS p50,
        |  round(quantile_cont(v, 0.9), 6) AS p90,
        |  round(quantile_cont(v, 0.99), 6) AS p99
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_join_cardinality" ->
      """WITH ca AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS na
        |            FROM events GROUP BY 1),
        |cb AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS nb
        |       FROM events GROUP BY 1),
        |p AS (SELECT ca.k, ca.na * cb.nb AS pr FROM ca JOIN cb USING (k)),
        |j AS (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS output_rows,
        |  count(*) AS n_keys_joined,
        |  CAST(coalesce(max(pr), 0) AS BIGINT) AS max_key_output,
        |  (SELECT k FROM p ORDER BY pr DESC, k LIMIT 1) AS top1_key FROM p),
        |t AS (SELECT count(*) AS rows_a FROM events),
        |u AS (SELECT count(*) AS rows_b FROM events)
        |SELECT rows_a, rows_b, output_rows, n_keys_joined, max_key_output,
        |  top1_key,
        |  round(CAST(output_rows AS DOUBLE)
        |    / greatest(rows_a, rows_b), 6) AS amplification
        |FROM t CROSS JOIN u CROSS JOIN j""".stripMargin,

    "g_histogram" ->
      """WITH c AS (
        |  SELECT CASE WHEN value < 0.0 THEN -1
        |    WHEN value >= 100.0 THEN 20
        |    ELSE least(CAST(floor((value - 0.0) / 5.0) AS INT), 19) END AS bin,
        |    count(*) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |spine AS (SELECT CAST(unnest(generate_series(-1, 20)) AS INT) AS bin)
        |SELECT s.bin,
        |  CASE WHEN s.bin >= 0
        |    THEN CAST(0.0 AS DOUBLE) + s.bin * CAST(5.0 AS DOUBLE) END AS bin_lo,
        |  CASE WHEN s.bin < 20
        |    THEN CAST(0.0 AS DOUBLE) + (s.bin + 1) * CAST(5.0 AS DOUBLE) END AS bin_hi,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM spine s LEFT JOIN c USING (bin)
        |ORDER BY s.bin""".stripMargin,

    "g_purged_split" ->
      """WITH e AS (SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS t
        |           FROM events),
        |b AS (SELECT round(quantile_cont(t, 0.2), 6) AS b1,
        |             round(quantile_cont(t, 0.4), 6) AS b2,
        |             round(quantile_cont(t, 0.6), 6) AS b3,
        |             round(quantile_cont(t, 0.8), 6) AS b4 FROM e),
        |f AS (SELECT event_id, t,
        |  CAST(t > b1 AS INT) + CAST(t > b2 AS INT)
        |    + CAST(t > b3 AS INT) + CAST(t > b4 AS INT) AS fold, b3
        |  FROM e CROSS JOIN b)
        |SELECT event_id, fold,
        |  CASE WHEN fold = 2 THEN 'eval'
        |       WHEN fold > 2 AND t <= b3 + 43200000000.0 THEN 'embargoed'
        |       ELSE 'train' END AS role
        |FROM f ORDER BY event_id""".stripMargin,

    "g_funnel" ->
      """WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS DOUBLE) AS t,
        |             event_type FROM events),
        |s0 AS (SELECT user_id, min(t) AS t0 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.t) AS t1,
        |         min(s0.t0 + 259200000000.0) AS d
        |       FROM e JOIN s0 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.t >= s0.t0
        |         AND e.t <= s0.t0 + 259200000000.0
        |       GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.t >= s1.t1
        |         AND e.t <= s1.d
        |       GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s0) AS n0,
        |             (SELECT count(*) FROM s1) AS n1,
        |             (SELECT count(*) FROM s2) AS n2)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS step_idx, 'signup' AS step,
        |    CAST(n0 AS BIGINT) AS n_entities,
        |    round(CASE WHEN n0 = 0 THEN 0.0
        |      ELSE CAST(n0 AS DOUBLE) / n0 END, 6) AS conversion FROM c
        |  UNION ALL
        |  SELECT 1, 'click', CAST(n1 AS BIGINT),
        |    round(CASE WHEN n0 = 0 THEN 0.0
        |      ELSE CAST(n1 AS DOUBLE) / n0 END, 6) FROM c
        |  UNION ALL
        |  SELECT 2, 'purchase', CAST(n2 AS BIGINT),
        |    round(CASE WHEN n0 = 0 THEN 0.0
        |      ELSE CAST(n2 AS DOUBLE) / n0 END, 6) FROM c)
        |ORDER BY step_idx""".stripMargin,

    "g_skew_report" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS n
        |           FROM events GROUP BY 1),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |  CAST(max(n) AS BIGINT) AS max_key_rows,
        |  (SELECT k FROM c ORDER BY n DESC, k LIMIT 1) AS top1_key FROM c)
        |SELECT n_rows, n_keys, max_key_rows, top1_key,
        |  round(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS max_share,
        |  round(CAST(max_key_rows AS DOUBLE)
        |    / (CAST(n_rows AS DOUBLE) / n_keys), 6) AS skew_ratio,
        |  greatest(CAST(1 AS BIGINT), CAST(ceil(CAST(max_key_rows AS DOUBLE)
        |    / (CAST(n_rows AS DOUBLE) / 32)) AS BIGINT)) AS suggested_salt
        |FROM a""".stripMargin,

    "g_dp_mean" -> {
      val bC = 2.0 / 0.5                    // count noise scale
      val bS = 2.0 * 50.0 / 0.5             // clipped-sum noise scale
      // the salted key strings are precomputed columns: stringHashSql
      // textually indexes its argument ($s[i]), and an inline '..' || ..
      // expression would bind as 'c|' || (expr[i])
      def uExpr(keyCol: String) = {
        val u0 = graft.ops.Robustness.seededUniformSql("13",
          Seq(graft.ops.IntHash.stringHashSql(keyCol)))
        s"greatest(least($u0, 1.0 - 1e-12), 1e-12)"
      }
      s"""WITH c AS (SELECT event_type AS grp, count(*) AS n_true,
         |  sum(CAST(round(greatest(least(value, 50.0), 0.0), 6)
         |    AS DECIMAL(18,6))) AS sum_true
         |  FROM events GROUP BY 1),
         |k AS (SELECT grp, n_true, sum_true,
         |  'c|' || coalesce(CAST(grp AS VARCHAR), '') AS kc,
         |  's|' || coalesce(CAST(grp AS VARCHAR), '') AS ks FROM c),
         |u AS (SELECT grp, n_true, sum_true,
         |  ${uExpr("kc")} AS uc, ${uExpr("ks")} AS us FROM k),
         |n AS (SELECT grp, n_true, sum_true,
         |  n_true + CASE WHEN uc < 0.5 THEN $bC * ln(2.0 * uc)
         |    ELSE -$bC * ln(2.0 * (1.0 - uc)) END AS n_noisy,
         |  CAST(sum_true AS DOUBLE) + CASE WHEN us < 0.5 THEN $bS * ln(2.0 * us)
         |    ELSE -$bS * ln(2.0 * (1.0 - us)) END AS sum_noisy
         |  FROM u)
         |SELECT grp AS event_type, n_true,
         |  round(CAST(sum_true AS DOUBLE), 6) AS sum_true,
         |  round(n_noisy, 6) AS n_noisy, round(sum_noisy, 6) AS sum_noisy,
         |  round(sum_noisy / greatest(1.0, n_noisy), 6) AS mean_dp
         |FROM n ORDER BY event_type""".stripMargin
    },

    "g_winsorize" ->
      """WITH f AS (
        |  SELECT round(quantile_cont(value, 0.05), 6) AS lo,
        |         round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  round(avg(greatest(least(value, hi), lo)), 6) AS avg_w,
        |  round(min(greatest(least(value, hi), lo)), 6) AS min_w,
        |  round(max(greatest(least(value, hi), lo)), 6) AS max_w
        |FROM events CROSS JOIN f GROUP BY 1 ORDER BY 1""".stripMargin,

    // quantile_disc = inclusive-rank order statistic = the KLL sketch's
    // EXACT-regime answer (n <= k at this SF) — see the query's comment
    "g_winsorize_sketch" ->
      """WITH f AS (
        |  SELECT round(quantile_disc(CAST(value AS DOUBLE), 0.05), 6) AS lo,
        |         round(quantile_disc(CAST(value AS DOUBLE), 0.95), 6) AS hi
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  round(avg(greatest(least(value, hi), lo)), 6) AS avg_w,
        |  round(min(greatest(least(value, hi), lo)), 6) AS min_w,
        |  round(max(greatest(least(value, hi), lo)), 6) AS max_w
        |FROM events CROSS JOIN f GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  round(avg(l_extendedprice), 4) AS mean_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |  count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,

    "q_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  round(CAST(min($c) AS DOUBLE), 4) AS min_v,
           |  round(CAST(max($c) AS DOUBLE), 4) AS max_v,
           |  round(avg($c), 4) AS mean_v
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_grouping_sets" ->
      """SELECT event_type, CAST(user_id % 4 AS INTEGER) AS user_bucket,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 4 AS INTEGER)), ())
        |ORDER BY event_type NULLS LAST, user_bucket NULLS LAST""".stripMargin,

    "q_unpivot" ->
      """WITH long AS (
        |  SELECT p_partkey, 'retail' AS measure, CAST(p_retailprice AS DOUBLE) AS value
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size_v', CAST(p_size AS DOUBLE) FROM part)
        |SELECT measure, count(*) AS n, round(sum(value), 2) AS total
        |FROM long GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS revenue_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS revenue_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS revenue_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_mutual_info" ->
      """WITH j AS (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '§null§') AS x,
        |         coalesce(CAST(CAST(floor(value / 50.0) AS BIGINT) AS VARCHAR), '§null§') AS y,
        |         count(*) AS n_xy
        |  FROM events GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM j GROUP BY 1),
        |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM j GROUP BY 1),
        |t AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM j)
        |SELECT round(sum((n_xy / n) * ln((n_xy * n) / (n_x * n_y))), 6) AS mi_nats
        |FROM j JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t""".stripMargin,

    "g_ks_drift" ->
      """WITH c AS (
        |  SELECT value AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |n AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |cum AS (SELECT sum(ca) OVER (ORDER BY v) AS cka,
        |               sum(cb) OVER (ORDER BY v) AS ckb FROM c)
        |SELECT round(max(abs(CAST(cka AS DOUBLE) / na - CAST(ckb AS DOUBLE) / nb)), 6) AS ks_stat,
        |       na AS n_a, nb AS n_b
        |FROM cum CROSS JOIN n GROUP BY na, nb""".stripMargin,

    "g_wasserstein" ->
      """WITH c AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |  GROUP BY 1),
        |n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb,
        |             CAST(count(*) AS BIGINT) AS nd FROM c),
        |cum AS (SELECT v,
        |    sum(ca) OVER (ORDER BY v) AS cka,
        |    sum(cb) OVER (ORDER BY v) AS ckb,
        |    lead(v) OVER (ORDER BY v) - v AS dx
        |  FROM c)
        |-- scalar subquery, not GROUP BY: a single-distinct-value input
        |-- leaves zero dx rows, and a grouped query would then return
        |-- ZERO rows where the op faces one row with w1 = 0
        |SELECT round(coalesce((SELECT sum(
        |    abs(CAST(cka AS DOUBLE) / na - CAST(ckb AS DOUBLE) / nb)
        |      * dx) FROM cum WHERE dx IS NOT NULL), 0.0), 6) AS w1,
        |  na AS n_a, nb AS n_b, nd AS n_distinct
        |FROM n""".stripMargin,

    "g_cvm_drift" ->
      """WITH c AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS cb
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |  GROUP BY 1),
        |n AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |             CAST(sum(cb) AS BIGINT) AS nb FROM c),
        |cum AS (SELECT ca, cb,
        |    sum(ca) OVER (ORDER BY v) AS cka,
        |    sum(cb) OVER (ORDER BY v) AS ckb
        |  FROM c)
        |SELECT round(sum(CAST(ca + cb AS DOUBLE) *
        |    pow(CAST(cka AS DOUBLE) / na - CAST(ckb AS DOUBLE) / nb, 2))
        |    * (CAST(na AS DOUBLE) * nb / pow(na + nb, 2)), 6) AS cvm,
        |  na AS n_a, nb AS n_b
        |FROM cum CROSS JOIN n GROUP BY na, nb""".stripMargin,

    "g_drift_report" ->
      """WITH src AS (
        |  SELECT event_type AS g, f, v FROM (
        |    SELECT event_type, 'value' AS f, CAST(value AS DOUBLE) AS v
        |    FROM events
        |    UNION ALL
        |    SELECT event_type, 'uid_mod', CAST(user_id % 97 AS DOUBLE)
        |    FROM events
        |    UNION ALL
        |    SELECT event_type, 'eid_mod', CAST(event_id % 101 AS DOUBLE)
        |    FROM events) t
        |  WHERE v IS NOT NULL AND event_type IN ('click', 'view')),
        |c AS (
        |  SELECT f, v,
        |    CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM src GROUP BY 1, 2),
        |tot AS (SELECT f, CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM c GROUP BY 1),
        |cum AS (SELECT f, v, ca, cb,
        |    sum(ca) OVER (PARTITION BY f ORDER BY v) AS cka,
        |    sum(cb) OVER (PARTITION BY f ORDER BY v) AS ckb,
        |    lead(v) OVER (PARTITION BY f ORDER BY v) - v AS dx
        |  FROM c),
        |j AS (SELECT cum.*, tot.na, tot.nb, tot.nd,
        |    CAST(cka AS DOUBLE) / na - CAST(ckb AS DOUBLE) / nb AS d
        |  FROM cum JOIN tot USING (f)),
        |triad AS (SELECT f, na, nb, nd,
        |    max(abs(d)) AS ks,
        |    coalesce(sum(CASE WHEN dx IS NOT NULL THEN abs(d) * dx END),
        |      0.0) AS w1,
        |    sum(CAST(ca + cb AS DOUBLE) * d * d)
        |      * (CAST(na AS DOUBLE) * nb
        |         / (CAST(na + nb AS DOUBLE) * (na + nb))) AS cvm
        |  FROM j GROUP BY 1, 2, 3, 4),
        |binned AS (SELECT f, na, nb,
        |    least(greatest(
        |      CAST(ceil(CAST(cka AS DOUBLE) / na * 10) AS BIGINT) - 1,
        |      0), 9) AS bin,
        |    CAST(sum(ca) AS BIGINT) AS nr, CAST(sum(cb) AS BIGINT) AS nc
        |  FROM j GROUP BY 1, 2, 3, 4),
        |dense AS (SELECT t.f, t.na, t.nb, r.range AS bin,
        |    coalesce(b.nr, 0) AS nr, coalesce(b.nc, 0) AS nc
        |  FROM tot t CROSS JOIN range(10) r
        |  LEFT JOIN binned b ON b.f = t.f AND b.bin = r.range),
        |psi AS (SELECT f, sum((p - q) * ln(p / q)) AS psi FROM (
        |    SELECT f, (nr + 0.5) / (na + 5.0) AS p,
        |      (nc + 0.5) / (nb + 5.0) AS q
        |    FROM dense) d GROUP BY 1)
        |SELECT tr.f AS feature, tr.na AS n_a, tr.nb AS n_b,
        |  tr.nd AS n_distinct,
        |  round(tr.ks, 6) AS ks, round(tr.w1, 6) AS w1,
        |  round(tr.cvm, 6) AS cvm, round(p.psi, 6) AS psi
        |FROM triad tr JOIN psi p ON p.f = tr.f
        |ORDER BY feature""".stripMargin,

    "g_welch_ttest" ->
      """WITH s AS (
        |  SELECT avg(value) FILTER (WHERE event_type = 'click') AS m1,
        |         avg(value) FILTER (WHERE event_type = 'view') AS m2,
        |         var_samp(value) FILTER (WHERE event_type = 'click') AS s1,
        |         var_samp(value) FILTER (WHERE event_type = 'view') AS s2,
        |         count(value) FILTER (WHERE event_type = 'click') AS n1,
        |         count(value) FILTER (WHERE event_type = 'view') AS n2
        |  FROM events)
        |SELECT round((m1 - m2) / sqrt(s1/n1 + s2/n2), 6) AS t_stat,
        |       round(pow(s1/n1 + s2/n2, 2) /
        |             (pow(s1/n1, 2) / (n1 - 1) + pow(s2/n2, 2) / (n2 - 1)), 4) AS dof,
        |       round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
        |       n1 AS n_a, n2 AS n_b
        |FROM s""".stripMargin,

    "g_krippendorff" ->
      """WITH rat AS (
        |  SELECT user_id % 200 AS i, CAST(floor(value / 100.0) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT i, c, count(*) AS r FROM rat GROUP BY 1, 2),
        |pi AS (SELECT i, CAST(sum(r) AS BIGINT) AS n,
        |              CAST(sum(r * r) AS BIGINT) AS r2
        |       FROM r GROUP BY 1 HAVING sum(r) >= 2),
        |obs AS (SELECT sum(CAST(n * n - r2 AS DOUBLE) / (n - 1)) AS do_off,
        |               CAST(sum(n) AS BIGINT) AS n, count(*) AS n_items FROM pi),
        |mg AS (SELECT CAST(sum(nc * nc) AS BIGINT) AS nc2 FROM (
        |        SELECT r.c, CAST(sum(r.r) AS BIGINT) AS nc
        |        FROM r JOIN pi USING (i) GROUP BY 1))
        |SELECT round(1.0 - (obs.n - 1) * obs.do_off / (obs.n * obs.n - mg.nc2), 6) AS alpha,
        |       CAST(obs.n_items AS BIGINT) AS n_items, obs.n AS n_ratings
        |FROM obs CROSS JOIN mg""".stripMargin,

    "g_bh_fdr" ->
      """WITH ev AS (
        |  SELECT event_type || '_' || CAST(user_id % 4 AS VARCHAR) AS feature,
        |         value, epoch_us(ts) < 1705363200000000 AS early
        |  FROM events),
        |t AS (
        |  SELECT feature,
        |    avg(value) FILTER (early) AS m1, avg(value) FILTER (NOT early) AS m2,
        |    var_samp(value) FILTER (early) AS s1, var_samp(value) FILTER (NOT early) AS s2,
        |    count(value) FILTER (early) AS n1, count(value) FILTER (NOT early) AS n2
        |  FROM ev GROUP BY 1),
        |p AS (
        |  SELECT feature, least(1.0, 1.0 /
        |      (((m1 - m2) / sqrt(s1/n1 + s2/n2)) * ((m1 - m2) / sqrt(s1/n1 + s2/n2)))) AS p
        |  FROM t),
        |r AS (SELECT feature, p, row_number() OVER (ORDER BY p ASC, feature ASC) AS rank,
        |             count(*) OVER () AS m FROM p),
        |adj AS (
        |  SELECT feature, p, rank, m,
        |    least(1.0, min(p * m / rank) OVER (ORDER BY rank DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj,
        |    CASE WHEN p <= rank * 0.2 / m THEN rank END AS hit
        |  FROM r),
        |cut AS (SELECT max(hit) AS c FROM adj)
        |SELECT feature, round(p, 6) AS p, rank, round(p_adj, 6) AS p_adj,
        |       (c IS NOT NULL AND rank <= c) AS reject
        |FROM adj CROSS JOIN cut ORDER BY rank""".stripMargin,

    "g_sessionize_gap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
        |m AS (SELECT user_id, t,
        |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 21600000000
        |             THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT user_id, t,
        |        CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY t
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |      FROM m)
        |SELECT user_id, session_id, count(*) AS n_events, min(t) AS first_us,
        |       max(t) AS last_us, max(t) - min(t) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g_resample_ffill" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT u.user_id, CAST(gs.g AS BIGINT) AS ts_us
        |      FROM u CROSS JOIN generate_series(1704067200000000,
        |        1706745600000000, 21600000000) gs(g)),
        |r AS (SELECT user_id, epoch_us(ts) AS ts_us,
        |        round(max(value), 4) AS last_value
        |      FROM events GROUP BY 1, 2)
        |SELECT g.user_id, g.ts_us, r.last_value, r.ts_us AS last_event_us
        |FROM g ASOF LEFT JOIN r ON g.user_id = r.user_id AND g.ts_us >= r.ts_us
        |ORDER BY 1, 2""".stripMargin,

    "g_ewma" ->
      s"""WITH RECURSIVE s AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS rn
         |  FROM events),
         |e AS (
         |  SELECT user_id, ts_us, rn, value AS y FROM s WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.ts_us, s.rn, ${1.0 - 0.3} * e.y + ${0.3} * s.value
         |  FROM s JOIN e ON s.user_id = e.user_id AND s.rn = e.rn + 1)
         |SELECT user_id, ts_us, round(y, 6) AS ewma
         |FROM e ORDER BY user_id, ts_us""".stripMargin,

    "g_cusum" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS cents,
         |    epoch_us(ts) AS ts_us
         |  FROM events),
         |c AS (
         |  SELECT event_type, event_id, ts_us,
         |    sum(cents - 4000.0 - 500.0) OVER w AS c_up,
         |    sum(4000.0 - cents - 500.0) OVER w AS c_dn
         |  FROM e
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
         |               ROWS UNBOUNDED PRECEDING)),
         |s AS (
         |  SELECT event_type, event_id,
         |    c_up - least(0.0, min(c_up) OVER w) AS s_up,
         |    c_dn - least(0.0, min(c_dn) OVER w) AS s_dn
         |  FROM c
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
         |               ROWS UNBOUNDED PRECEDING))
         |SELECT event_type, count(*) AS n,
         |  round(max(s_up) / 100.0, 2) AS max_cusum_up,
         |  round(max(s_dn) / 100.0, 2) AS max_cusum_dn,
         |  CAST(sum(CASE WHEN s_up > 50000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_up,
         |  CAST(sum(CASE WHEN s_dn > 50000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_dn,
         |  min(CASE WHEN s_up > 50000.0 THEN event_id END) AS first_alarm_id
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_outliers" ->
      """WITH f AS (
        |  SELECT event_type AS grp,
        |    round(avg(value) - 3.0 * stddev_pop(value), 6) AS z_lo,
        |    round(avg(value) + 3.0 * stddev_pop(value), 6) AS z_hi,
        |    round(quantile_cont(value, 0.25) - 1.5 *
        |      (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS iqr_lo,
        |    round(quantile_cont(value, 0.75) + 1.5 *
        |      (quantile_cont(value, 0.75) - quantile_cont(value, 0.25)), 6) AS iqr_hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type AS grp, count(*) AS n,
        |  CAST(sum(CASE WHEN value < z_lo OR value > z_hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_z_outliers,
        |  CAST(sum(CASE WHEN value < iqr_lo OR value > iqr_hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_iqr_outliers,
        |  min(iqr_lo) AS iqr_lo, min(iqr_hi) AS iqr_hi
        |FROM events e JOIN f ON e.event_type = f.grp
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_quantile_bins" ->
      """WITH b AS (
        |  SELECT round(quantile_cont(value, 0.1), 6) AS q1,
        |         round(quantile_cont(value, 0.2), 6) AS q2,
        |         round(quantile_cont(value, 0.3), 6) AS q3,
        |         round(quantile_cont(value, 0.4), 6) AS q4,
        |         round(quantile_cont(value, 0.5), 6) AS q5,
        |         round(quantile_cont(value, 0.6), 6) AS q6,
        |         round(quantile_cont(value, 0.7), 6) AS q7,
        |         round(quantile_cont(value, 0.8), 6) AS q8,
        |         round(quantile_cont(value, 0.9), 6) AS q9
        |  FROM events)
        |SELECT bin, count(*) AS n, round(min(value), 6) AS lo,
        |       round(max(value), 6) AS hi
        |FROM (
        |  SELECT value,
        |    (CASE WHEN value > q1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q7 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q8 THEN 1 ELSE 0 END) +
        |    (CASE WHEN value > q9 THEN 1 ELSE 0 END) AS bin
        |  FROM events CROSS JOIN b)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, event_type
        |  FROM events WHERE user_id < 10),
        |m AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM m),
        |g AS (
        |  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
        |    min(event_type) AS event_type, min(t) AS valid_from,
        |    count(*) AS n_rows
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, run_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
        |  n_rows
        |FROM g ORDER BY user_id, valid_from""".stripMargin,

    "g_kl_drift" ->
      """WITH c AS (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '§null§') AS c,
        |    sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) AS nb
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb,
        |             CAST(count(*) AS BIGINT) AS k FROM c),
        |d AS (SELECT (na + 1.0) / (ta + k) AS p, (nb + 1.0) / (tb + k) AS q,
        |             ta, tb, k
        |      FROM c CROSS JOIN t)
        |SELECT round(sum(p * ln(p / q)), 6) AS kl_pq,
        |  round(sum(q * ln(q / p)), 6) AS kl_qp,
        |  round(sum(p * ln(p / ((p + q) / 2.0)) / 2.0 +
        |            q * ln(q / ((p + q) / 2.0)) / 2.0), 6) AS js,
        |  ta AS n_a, tb AS n_b, k AS n_categories
        |FROM d GROUP BY ta, tb, k""".stripMargin,

    "g_sliding_distinct" ->
      """SELECT s AS win_start_s, CAST(count(DISTINCT user_id) AS BIGINT) AS u,
        |  count(*) AS n
        |FROM (SELECT user_id, unnest([
        |        (epoch_us(ts) // 10800000000) * 10800,
        |        ((epoch_us(ts) // 10800000000) - 1) * 10800]) AS s
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_corr_matrix" ->
      """WITH c AS (SELECT
        |    corr(l_quantity, l_extendedprice) AS qe,
        |    corr(l_quantity, l_discount) AS qd,
        |    corr(l_extendedprice, l_discount) AS ed
        |  FROM lineitem)
        |SELECT col_a, col_b, corr FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round(qe, 6) AS corr FROM c
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', round(qd, 6) FROM c
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', round(ed, 6) FROM c)
        |ORDER BY col_a, col_b""".stripMargin,

    "g_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        |d AS (SELECT user_id, value,
        |        lead(t) OVER (PARTITION BY user_id ORDER BY t) - t AS dt
        |      FROM e)
        |SELECT user_id, round(sum(value * dt) / sum(dt), 6) AS twa,
        |  count(*) AS n_intervals, CAST(sum(dt) AS BIGINT) AS span
        |FROM d WHERE dt IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "g_kfold" ->
      s"""SELECT fold, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
         |FROM (SELECT *, CAST(${graft.ops.IntHash.mixSql("17", Seq("event_id"))} % 5 AS INT) AS fold
         |      FROM events)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_date_arith" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue,
        |  round(avg(date_diff('day', CAST(o_orderdate AS DATE),
        |    DATE '1999-12-31')), 4) AS avg_age_days
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_time_rollup" ->
      """SELECT CAST(isodow(ts) - 1 AS INT) AS dow, CAST(hour(ts) AS INT) AS hr,
        |  count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY 1, 2""".stripMargin,

    "g_rolling_zscore" ->
      """SELECT user_id, ts_us,
        |  round(CASE WHEN sd > 0 THEN (value - mu) / sd END, 6) AS z,
        |  CASE WHEN sd > 0 THEN abs(value - mu) / sd > 3 END AS is_anomaly
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value,
        |    avg(value) OVER w AS mu, stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |WHERE user_id < 15 ORDER BY user_id, ts_us""".stripMargin,

    "q_rolling_median" ->
      """SELECT user_id, ts_us, med5 FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    round(quantile_cont(value, 0.5) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
        |  FROM events)
        |WHERE user_id < 20 ORDER BY user_id, ts_us""".stripMargin,

    "q_funnel" ->
      """WITH tv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |tc AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        |  FROM events e JOIN tv USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= tv.t_view
        |  GROUP BY 1),
        |tp AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        |  FROM events e JOIN tc USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= tc.t_click
        |  GROUP BY 1)
        |SELECT count(*) AS n_view, count(t_click) AS n_click,
        |  count(t_purchase) AS n_purchase,
        |  round(avg((t_purchase - t_view) / 1000000.0), 4) AS avg_delay_sec
        |FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)""".stripMargin,

    "q_cohort" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_suite" ->
      """SELECT * FROM (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    round(lag(value, 1) OVER wu, 6) AS prev_value,
        |    round(lead(value, 1) OVER wu, 6) AS next_value,
        |    row_number() OVER wu AS rn,
        |    CAST(ntile(4) OVER wu AS BIGINT) AS quartile,
        |    rank() OVER wt AS rnk,
        |    dense_rank() OVER wt AS drnk,
        |    round(percent_rank() OVER wt, 6) AS pct_rank,
        |    round(cume_dist() OVER wt, 6) AS cdist
        |  FROM events
        |  WINDOW wu AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |         wt AS (PARTITION BY event_type ORDER BY value))
        |WHERE user_id < 15 ORDER BY event_id""".stripMargin,

    "text_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |n AS (SELECT doc_id, tk, CAST(ceil(len(tk) / 24.0) AS INT) AS nc FROM toks),
        |s AS (SELECT CAST(i AS INT) AS i FROM generate_series(0, 4999) g(i))
        |SELECT d.doc_id, CAST(s.i AS BIGINT) AS chunk_idx,
        |       CAST(len(d.tk[s.i*24+1 : s.i*24+32]) AS BIGINT) AS chunk_tokens,
        |       array_to_string(d.tk[s.i*24+1 : s.i*24+32], ' ') AS chunk_text
        |FROM n d JOIN s ON s.i < d.nc
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "sketch_freq_rollup" ->
      """SELECT event_type, CAST(user_id % 50 AS VARCHAR) AS item,
        |  count(*) AS estimate, count(*) AS lower, count(*) AS upper,
        |  (SELECT count(*) FROM events e2 WHERE e2.event_type = e.event_type)
        |    AS n_rows
        |FROM events e
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
