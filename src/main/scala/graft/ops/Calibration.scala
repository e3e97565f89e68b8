package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-calibration and label-quality diagnostics for the training-data
  * pipeline (extensions beyond the reference — SURVEY §2.12): equal-width
  * reliability tables, ECE/MCE/Brier (Naeini et al. 2015; Guo et al. 2017),
  * Cohen's kappa inter-rater agreement, and confident-learning label-noise
  * detection (Northcutt et al. 2021).
  *
  * Scale shape: every operator here collapses the corpus in ONE map-side-
  * combined aggregation (to `bins` or `k`/`k²` keys); everything downstream
  * runs on that bounded frame. `labelNoise` broadcasts its k-row threshold
  * model back as a literal array — no join, so it applies unchanged to a
  * streaming projection.
  */
object Calibration {

  /** Equal-width reliability table over score ∈ [0, 1]: per bin, the row
    * count, mean confidence (score), empirical accuracy (positive rate) and
    * the summed squared error (for Brier). Scores ≥ 1 clamp into the last
    * bin (sklearn `calibration_curve` convention). One `bins`-key groupBy
    * with map-side combine — the only pass over the data. */
  def reliabilityTable(df: DataFrame, yTrue: Column, score: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val bin = least(floor(score * bins), lit(bins - 1)).cast("int")
    val y = yTrue.cast("double")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        avg(score).as("confidence"),
        avg(y).as("accuracy"),
        sum((score - y) * (score - y)).as("sq_err"))
  }

  /** Expected / maximum calibration error + Brier score, from the
    * reliability table (so: one corpus pass total).
    * ECE = Σ_b n_b/N · |acc_b − conf_b|; MCE = max_b |acc_b − conf_b|;
    * Brier = Σ_b sq_err_b / N. Returns one row (ece, mce, brier). */
  def calibrationErrors(df: DataFrame, yTrue: Column, score: Column,
      bins: Int = 10): DataFrame = {
    val gap = abs(col("accuracy") - col("confidence"))
    reliabilityTable(df, yTrue, score, bins).agg(
      (sum(col("n") * gap) / sum(col("n"))).as("ece"),
      max(gap).as("mce"),
      (sum(col("sq_err")) / sum(col("n"))).as("brier"))
  }

  /** Fitted isotonic (monotone non-decreasing) calibration map as a
    * per-bin step function: `calibrated(b)` is the corrected probability
    * for scores binned into b (the [[reliabilityTable]] binning). */
  case class IsotonicModel(bins: Int, calibrated: Array[Double])

  private def round9c(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** Isotonic score calibration via Pool-Adjacent-Violators (Zadrozny &
    * Elkan 2002 for calibration; the PAVA of Robertson, Wright & Dykstra
    * 1988) over the BINNED reliability curve: the corpus collapses to
    * ≤ `bins` (n, accuracy) rows in ONE map-side-combined pass; PAVA
    * then runs driver-side over that bounded table (n-weighted), merging
    * adjacent bins until empirical accuracy is monotone in score. Bins
    * never observed inherit the nearest lower observed bin's value
    * (leading gaps take the first observed value) — a total step
    * function. Values rounded to 9 dp, so the model is bit-stable
    * across partitionings and the [[isotonicApply]] projection replays
    * exactly in SQL (the dsirScorer literal-replay pattern). Binned PAVA
    * trades sklearn's per-distinct-score resolution for the one-pass
    * corpus collapse — the right trade when N is 10¹² and `bins`
    * resolution is all a mixing decision needs. */
  def isotonicFit(df: DataFrame, yTrue: Column, score: Column,
      bins: Int = 10): IsotonicModel = {
    val rows = reliabilityTable(df, yTrue, score, bins)
      .select(col("bin"), col("n"), col("accuracy"))
      .collect().map(r => (r.getInt(0), r.getLong(1).toDouble, r.getDouble(2)))
      .sortBy(_._1)
    require(rows.nonEmpty, "empty input — nothing to calibrate")
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, List[Int])]
    rows.foreach { case (b, w, v) =>
      var cur = (w, v, List(b))
      while (pools.nonEmpty && pools.last._2 > cur._2) {
        val p = pools.remove(pools.length - 1)
        val ws = p._1 + cur._1
        cur = (ws, (p._1 * p._2 + cur._1 * cur._2) / ws, p._3 ++ cur._3)
      }
      pools += cur
    }
    val byBin = pools.iterator
      .flatMap { case (_, v, bs) => bs.map(_ -> round9c(v)) }.toMap
    val firstV = byBin(rows.head._1)
    val arr = new Array[Double](bins)
    var prev = firstV
    for (b <- 0 until bins) { byBin.get(b).foreach(v => prev = v); arr(b) = prev }
    IsotonicModel(bins, arr)
  }

  /** Apply a fitted isotonic map: pure literal-array projection
    * (codegen'd, no join/state — streams as-is). */
  def isotonicApply(score: Column, model: IsotonicModel): Column =
    element_at(typedLit(model.calibrated.toSeq),
      least(floor(score * model.bins), lit(model.bins - 1)).cast("int") + 1)

  /** Fitted Platt sigmoid: P(y=1 | s) = 1/(1 + exp(a·s + b)). */
  case class PlattModel(a: Double, b: Double)

  /** Platt scaling (Platt 1999, with Lin/Weng/Keerthi 2007's regularized
    * targets) — the PARAMETRIC calibration next to [[isotonicFit]]'s
    * step function: fit A, B of σ(A·s + B) by `iterations` full Newton
    * steps on the regularized NLL, targets t₊ = (N₊+1)/(N₊+2),
    * t₋ = 1/(N₋+2). Start A = 0, B = ln((N₋+1)/(N₊+1)) (Lin's prior
    * start). Parameters are snapped to 9 dp after EVERY step (the
    * repo's EM-iterate convention), so the trajectory — and the fitted
    * model — replays bit-identically across partitionings and engines
    * (the SQL twin unrolls the same steps from the same start).
    *
    * Scale shape: each Newton step is ONE fused map-side-combined
    * aggregation (five scalar sums: gradient + 2×2 Hessian terms); the
    * 2×2 solve happens on the driver. `iterations` small and fixed
    * (default 8 — past that the 9-dp snap has long converged on
    * anything sane). With `cache = true` (default) the narrow flat
    * (s, y) projection is PERSISTED for the loop's duration
    * (MEMORY_AND_DISK, unpersisted on exit) — without it every step
    * re-reads the source scan, `iterations + 1` times total; the cache
    * changes nothing semantically (same rows, same exact trajectory).
    * Pass `cache = false` when the upstream is trivially recomputable.
    * At 100 TB, prefer fitting on an explicit sample — a 2-parameter
    * sigmoid saturates statistically long before 10⁹ rows. */
  def plattFit(df: DataFrame, yTrue: Column, score: Column,
      iterations: Int = 8, cache: Boolean = true): PlattModel = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val base = df.select(score.cast("double").as("s"),
        yTrue.cast("double").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
    if (cache)
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val counts = base.agg(sum("y").as("np"),
      sum(lit(1.0) - col("y")).as("nn")).head()
    val (np, nn) = (counts.getDouble(0), counts.getDouble(1))
    require(np > 0 && nn > 0,
      s"plattFit: need both classes present, got n_pos=$np n_neg=$nn")
    val (tp, tn) = ((np + 1.0) / (np + 2.0), 1.0 / (nn + 2.0))
    // HALF_UP (away-from-zero) snap — the same convention as SQL
    // round(x, 9), because the DuckDB twin RECOMPUTES the trajectory
    // (unlike the isotonic literal-replay, where rint was fine)
    def snap9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var a = 0.0
    var b = snap9(math.log((nn + 1.0) / (np + 1.0)))
    for (_ <- 1 to iterations) {
      // p = σ(−(a·s+b)) is P(y=1); target residual r = p − t_y
      val p = lit(1.0) / (lit(1.0) + exp(col("s") * a + b))
      val t = when(col("y") > 0.5, lit(tp)).otherwise(lit(tn))
      val w = p * (lit(1.0) - p)
      // one fused pass: gradient components (ga, gb) + Hessian entries
      val sums = base.agg(
        sum((t - p) * col("s")).as("ga"), sum(t - p).as("gb"),
        sum(w * col("s") * col("s")).as("haa"),
        sum(w * col("s")).as("hab"), sum(w).as("hbb")).head()
      val (ga, gb) = (sums.getDouble(0), sums.getDouble(1))
      // small ridge on the Hessian diagonal — the standard Platt guard
      // against a flat sigmoid (all-one-score degenerate inputs)
      val (haa, hab, hbb) =
        (sums.getDouble(2) + 1e-12, sums.getDouble(3), sums.getDouble(4) + 1e-12)
      val det = haa * hbb - hab * hab
      // Newton for minimizing NLL in (a, b) of P = σ(−(a·s+b)):
      // ∇NLL = Σ (t − P)·[s, 1] (d/dz of −[t ln P + (1−t) ln(1−P)] with
      // P = σ(−z) is t − P), H = Σ P(1−P)·[s², s; s, 1] ⪰ 0 ⇒ full
      // step θ ← θ − H⁻¹∇ (the LIBSVM sigmoid_train update)
      val da = (hbb * ga - hab * gb) / det
      val dbb = (haa * gb - hab * ga) / det
      a = snap9(a - da)
      b = snap9(b - dbb)
    }
    PlattModel(a, b)
    } finally { if (cache) base.unpersist(blocking = false) }
  }

  /** Apply a fitted [[PlattModel]]: pure row-local sigmoid (codegen'd, no
    * join/state — streams as-is, like [[isotonicApply]]). */
  def plattApply(score: Column, model: PlattModel): Column =
    lit(1.0) / (lit(1.0) + exp(score * model.a + model.b))

  /** Fitted temperature: calibrated = softmax(logits / t) = softmax(β·z)
    * with β = 1/t. */
  case class TemperatureModel(beta: Double) { def t: Double = 1.0 / beta }

  /** Temperature scaling (Guo et al. 2017, "On Calibration of Modern
    * Neural Networks") — the ONE-parameter multiclass calibration:
    * minimize NLL(β) = −Σ [β·z_y − lse(β·z)] over β = 1/T by
    * `iterations` Newton steps. Per row (all array-local, codegen'd):
    * p_j = softmax(β·z)_j, E = Σp_j z_j, V = Σp_j z_j² − E²;
    * ∇ = −Σ(z_y − E), H = Σ V ≥ 0 (convex — Newton from β = 1 is safe).
    * β snaps to 9 dp per step (the [[plattFit]] convention), so the
    * DuckDB twin recomputes the identical trajectory from the long
    * (row, class, logit) form. Accuracy is untouched by construction
    * (argmax is scale-invariant) — only confidence moves.
    *
    * Scale shape: ONE fused 2-sum aggregation per step over row-local
    * expressions — no explode, no join. With `cache = true` (default)
    * the loop frame is PERSISTED for the loop's duration as a FLAT
    * (y, z_0..z_{k−1}) projection — flat double columns compress into
    * the columnar cache and re-scan in seconds, where caching the raw
    * array column measured SLOWER than recomputing (108.2 s vs 61.5 s
    * at 100M — array cells defeat the columnar cache; SCALE.md r11).
    * No semantic change either way: same rows, same values, same 9-dp
    * trajectory. Pass `cache = false` when the upstream is trivially
    * recomputable (synthetic probes). At 100 TB, fit on an explicit
    * sample instead — one parameter needs nowhere near the corpus. */
  def temperatureFit(df: DataFrame, yTrue: Column, logits: Column,
      iterations: Int = 6, cache: Boolean = true,
      kHint: Option[Int] = None): TemperatureModel = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val raw = rawLogits(df, yTrue, logits)
    val k = logitWidth(raw, kHint)
    // the loop frame: y plus the k logits as FLAT double columns (the
    // identical values element_at would read — trajectory unchanged);
    // flat doubles are what the columnar cache stores efficiently
    val base = flatten(raw, k)
    if (cache)
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try TemperatureModel(newtonBeta(base, k, iterations))
    finally { if (cache) base.unpersist(blocking = false) }
  }

  /** [[temperatureFit]] + the per-class mean calibrated mass, computed
    * from the SAME persisted flat frame the Newton loop iterates on —
    * the fused form for consumers that want the fit AND the calibrated
    * summary (the g_temperature_scaling face). The separate
    * fit-then-apply sequence costs TWO extra corpus passes (the
    * uniform-width probe plus the apply re-reading the raw upstream);
    * here `k` is caller-asserted (the logits are schema-constructed at
    * that width) and the means aggregation reads the cache, so the
    * upstream executes exactly ONCE. Per-row p_j replays
    * [[temperatureApply]]'s IEEE sequence on the flat columns
    * (β·z, running max, left-to-right exp fold, exp(βz − lse)), so each
    * p_j is bit-identical to the posexplode form. Means are over the
    * rows the fit saw (y and logits non-null) — identical to a means-
    * over-everything face whenever y is never null, which is the only
    * shape the oracle data has.
    *
    * CALLER CONTRACT on `k` (r12 verdict item 3): `k` is asserted, not
    * probed — every logit array MUST have exactly `k` elements. A row
    * with a different width contributes nothing to the sums (its
    * element_at projections go null) instead of failing loudly the way
    * the probing [[temperatureFit]] does; pass schema-constructed
    * fixed-width arrays only, or use [[temperatureFit]] when the width
    * is data-dependent.
    * Returns (model, k-row DataFrame (cls, mean_p) in class order). */
  def temperatureFitWithMeans(df: DataFrame, yTrue: Column, logits: Column,
      iterations: Int = 6, k: Int): (TemperatureModel, DataFrame) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(k >= 2, s"temperatureFitWithMeans: need >= 2 classes, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = flatten(rawLogits(df, yTrue, logits), k)
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val beta = newtonBeta(base, k, iterations)
      def zb(j: Int): Column = col(s"__z$j") * beta
      val m = greatest((0 until k).map(zb): _*)
      val lse = m + log((0 until k).map(j => exp(zb(j) - m))
        .foldLeft(lit(0.0))(_ + _))
      val row = base.agg(
        avg(exp(zb(0) - lse)).as("__p0"),
        (1 until k).map(j => avg(exp(zb(j) - lse)).as(s"__p$j")): _*).head()
      val means = (0 until k).map(j => (j, row.getDouble(j)))
        .toDF("cls", "mean_p")
      (TemperatureModel(beta), means)
    } finally base.unpersist(blocking = false)
  }

  private def rawLogits(df: DataFrame, yTrue: Column, logits: Column): DataFrame =
    df.select(yTrue.cast("int").as("y"),
        transform(logits, z => z.cast("double")).as("z"))
      .where(col("y").isNotNull && col("z").isNotNull)

  /** Fixed logit width: taken from `kHint` when the caller constructs
    * the logit arrays at a schema-known width (skipping the probe saves
    * a full corpus pass — rows with a DIFFERENT width then contribute
    * nothing to the sums instead of failing loudly, which is vacuous
    * under the fixed-width construction); probed in one min/max pass
    * otherwise. The per-row softmax sums UNROLL into plain codegen'd
    * expressions. Higher-order array functions (aggregate/transform)
    * are CodegenFallback — interpreted per element with boxed
    * accumulators, measured MINUTES per pass at 100M × k = 8 where the
    * unrolled form takes seconds. */
  private def logitWidth(raw: DataFrame, kHint: Option[Int]): Int = {
    val k = kHint.getOrElse {
      val kRow = raw.select(min(size(col("z"))).as("a"),
        max(size(col("z"))).as("b")).head()
      require(!kRow.isNullAt(0) && kRow.getInt(0) == kRow.getInt(1),
        s"temperatureFit: logit arrays must have uniform length, got " +
          s"[${kRow.get(0)}, ${kRow.get(1)}]")
      kRow.getInt(0)
    }
    require(k >= 2, s"temperatureFit: need >= 2 classes, got $k")
    k
  }

  private def flatten(raw: DataFrame, k: Int): DataFrame =
    raw.select(col("y") +:
      (0 until k).map(j => element_at(col("z"), j + 1).as(s"__z$j")): _*)

  /** The damped-Newton β loop over the flat (y, __z0..__z{k−1}) frame —
    * ONE fused 2-sum aggregation per step, β snapped to 9 dp per step
    * (the [[plattFit]] convention), so the DuckDB twin recomputes the
    * identical trajectory from the long (row, class, logit) form. */
  private def newtonBeta(base: DataFrame, k: Int, iterations: Int): Double = {
    def snap9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def zj(j: Int): Column = col(s"__z$j")
    var beta = 1.0
    for (_ <- 1 to iterations) {
      // per row: m = max_j β·z_j; (S, Sz, Sz2) = Σ_j (1, z_j, z_j²)·
      // e^{β·z_j − m}; E = Sz/S, E2 = Sz2/S; ∇-term = E − z_y,
      // H-term = E2 − E² — everything left-to-right in class order so
      // the SQL twin's fold order can mirror exactly
      val m = greatest((0 until k).map(j => zj(j) * beta): _*)
      def esum(f: Int => Column): Column =
        (0 until k).map(j => f(j) * exp(zj(j) * beta - m)).reduce(_ + _)
      val s0 = esum(_ => lit(1.0))
      val e1 = esum(j => zj(j)) / s0
      val e2 = esum(j => zj(j) * zj(j)) / s0
      // z_y from the flat columns: exactly one branch matches per row
      // (y is validated in [0, k) by the match itself — an out-of-range
      // y yields null and is excluded from the sums, same as the
      // out-of-bounds element_at it replaces)
      val zy = (0 until k).map(j => when(col("y") === j, zj(j)))
        .reduce((a, b) => coalesce(a, b))
      val r = base.agg(
        sum(e1 - zy).as("g"),
        sum(e2 - e1 * e1).as("h")).head()
      val (g, h) = (r.getDouble(0), r.getDouble(1) + 1e-12)
      // damped Newton: saturated softmax flattens H and the raw step
      // overshoots through β = 0 (measured: constant-logit fixtures
      // diverge to β ~ 1e14). The unit step clamp + the [1e-3, 1e3]
      // β box are deterministic, so the SQL twin replays them exactly.
      val delta = math.max(-1.0, math.min(1.0, g / h))
      beta = snap9(math.max(1e-3, math.min(1e3, beta - delta)))
    }
    beta
  }

  /** Apply a fitted [[TemperatureModel]]: row-local softmax of β·z
    * (stable lse form) — streams as-is. The lse reference inside the
    * transform re-inlines (CollapseProject), costing O(k²) exp per row —
    * fine for logit widths (k ≤ ~64); for very wide arrays project the
    * lse into its own column first (the [[temperatureFit]] fold trick). */
  def temperatureApply(logits: Column, model: TemperatureModel): Column = {
    val zb = transform(logits, z => z.cast("double") * model.beta)
    val m = array_max(zb)
    val lse = m + log(aggregate(zb, lit(0.0), (a, x) => a + exp(x - m)))
    transform(zb, x => exp(x - lse))
  }

  /** Cronbach's alpha (Cronbach 1951): internal-consistency reliability
    * of a k-item score battery — α = k/(k−1)·(1 − Σ var_i / var_total),
    * variances ddof-1 over pairwise-complete rows (rows with any null
    * item are dropped: alpha is defined on the complete battery). The
    * labeling-QA gauge for multi-signal quality scores ("do my k quality
    * heuristics measure one thing?"). Returns ONE row
    * (n, k, sum_item_var, total_var, alpha). ONE fused aggregation
    * (k + 1 variances in a single pass). */
  def cronbachAlpha(df: DataFrame, items: Seq[Column]): DataFrame = {
    require(items.size >= 2, s"need >= 2 items, got ${items.size}")
    val k = items.size
    val cast = items.map(_.cast("double"))
    val complete = df.where(cast.map(_.isNotNull).reduce(_ && _))
    val total = cast.reduce(_ + _)
    val aggs = count(lit(1)).as("n") +:
      var_samp(total).as("__vt") +:
      cast.zipWithIndex.map { case (c, i) => var_samp(c).as(s"__v$i") }
    complete.agg(aggs.head, aggs.tail: _*)
      .withColumn("sum_item_var",
        (0 until k).map(i => col(s"__v$i")).reduce(_ + _))
      .select(col("n"), lit(k).as("k"), col("sum_item_var"),
        col("__vt").as("total_var"),
        when(col("__vt") > 0, lit(k / (k - 1.0))
          * (lit(1.0) - col("sum_item_var") / col("__vt"))).as("alpha"))
  }

  /** One-way intraclass correlation ICC(1) (Shrout & Fleiss 1979, case
    * 1): from the one-way ANOVA of `value` grouped by `item`,
    * ICC = (MSB − MSW)/(MSB + (k̄ − 1)·MSW) with k̄ the mean group size
    * (exact for balanced designs; the standard n₀ correction
    * k₀ = (N − Σn_g²/N)/(k − 1) is used, which reduces to k̄ when
    * balanced). "How much of a score's variance is the ITEM vs the
    * rater?" — the continuous-score sibling of [[fleissKappa]].
    * Returns ONE row (k_groups, n, msb, msw, k0, icc1). Shape:
    * [[graft.ops.Stats.anovaF]]'s single fused pass + one extra Σn_g². */
  def icc1(df: DataFrame, item: Column, value: Column): DataFrame = {
    val v = value.cast("double")
    val byG = df.where(v.isNotNull && item.isNotNull)
      .groupBy(item.as("__g"))
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"), sum(v * v).as("__ss"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byG
      .withColumn("__tot", sum("__n").over(wAll))
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__grand", sum("__s").over(wAll) / col("__tot"))
      .agg(
        max("__k").as("k_groups"), max("__tot").as("n"),
        sum(col("__n") * pow(col("__s") / col("__n") - col("__grand"), 2))
          .as("__ssb"),
        sum(col("__ss") - col("__s") * col("__s") / col("__n")).as("__ssw"),
        sum(col("__n").cast("double") * col("__n")).as("__sn2"))
      .withColumn("msb", col("__ssb") / (col("k_groups") - 1))
      .withColumn("msw",
        when(col("n") > col("k_groups"),
          col("__ssw") / (col("n") - col("k_groups"))))
      .withColumn("k0", (col("n") - col("__sn2") / col("n"))
        / (col("k_groups") - 1))
      .select(col("k_groups"), col("n"), col("msb"), col("msw"), col("k0"),
        when(col("msw").isNotNull
            && col("msb") + (col("k0") - 1) * col("msw") > 0,
          (col("msb") - col("msw"))
            / (col("msb") + (col("k0") - 1) * col("msw"))).as("icc1"))
  }

  /** Cohen's kappa: chance-corrected agreement between two integer label
    * columns. One k²-key groupBy over the data; marginals and the final
    * scalar are derived from that bounded cell table in one linear pass
    * (no joins, no re-aggregation of the cells).
    * Returns one row (po, pe, kappa). */
  def cohensKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("t"), b.as("p"))
      .agg(count(lit(1)).as("cnt"))
    // Marginals + diagonal in ONE pass over the k² cells (r12; was four
    // separate re-aggregations of the cell table, each re-executing the
    // corpus groupBy): every cell feeds its row marginal (keyed by its
    // TRUE class, where its n and diagonal contribution also ride) and
    // its column marginal (keyed by its PREDICTED class) — a 2-way
    // explode of k² rows, one class-keyed sum, one scalar agg. A null
    // class keeps its mass in n but contributes nothing to diag
    // (null = null is not a match) or to Σ rn·cn (the old equi-join
    // never matched null to null) — bit-identical po/pe/kappa.
    val perClass = cells.select(explode(array(
        struct(col("t").as("cls"), col("cnt").as("rn"), lit(0L).as("cn"),
          when(col("t") === col("p"), col("cnt")).otherwise(0L).as("diag")),
        struct(col("p").as("cls"), lit(0L).as("rn"), col("cnt").as("cn"),
          lit(0L).as("diag")))).as("__c"))
      .select(col("__c.cls").as("cls"), col("__c.rn"), col("__c.cn"),
        col("__c.diag"))
      .groupBy("cls")
      .agg(sum("rn").as("rn"), sum("cn").as("cn"), sum("diag").as("diag"))
    perClass.agg(
        sum("diag").as("diag"), sum("rn").as("n"),
        sum(when(col("cls").isNotNull, col("rn") * col("cn"))
          .otherwise(0L)).as("rc"))
      .select(
        (col("diag") / col("n")).as("po"),
        (col("rc") / (col("n") * col("n"))).as("pe"),
        ((col("diag") / col("n") - col("rc") / (col("n") * col("n"))) /
          (lit(1.0) - col("rc") / (col("n") * col("n")))).as("kappa"))
  }

  /** Confident-learning label-noise detection (Northcutt et al. 2021,
    * "Confident Learning"): flag rows whose out-of-class predicted
    * probability clears that class's mean self-confidence threshold.
    *
    * Pass 1 (narrow, k-row result): t_j = mean of p_j over rows labeled j,
    * rounded to 9 dp for engine-portable comparisons, collected and
    * re-broadcast as a LITERAL array — no join, so the scoring pass is a
    * stateless projection (streaming-safe, like `dsirScorer`).
    * Pass 2: per row, candidate classes are {j ≠ y : p_j ≥ t_j}; the
    * suggestion is the argmax-probability candidate (ties broken by larger
    * j via struct ordering — the fixture's score matrix is tie-free).
    * Rows with no candidate are dropped (they are "clean").
    *
    * A class never seen as a given label gets threshold +∞ (never
    * suggested) — matching the SQL twin's inner join on fitted thresholds.
    *
    * Returns (id, y_given, y_suggested, margin) where margin =
    * p_suggested − p_given, rounded to 6 dp. */
  def labelNoise(df: DataFrame, id: Column, y: Column, proba: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val base = df.select(id.as("id"), y.cast("int").as("y"), proba.as("p"))
    val fitted = base.groupBy(col("y"))
      .agg(avg(element_at(col("p"), col("y") + 1)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val thr = array((0 until k).map(j =>
      lit(fitted.get(j).map(r9).getOrElse(Double.PositiveInfinity))): _*)
    val cand = filter(
      transform(col("p"), (pj, j) =>
        struct(pj.as("pv"), j.as("j"),
          (pj >= element_at(thr, j + 1)).as("ok"))),
      x => x("ok") && x("j") =!= col("y"))
    val best = array_max(transform(cand, x =>
      struct(x("pv").as("pv"), x("j").as("j"))))
    base.withColumn("best", best)
      .where(col("best").isNotNull)
      .select(col("id"), col("y").as("y_given"),
        col("best.j").as("y_suggested"),
        round(col("best.pv") - element_at(col("p"), col("y") + 1), 6)
          .as("margin"))
  }

  /** Murphy decomposition of the Brier score (Murphy 1973):
    * Brier = REL − RES + UNC over forecast-probability bins —
    * reliability (calibration gap), resolution (how much the forecast
    * separates outcomes), uncertainty (outcome base-rate variance). The
    * additive identity holds EXACTLY for within-bin-constant forecasts
    * and approximately otherwise, so the direct Σ(p−y)²/N rides along
    * as `brier` for comparison. ONE bin aggregation (bins bounded), the
    * combine runs over the bin table. */
  def brierDecomposition(df: DataFrame, yTrue: Column, prob: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins $bins outside [2, 1e4]")
    val p = prob.cast("double")
    val y = yTrue.cast("double")
    val bin = least(floor(p * bins).cast("int"), lit(bins - 1))
    val byB = df.where(p.isNotNull && y.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_b"), sum(p).as("sp"), sum(y).as("sy"),
        sum((p - y) * (p - y)).as("sq"))
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    byB
      .withColumn("__N", sum("n_b").over(wAll))
      .withColumn("__obar", sum("sy").over(wAll) / col("__N"))
      .withColumn("__fb", col("sp") / col("n_b"))
      .withColumn("__ob", col("sy") / col("n_b"))
      .agg(
        max(col("__N")).as("n"),
        count(lit(1)).as("n_bins"),
        sum(col("n_b") * (col("__fb") - col("__ob"))
          * (col("__fb") - col("__ob"))).as("__rel_n"),
        sum(col("n_b") * (col("__ob") - col("__obar"))
          * (col("__ob") - col("__obar"))).as("__res_n"),
        max(col("__obar")).as("__obar"),
        sum(col("sq")).as("__sq"))
      .withColumn("reliability", col("__rel_n") / col("n"))
      .withColumn("resolution", col("__res_n") / col("n"))
      .withColumn("uncertainty", col("__obar") * (lit(1.0) - col("__obar")))
      .withColumn("brier", col("__sq") / col("n"))
      .select(col("n"), col("n_bins"), col("reliability"),
        col("resolution"), col("uncertainty"), col("brier"))
  }
}
