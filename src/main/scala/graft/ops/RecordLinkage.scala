package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter 1969, "A Theory for Record Linkage"; EM fitting per Winkler
  * 1988), the method behind Splink-style entity resolution at scale.
  * Complements the RULE-based capstone ([[Dedup.entityResolution]]-style
  * fuzzy edges → components) with LEARNED per-field agreement weights:
  * given candidate pairs carrying k boolean comparison columns
  * ("gammas": exact-name match, same-city, birth-year±1, …), EM
  * estimates for every field j
  *
  *  - `m_j = P(γ_j = 1 | pair is a match)`,
  *  - `u_j = P(γ_j = 1 | pair is a non-match)`,
  *
  * plus the match prevalence λ, with NO labeled pairs.
  *
  * Scale shape: the corpus-sized pair table collapses to its γ-PATTERN
  * table (≤ 2^k rows) in ONE map-side-combined aggregation — the only
  * pass over the pairs; the EM iteration runs driver-side over that
  * bounded table (the [[Stats.doremiWeights]] / one-pass-model
  * pattern). Every iterate is rounded to 9 dp, so the trajectory is
  * bit-stable across partitionings AND engines (the DuckDB oracle
  * replays the unrolled iterations). Scoring is a pure literal
  * projection — no join, no shuffle, applies unchanged to batch or
  * Structured Streaming frames (the [[graft.ops.TextOps.dsirScorer]]
  * production shape).
  */
object RecordLinkage {

  /** Fitted Fellegi–Sunter parameters: per-field (m, u) in the caller's
    * gamma-column order, plus the match prevalence λ. */
  final case class FsModel(fields: Seq[String], m: Seq[Double],
      u: Seq[Double], lambda: Double)

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** EM fit over candidate pairs with boolean comparison columns
    * `gammaCols`. `iters` full EM steps from the standard deterministic
    * start (m = 0.9, u = 0.1, λ = lambda0); every new parameter is
    * rounded to 9 dp before the next step. Null gammas are treated as
    * disagreement (coalesce to false) — the conservative Splink default
    * for missing fields. ≤ 2^k pattern rows are collected; k is capped
    * loudly. */
  def fellegiSunterFit(pairs: DataFrame, gammaCols: Seq[String],
      lambda0: Double = 0.1, iters: Int = 5, maxFields: Int = 16): FsModel = {
    require(gammaCols.nonEmpty && gammaCols.size <= maxFields,
      s"need 1..$maxFields comparison fields (2^k patterns are collected)")
    require(lambda0 > 0.0 && lambda0 < 1.0, "lambda0 in (0, 1)")
    require(iters >= 1, "iters >= 1")
    val k = gammaCols.size
    val patterns = pairs
      .groupBy(gammaCols.map(c =>
        coalesce(col(c), lit(false)).as(c)): _*)
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (gammaCols.indices.map(i => r.getBoolean(i)).toArray,
        r.getLong(k).toDouble))
      // deterministic pattern order: the M-step folds these in array
      // order, and FP addition isn't associative — sorting pins the
      // trajectory against partitioning/shuffle-order changes
      .sortBy(_._1.map(b => if (b) '1' else '0').mkString)
    var m = Array.fill(k)(0.9)
    var u = Array.fill(k)(0.1)
    var lam = lambda0
    for (_ <- 0 until iters) {
      // E-step: posterior match probability per pattern; M-step sums.
      // Products and the posterior use the same left-to-right shape the
      // SQL twin writes, so 9-dp rounding sees identical doubles.
      var wSum = 0.0; var nSum = 0.0
      val mNum = new Array[Double](k); val uNum = new Array[Double](k)
      var uDen = 0.0
      patterns.foreach { case (g, n) =>
        var pm = 1.0; var pu = 1.0
        var j = 0
        while (j < k) {
          pm *= (if (g(j)) m(j) else 1.0 - m(j))
          pu *= (if (g(j)) u(j) else 1.0 - u(j))
          j += 1
        }
        val w = lam * pm / (lam * pm + (1.0 - lam) * pu)
        wSum += w * n; nSum += n; uDen += (1.0 - w) * n
        j = 0
        while (j < k) {
          if (g(j)) { mNum(j) += w * n; uNum(j) += (1.0 - w) * n }
          j += 1
        }
      }
      m = Array.tabulate(k)(j => r9(mNum(j) / wSum))
      u = Array.tabulate(k)(j => r9(uNum(j) / uDen))
      lam = r9(wSum / nSum)
    }
    FsModel(gammaCols, m.toSeq, u.toSeq, lam)
  }

  /** Score pairs with a fitted model: adds
    *  - `match_weight` = log2 Π_j (m_j/u_j)^γ ((1−m_j)/(1−u_j))^(1−γ)
    *    (the Fellegi–Sunter log-likelihood-ratio weight), and
    *  - `match_prob` = the posterior λ·Πm / (λ·Πm + (1−λ)·Πu).
    *
    * Pure literal projection (model baked into the plan) — no join, no
    * state; ships to streams unchanged. */
  def fellegiSunterScore(pairs: DataFrame, model: FsModel): DataFrame = {
    val terms = model.fields.zipWithIndex.map { case (f, j) =>
      val g = coalesce(col(f), lit(false))
      (when(g, lit(model.m(j))).otherwise(lit(1.0 - model.m(j))),
        when(g, lit(model.u(j))).otherwise(lit(1.0 - model.u(j))))
    }
    val pm = terms.map(_._1).reduce(_ * _)
    val pu = terms.map(_._2).reduce(_ * _)
    pairs
      .withColumn("match_prob",
        lit(model.lambda) * pm /
          (lit(model.lambda) * pm + lit(1.0 - model.lambda) * pu))
      .withColumn("match_weight", log2(pm / pu))
  }

  /** Fit + score in one call (two passes over `pairs`: the pattern
    * aggregation, then the literal-projection scan). */
  def fellegiSunter(pairs: DataFrame, gammaCols: Seq[String],
      lambda0: Double = 0.1, iters: Int = 5): DataFrame =
    fellegiSunterScore(pairs, fellegiSunterFit(pairs, gammaCols, lambda0, iters))

  /** Blocking-scheme quality audit (Christen 2012, "Data Matching" ch. 4
    * — the standard RR / PC / PQ triple): given records carrying ONE
    * blocking key each and a ground-truth match-pair table, report
    *
    *  - `n_candidates`  Σ_b n_b·(n_b−1)/2 — candidate pairs the scheme
    *    would generate (disjoint blocks → exact COUNT ALGEBRA, the pairs
    *    are never materialized),
    *  - `reduction_ratio`  1 − candidates / allPairs — how much of the
    *    quadratic comparison space the blocking removes,
    *  - `pairs_completeness`  co-blocked truth pairs / truth pairs —
    *    the recall the linkage can at best achieve under this blocking,
    *  - `pairs_quality`  co-blocked truth pairs / candidates — the
    *    precision proxy (how much verify work is wasted).
    *
    * THE dial to turn before [[fellegiSunterFit]] ever runs: at 100 TB
    * the blocking decides the join size, and a scheme is chosen by
    * maximizing completeness at an acceptable reduction ratio. Cost: one
    * map-side-combined groupBy on the key + two id-keyed joins of the
    * truth table against the skinny (id, key) projection — linear in
    * records + truth pairs, no pair materialization anywhere. */
  def blockingQuality(records: DataFrame, id: String, blockKey: Column,
      truthPairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val keyed = records.select(col(id).as("__id"),
      blockKey.cast("string").as("__bk"))
      // three consumers (block sizes + both truth-tagging joins): key
      // the records once (r12)
      .localCheckpoint(false)
    val blocks = keyed.groupBy("__bk").agg(count(lit(1)).as("__n"))
    val base = blocks.agg(
      sum(col("__n")).cast("long").as("n_records"),
      count(lit(1)).as("n_blocks"),
      max(col("__n")).cast("long").as("max_block"),
      // n(n−1) is even, so the half is exact INTEGER arithmetic (a
      // double division here would silently lose exactness past 2^53)
      shiftright(sum(col("__n") * (col("__n") - 1)).cast("long"), 1)
        .as("n_candidates"))
    val truthKeyed = truthPairs
      .join(keyed.select(col("__id"), col("__bk").as("__bk_a")),
        col(idA) === col("__id")).drop("__id")
      .join(keyed.select(col("__id"), col("__bk").as("__bk_b")),
        col(idB) === col("__id")).drop("__id")
    val truthAgg = truthKeyed.agg(
      count(lit(1)).as("n_truth"),
      sum(when(col("__bk_a") === col("__bk_b"), 1L).otherwise(0L))
        .cast("long").as("n_truth_covered"))
    base.crossJoin(truthAgg).select(
      col("n_records"), col("n_blocks"), col("max_block"),
      col("n_candidates"),
      round(lit(1.0) - col("n_candidates").cast("double") /
        (col("n_records").cast("double") * (col("n_records") - 1).cast("double") / 2),
        6).as("reduction_ratio"),
      col("n_truth"), col("n_truth_covered"),
      round(col("n_truth_covered").cast("double")
        / col("n_truth").cast("double"), 6).as("pairs_completeness"),
      round(col("n_truth_covered").cast("double")
        / col("n_candidates").cast("double"), 6).as("pairs_quality"))
  }
}
