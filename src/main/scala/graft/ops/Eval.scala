package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation estimators over sampled generations and multi-rater
  * labels — the scoring layer a post-training data pipeline runs next to
  * [[Sft]]'s prep ops (SURVEY §2.12 extension; the reference's metric
  * surface stops at classifier scores, func_test.py).
  */
object Eval {

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language Models
    * Trained on Code", eq. 1): per problem with n sampled generations of
    * which c are correct,
    *   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0}^{k−1} (n−c−i)/(n−i),
    * the expected probability that at least one of k draws (without
    * replacement) is correct. The product form is used verbatim — it is
    * numerically stable and hits an exact 0 factor whenever c > n−k
    * (pass@k = 1), no special-casing. Problems with n < k are dropped
    * (the estimator is undefined there — dropping loudly beats padding).
    * Rows with NULL `correct` are excluded entirely (they are neither a
    * correct nor an incorrect sample — counting them in n but not c
    * would silently score unknowns as failures, and an all-NULL problem
    * would face a null pass@k). Returns (problem, n, c, pass_at_k),
    * problem-ordered.
    *
    * Scale shape: ONE map-side-combined per-problem aggregation; the
    * k-term product is a row-local `aggregate` over a literal sequence
    * (codegen'd, no join, no explode). */
  def passAtK(df: DataFrame, problem: Column, correct: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val agg = df.where(correct.isNotNull).groupBy(problem.as("problem"))
      .agg(count(lit(1)).as("n"),
        sum(correct.cast("int")).as("c"))
      .where(col("n") >= k)
    agg.withColumn("pass_at_k",
        lit(1.0) - aggregate(sequence(lit(0), lit(k - 1)), lit(1.0),
          (acc, i) => acc * (col("n") - col("c") - i).cast("double")
            / (col("n") - i).cast("double")))
      .select(col("problem"), col("n"), col("c"), col("pass_at_k"))
      .orderBy("problem")
  }

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement for a FIXED
    * number of raters n per item over categorical labels — the
    * multi-annotator QA gauge next to the two-rater
    * [[Calibration.cohensKappa]] and the missing-tolerant
    * [[Stats.krippendorffAlpha]]. Input: one row per (item, rating).
    *   P_i = (Σ_c n_ic² − n)/(n(n−1)),  P̄ = mean_i P_i,
    *   P_e = Σ_c p_c²  with  p_c = Σ_i n_ic/(N·n),
    *   κ = (P̄ − P_e)/(1 − P_e).
    * REFUSES (loudly) input where items carry unequal rating counts —
    * Fleiss is undefined there; subsample to a fixed n first (or use
    * krippendorffAlpha, which handles missingness by design).
    * Returns ONE row (n_items, n_raters, p_bar, p_e, kappa).
    *
    * Scale shape: one (item, category) cell aggregation, one per-item
    * reduce, one category-marginal reduce — all map-side-combined; the
    * equal-n guard rides the per-item frame. */
  def fleissKappa(df: DataFrame, item: Column, category: Column): DataFrame = {
    val cells = df
      .where(item.isNotNull && category.isNotNull)
      .groupBy(item.as("__i"),
        category.cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val perItem = cells.groupBy("__i")
      .agg(sum(col("__n") * col("__n")).as("__ss"), sum("__n").as("__ni"))
    val nDistinct = perItem.agg(
      countDistinct("__ni").as("d"), max("__ni").as("n")).head()
    require(nDistinct.getLong(0) == 1,
      "fleissKappa: items carry unequal rating counts — Fleiss' kappa " +
        "needs a fixed raters-per-item n; subsample to a fixed n or use " +
        "Stats.krippendorffAlpha")
    val n = nDistinct.getLong(1)
    require(n >= 2, s"fleissKappa: need >= 2 ratings per item, got $n")
    val pBar = perItem.agg(
      count(lit(1)).as("n_items"),
      avg((col("__ss") - col("__ni")).cast("double")
        / (n * (n - 1.0))).as("p_bar"))
    val pe = cells.groupBy("__c").agg(sum("__n").as("__nc"))
      .agg(sum(pow(col("__nc").cast("double"), 2)).as("__s2"),
        sum("__nc").as("__tot"))
      .select((col("__s2") / (col("__tot") * col("__tot").cast("double")))
        .as("p_e"))
    pBar.crossJoin(broadcast(pe))
      .select(col("n_items"), lit(n).as("n_raters"), col("p_bar"),
        col("p_e"),
        ((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))).as("kappa"))
  }
}
