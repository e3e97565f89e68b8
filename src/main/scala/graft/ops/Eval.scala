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

  /** McNemar's test (McNemar 1947) — the PAIRED model comparison: on
    * items both models answered, only the DISCORDANT cells carry
    * information (b = only A correct, c = only B correct); the marginal
    * accuracies' difference is (b − c)/n and the continuity-corrected
    * statistic χ² = (|b − c| − 1)²/(b + c) (df = 1) tests it against
    * zero. The standard "is model A actually better on the SAME eval
    * set?" gate (Dietterich 1998 recommends exactly this for paired
    * classifier comparison) — an unpaired z-test on two accuracy
    * numbers wastes the pairing and overstates p. Rows where truth or
    * either prediction is NULL are dropped (no silent failure credit —
    * the [[passAtK]] convention). Returns ONE row
    * (n, n_both_correct, n_a_only, n_b_only, n_both_wrong, acc_a,
    * acc_b, chi2_cc — null when b + c = 0: identical error patterns
    * carry no evidence either way).
    *
    * Scale shape: ONE fused map-side-combined aggregation (four
    * conditional counters); everything else is driver-free column
    * arithmetic on the one-row frame. */
  def mcnemar(df: DataFrame, yTrue: Column, predA: Column,
      predB: Column): DataFrame = {
    val base = df.where(yTrue.isNotNull && predA.isNotNull
        && predB.isNotNull)
      .select((predA === yTrue).as("__a"), (predB === yTrue).as("__b"))
    // coalesce: sum over ZERO rows is null — an empty eval set should
    // face zero counts (and null accuracies), not a row of nulls
    val cells = base.agg(
      coalesce(sum(when(col("__a") && col("__b"), 1L).otherwise(0L)),
        lit(0L)).as("n_both_correct"),
      coalesce(sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)),
        lit(0L)).as("n_a_only"),
      coalesce(sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)),
        lit(0L)).as("n_b_only"),
      coalesce(sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)),
        lit(0L)).as("n_both_wrong"))
    val n = col("n_both_correct") + col("n_a_only") + col("n_b_only") +
      col("n_both_wrong")
    val b = col("n_a_only").cast("double")
    val c = col("n_b_only").cast("double")
    cells
      .withColumn("n", n)
      .withColumn("acc_a", when(n > 0,
        (col("n_both_correct") + col("n_a_only")).cast("double") / n))
      .withColumn("acc_b", when(n > 0,
        (col("n_both_correct") + col("n_b_only")).cast("double") / n))
      .withColumn("chi2_cc", when(b + c > 0,
        pow(abs(b - c) - 1.0, 2) / (b + c)))
      .select(col("n"), col("n_both_correct"), col("n_a_only"),
        col("n_b_only"), col("n_both_wrong"), col("acc_a"), col("acc_b"),
        col("chi2_cc"))
  }

  /** Bradley–Terry preference ratings (Bradley & Terry 1952) by
    * Hunter's MM algorithm (Hunter 2004, eq. 2.1) — the standard fit
    * for PAIRWISE PREFERENCE data (RLHF comparison logs, eval arenas):
    * each row is one (winner, loser) judgment; p_i are positive skills
    * with P(i beats j) = p_i/(p_i + p_j), iterated
    *   p_i ← w_i / Σ_{j≠i} n_ij/(p_i + p_j)
    * then normalized to geometric mean 1 and SNAPPED to 9 dp (the
    * [[Calibration.plattFit]] EM-iterate convention) so the trajectory
    * replays bit-identically across partitionings and engines — the
    * DuckDB twin recomputes the same iterations as chained CTEs.
    * REFUSES (loudly) an item with zero wins or zero losses — the MLE
    * diverges there (Ford 1957's connectivity condition); filter such
    * items or add pseudo-judgments first. Self-judgments
    * (winner = loser) and NULL ids are dropped. Returns one row per
    * item: (item, n_wins, n_games, rating, rank) — rating is the raw
    * 9-dp-snapped MM fixpoint (the query face rounds to 6 dp, and the
    * [[bradleyTerrySql]] twin mirrors the QUERY face, not this op's),
    * rank by rating desc then item asc.
    *
    * Scale shape: the corpus-sized work is ONE groupBy collapsing the
    * judgment log to the bounded unordered-pair grid (i < j, n_ij,
    * wins_by_i); the MM loop then runs on the collected grid
    * (`maxItems` ≤ 4096 items ⇒ ≤ 8.4M grid cells, driver-sized — an
    * eval arena compares models, not documents; the guard fails loudly
    * beyond it). */
  def bradleyTerry(df: DataFrame, winner: Column, loser: Column,
      iterations: Int = 20, maxItems: Int = 4096): DataFrame = {
    require(iterations >= 1 && iterations <= 200,
      s"bradleyTerry: iterations in [1, 200], got $iterations")
    val spark = df.sparkSession
    import spark.implicits._
    def snap9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = df.select(winner.cast("string").as("__w"),
        loser.cast("string").as("__l"))
      .where(col("__w").isNotNull && col("__l").isNotNull
        && col("__w") =!= col("__l"))
    // ONE corpus pass: unordered-pair grid with i = min, j = max
    val gridDf = pairs.select(
        least(col("__w"), col("__l")).as("i"),
        greatest(col("__w"), col("__l")).as("j"),
        when(col("__w") <= col("__l"), 1L).otherwise(0L).as("__wi"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum("__wi").as("wi"))
    // the loud gate runs BEFORE any collect (the kendallTau limit-probe
    // discipline) — an unbounded arena must fail with this message, not
    // with a driver OOM from collecting its grid. The grid is persisted
    // so the probe and the collect share ONE corpus collapse; both
    // actions are eager, so the unpersist below is safe.
    gridDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = try {
      val nItems = gridDf.select(explode(array(col("i"), col("j"))).as("x"))
        .distinct().limit(maxItems + 1).agg(count(lit(1))).head().getLong(0)
      require(nItems >= 2, "bradleyTerry: need >= 2 items")
      require(nItems <= maxItems,
        s"bradleyTerry: > $maxItems distinct items — the pair grid stops " +
          "being driver-sized; shard the arena or raise the limit " +
          "deliberately")
      gridDf.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    } finally gridDf.unpersist(blocking = false)
    val items = grid.flatMap(g => Seq(g._1, g._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = new Array[Long](k)
    val games = new Array[Long](k)
    grid.foreach { case (i, j, n, wi) =>
      val (a, b) = (idx(i), idx(j))
      wins(a) += wi; wins(b) += n - wi
      games(a) += n; games(b) += n
    }
    items.indices.foreach { a =>
      require(wins(a) > 0 && wins(a) < games(a),
        s"bradleyTerry: item '${items(a)}' has ${wins(a)} wins in " +
          s"${games(a)} games — an all-win/all-loss item has no finite " +
          "MLE (Ford 1957); filter it or add pseudo-judgments")
    }
    // adjacency in SORTED item order — the twin's sum order within an
    // iteration differs, but every sum lands on O(1)-magnitude values
    // whose ~1e-15 wobble is 6 orders under the 0.5e-9 snap grid
    val adj = Array.fill(k)(List.empty[(Int, Long)])
    grid.foreach { case (i, j, n, _) =>
      val (a, b) = (idx(i), idx(j))
      adj(a) = (b, n) :: adj(a); adj(b) = (a, n) :: adj(b)
    }
    var p = Array.fill(k)(1.0)
    for (_ <- 1 to iterations) {
      val raw = Array.tabulate(k) { a =>
        var denom = 0.0
        adj(a).sortBy(_._1).foreach { case (b, n) =>
          denom += n / (p(a) + p(b))
        }
        wins(a) / denom
      }
      val logMean = raw.map(math.log).sum / k
      val g = math.exp(logMean)
      p = raw.map(x => snap9(x / g))
    }
    val rows = items.indices.map(a => (items(a), wins(a), games(a), p(a)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rating").desc, col("item"))
    rows.toDF("item", "n_wins", "n_games", "rating")
      .withColumn("rank", row_number().over(w).cast("long"))
      .orderBy("rank")
  }

  /** DuckDB twin of [[bradleyTerry]] — the RECOMPUTED-trajectory oracle
    * pattern ([[Calibration.plattFit]]'s twin discipline): the judgment
    * log collapses to the same unordered-pair grid in SQL, and the MM
    * iterations unroll as chained CTE pairs (raw update, then
    * geometric-mean normalize + 9-dp round — DuckDB's round is
    * half-away-from-zero, which equals the Scala side's HALF_UP on
    * these positive ratings). `pairsSql` must yield (w, l) item ids as
    * strings. */
  def bradleyTerrySql(pairsSql: String, iterations: Int): String = {
    // every stage is MATERIALIZED: r_t references p_{t-1} twice and
    // p_t references r_t twice — inlined, the plan tree doubles per
    // iteration (2^T blowup; 12 iterations hung DuckDB before this)
    val steps = (1 to iterations).map { t =>
      val prev = if (t == 1) "p0" else s"p${t - 1}"
      s"""r$t AS MATERIALIZED (
         |  SELECT w.item, w.w / sum(adj.n / (pa.p + pb.p)) AS p
         |  FROM adj
         |  JOIN wins w ON adj.a = w.item
         |  JOIN $prev pa ON adj.a = pa.item
         |  JOIN $prev pb ON adj.b = pb.item
         |  GROUP BY w.item, w.w),
         |p$t AS MATERIALIZED (
         |  SELECT item, round(p / exp((SELECT avg(ln(p)) FROM r$t)), 9) AS p
         |  FROM r$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($pairsSql),
       |grid AS MATERIALIZED (
       |  -- MATERIALIZED: every iteration CTE references adj/grid; left
       |  -- inline, DuckDB re-plans the source scan once per reference
       |  -- and runs out of file handles on the parquet view
       |  SELECT CASE WHEN w <= l THEN w ELSE l END AS i,
       |         CASE WHEN w <= l THEN l ELSE w END AS j,
       |         CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN w <= l THEN 1 ELSE 0 END) AS BIGINT) AS wi
       |  FROM pairs
       |  WHERE w IS NOT NULL AND l IS NOT NULL AND w <> l
       |  GROUP BY 1, 2),
       |adj AS MATERIALIZED (
       |  SELECT i AS a, j AS b, n, wi AS w_a FROM grid
       |  UNION ALL
       |  SELECT j AS a, i AS b, n, n - wi AS w_a FROM grid),
       |wins AS (SELECT a AS item, CAST(sum(w_a) AS BIGINT) AS w,
       |    CAST(sum(n) AS BIGINT) AS games
       |  FROM adj GROUP BY 1),
       |p0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS p FROM wins),
       |$steps
       |SELECT w.item, w.w AS n_wins, w.games AS n_games,
       |  round(p.p, 6) AS rating,
       |  row_number() OVER (ORDER BY p.p DESC, w.item) AS rank
       |FROM wins w JOIN p$iterations p ON w.item = p.item
       |ORDER BY rank""".stripMargin
  }

  /** Normalization shared by [[tokenF1]]'s two legs: lowercase, strip
    * every non-ASCII-alphanumeric run to one space, trim. Deliberately
    * ASCII-only ([a-z0-9]) so the regex means the SAME thing in Spark
    * and the DuckDB twin — \p{L} classes differ across regex engines. */
  private def normTokens(c: Column): Column =
    split(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")), " ")

  /** Normalized token ARRAY without higher-order functions: the regex
    * collapse leaves single-space-separated tokens with no empties, so
    * the only empty-token case is the all-stripped string — handled by
    * an explicit branch rather than a (CodegenFallback) `filter` HOF. */
  private def tokArr(c: Column): Column = {
    val n = trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    when(n === "", typedLit(Seq.empty[String])).otherwise(split(n, " "))
  }

  /** SQuAD-style token F1 + exact match per (prediction, reference)
    * pair (Rajpurkar et al. 2016, the official evaluate-v2 recipe with
    * ASCII normalization): tokens are the normalized words, overlap is
    * the MULTISET intersection Σ_t min(cnt_pred(t), cnt_ref(t)),
    * P = overlap/|pred|, R = overlap/|ref|, F1 = 2PR/(P+R) (0 when the
    * overlap is empty); when EITHER side normalizes to nothing,
    * F1 := EM (both empty ⇒ 1, else 0 — the reference implementation's
    * rule). EM compares the full normalized strings. Rows with NULL on
    * either side are dropped. Returns per id:
    * (id, n_pred, n_ref, n_common, precision, recall, f1, exact_match).
    *
    * Scale shape: ONE row-local projection, ZERO shuffles — the
    * overlap is the native [[org.apache.spark.sql.graft.MultisetOverlap]]
    * two-pointer merge over the sort_array'd token lists. The exploded
    * alternative ((id, token)-keyed counts + full-outer join) costs
    * five corpus-sized shuffles and measured 283.5 s at 5M docs where
    * this form streams as-is; it survives as the spec parity baseline
    * ([[tokenF1Exploded]]) and as the oracle twin's mechanism. */
  def tokenF1(df: DataFrame, id: Column, pred: Column,
      ref: Column): DataFrame = {
    val base = df.select(id.as("id"), pred.cast("string").as("__p"),
        ref.cast("string").as("__r"))
      .where(col("__p").isNotNull && col("__r").isNotNull)
    finishF1(base
      .withColumn("n_pred", size(tokArr(col("__p"))).cast("long"))
      .withColumn("n_ref", size(tokArr(col("__r"))).cast("long"))
      .withColumn("n_common",
        org.apache.spark.sql.graft.MinHashShim.multisetOverlapCol(
          sort_array(tokArr(col("__p"))), sort_array(tokArr(col("__r")))))
      .withColumn("exact_match",
        (array_join(tokArr(col("__p")), " ") ===
          array_join(tokArr(col("__r")), " ")).cast("long")))
  }

  /** Exploded parity baseline of [[tokenF1]] (the Pca
    * centeredMomentsExploded discipline): the same faces from
    * (id, token)-keyed count aggregations and a full-outer token join —
    * bit-equal output, five shuffles; kept only for the spec
    * cross-check. */
  private[graft] def tokenF1Exploded(df: DataFrame, id: Column,
      pred: Column, ref: Column): DataFrame = {
    val base = df.select(id.as("id"), pred.cast("string").as("__p"),
        ref.cast("string").as("__r"))
      .where(col("__p").isNotNull && col("__r").isNotNull)
    def counts(side: Column, out: String) =
      base.select(col("id"), explode(normTokens(side)).as("__t"))
        .where(length(col("__t")) > 0)
        .groupBy("id", "__t").agg(count(lit(1)).as(out))
    val overlap = counts(col("__p"), "__cp")
      .join(counts(col("__r"), "__cr"), Seq("id", "__t"), "full_outer")
      .groupBy("id").agg(
        sum(coalesce(col("__cp"), lit(0L))).as("n_pred"),
        sum(coalesce(col("__cr"), lit(0L))).as("n_ref"),
        sum(least(coalesce(col("__cp"), lit(0L)),
          coalesce(col("__cr"), lit(0L)))).as("n_common"))
    val em = base.select(col("id"),
      (array_join(normTokens(col("__p")), " ") ===
        array_join(normTokens(col("__r")), " ")).cast("long")
        .as("exact_match"))
    // left join from em: a row whose BOTH sides normalize to nothing
    // produces no token rows at all, so the overlap side is missing
    finishF1(em.join(overlap, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        col("exact_match")))
  }

  /** Shared P/R/F1 face over (id, n_pred, n_ref, n_common,
    * exact_match) — both [[tokenF1]] forms end here, so the division
    * sequence (and thus every rounded face) is identical. */
  private def finishF1(counted: DataFrame): DataFrame =
    counted
      .withColumn("precision",
        when(col("n_pred") > 0, col("n_common").cast("double") / col("n_pred")))
      .withColumn("recall",
        when(col("n_ref") > 0, col("n_common").cast("double") / col("n_ref")))
      .withColumn("f1",
        when(col("n_pred") === 0 || col("n_ref") === 0,
          col("exact_match").cast("double"))
        .when(col("n_common") === 0, lit(0.0))
        .otherwise(lit(2.0) * col("precision") * col("recall")
          / (col("precision") + col("recall"))))
      .select(col("id"), col("n_pred"), col("n_ref"), col("n_common"),
        col("precision"), col("recall"), col("f1"), col("exact_match"))
}
