package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-lexical retrieval over a document corpus — Okapi BM25 top-k,
  * the standard keyword-search scorer (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond"; idf in the
  * Lucene `ln(1 + (N − df + 0.5)/(df + 0.5))` non-negative form).
  *
  * In an LLM data pipeline this is the workhorse for targeted corpus
  * probes: finding training documents that match benchmark prompts
  * (contamination auditing beyond exact n-gram hits), pulling topical
  * slices for mixture tuning, and serving as the sparse half of hybrid
  * (BM25 + dense ANN) retrieval next to [[Similarity.bruteForceTopK]].
  *
  * Scale shape (the query side is assumed small — it is broadcast):
  *  - ONE full-corpus scan computes, row-locally, the per-doc token list
  *    and its length `dl` (no shuffle — `dl` is `size(split(...))`).
  *    Tokens are immediately filtered to the query-term set (a literal
  *    `isin` over the handful of distinct query terms, applied before the
  *    explode output leaves the stage), so the only corpus-sized shuffle
  *    — the `(doc, term)` tf aggregation — carries matched tokens only,
  *    not the whole corpus.
  *  - A SECOND narrow scan aggregates corpus stats `N` (docs with ≥1
  *    token) and `avgdl` to one row, joined back via broadcast. Document
  *    frequency `df` is a group-by over the already-tiny matched tf
  *    table, broadcast back likewise.
  *  - Scoring is a `groupBy(qid, doc)` sum over at most
  *    |matched postings| rows, then a per-query top-k window over docs
  *    that matched at least one term — bounded by matches, not N.
  *
  * Tokenization is `lower(trim(text))` split on whitespace with empty
  * tokens dropped — byte-identical to the SQL twin
  * (`string_split_regex(lower(trim(text)), '\s+')`). Docs with zero
  * tokens are absent from `N`, `avgdl`, and the result. Query terms are
  * DEDUPLICATED per query (each distinct term contributes once,
  * regardless of its multiplicity in the query string).
  *
  * Returns (qid, doc id, score, rank), rank 1..k per qid by score desc,
  * ties to the lowest doc id. Reference has no retrieval operator — this
  * extends the curation surface (SURVEY §2.12).
  */
object Retrieval {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** The ONE query-term convention every ranker shares (and every DuckDB
    * twin assumes): lowercase, whitespace-split, DISTINCT (qid, term)
    * pairs. Fails loudly on an all-blank query set. */
  private def queryTerms(queries: Seq[(String, String)]): Seq[(String, String)] = {
    require(queries.nonEmpty, "queries must be non-empty")
    val qt = queries.flatMap { case (q, t) =>
      t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
        .map(q -> _)
    }.distinct
    require(qt.nonEmpty, "queries contain no tokens")
    qt
  }

  def bm25TopK(docs: DataFrame, id: String, text: Column,
      queries: Seq[(String, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    // distinct (qid, term) pairs — driver-side, the query set is literal
    val qterms = queryTerms(queries)
    val termSet = qterms.map(_._2).distinct

    // pass 1 (corpus-sized): matched postings with row-local dl.
    // The isin filter on the exploded term keeps the shuffle input at
    // |matched tokens|; dl rides along as part of the group key (it is
    // functionally determined by the doc id).
    val arr = toks(text)
    val tf = docs
      .select(col(id).as("__doc"), size(arr).as("dl"), explode(arr).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy("__doc", "dl", "term")
      .agg(count(lit(1)).as("tf"))

    // pass 2 (narrow): corpus size and average doc length, one row
    val stats = docs.select(size(toks(text)).as("dl")).where(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // document frequency per matched term — tiny, broadcast back
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))

    val qdf = qterms.toDF("qid", "term")
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qdf), "term")
      .join(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))

    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("__doc").asc)
    contrib.groupBy("qid", "__doc")
      .agg(sum("w").as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("__doc").as(id), col("score"), col("rank"))
  }

  /** Query-term-coverage top-k: rank documents by how many DISTINCT query
    * terms they contain (ties to the lowest doc id) — the simplest
    * Boolean-ish lexical ranking, used here as an independent signal for
    * [[rrfFuse]]. Same tokenization and scale shape as [[bm25TopK]] minus
    * the corpus-stats pass (coverage needs no N/avgdl/df).
    * Returns (qid, doc id, n_terms, rank). */
  def coverageTopK(docs: DataFrame, id: String, text: Column,
      queries: Seq[(String, String)], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queryTerms(queries)
    val termSet = qterms.map(_._2).distinct
    val matched = docs
      .select(col(id).as("__doc"), explode(toks(text)).as("term"))
      .where(col("term").isin(termSet: _*)).distinct()
      .join(broadcast(qterms.toDF("qid", "term")), "term")
    val w = Window.partitionBy("qid").orderBy(col("n_terms").desc, col("__doc").asc)
    matched.groupBy("qid", "__doc")
      .agg(count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("__doc").as(id), col("n_terms"), col("rank"))
  }

  /** Hard-negative mining for contrastive retrieval/embedding training
    * (the ANCE/DPR data-prep step, Xiong et al. 2021): for every query,
    * the top-k most-similar corpus documents that are NOT among that
    * query's labeled positives — harder than random negatives, cheaper
    * than exhaustive. `neighbors` is any scored-neighbor table
    * (`qid`, `id`, score column, e.g. [[Similarity.bruteForceTopK]]
    * exact or `ivfTopK` at scale — fetch MORE than k so the positive
    * removals can't starve the list); `positives` is the labeled
    * (`qid`, `id`) pair table. One left-anti join (positives are
    * per-query small — broadcast) + the per-query re-rank window.
    * Ranks on the rounded score with an id tiebreak, the engine's
    * usual ulp-robust ordering. Returns (qid, id, score, rank). */
  def mineHardNegatives(neighbors: DataFrame, positives: DataFrame,
      qid: String, id: String, score: String, k: Int,
      scoreRound: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(qid)
      .orderBy(col("__s").desc, col(id).asc)
    neighbors
      .join(broadcast(positives.select(col(qid), col(id))),
        Seq(qid, id), "left_anti")
      .withColumn("__s", round(col(score), scoreRound))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qid), col(id), col("__s").as(score), col("rank"))
  }

  /** Retrieval evaluation at cutoff k — recall@k, MRR@k, and nDCG@k
    * (Järvelin & Kekäläinen 2002) per query, the standard scorecard for
    * any ranking this module (or the ANN family) produces:
    *
    *  - `recall_at_k` = |relevant ∩ top-k| / |relevant| (ALL relevant,
    *    not capped at k — the honest denominator);
    *  - `mrr_at_k` = 1/rank of the first relevant in the top-k (0 when
    *    none);
    *  - `ndcg_at_k` = Σ_{i≤k} (2^rel − 1)/log2(i+1) over the retrieved
    *    order, normalized by the same sum over the IDEAL order of that
    *    query's own judgments (graded `rel`; binary 0/1 works as-is).
    *
    * `ranking` carries (`qid`, `id`, `rank`); `qrels` carries (`qid`,
    * `id`, `relCol`) with rel ≤ 0 meaning judged-irrelevant. Queries
    * WITHOUT positive judgments are excluded (no ground truth to grade
    * against); queries whose top-k missed everything still appear with
    * zeros. Scale shape: one broadcast-able join of the top-k slice
    * against the judgments + two per-query aggregations; the ideal-DCG
    * window partitions by query over the judgment table only. */
  def retrievalMetrics(ranking: DataFrame, qrels: DataFrame, qid: String,
      id: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rel = qrels.where(col(relCol) > 0)
      .select(col(qid), col(id), col(relCol).cast("double").as("__rel"))
    def gain(r: Column): Column = pow(lit(2.0), r) - 1.0
    val hits = ranking.where(col("rank") <= k)
      .join(rel, Seq(qid, id))
      .groupBy(qid).agg(
        count(lit(1)).as("__hits"),
        min(col("rank")).as("__first"),
        sum(gain(col("__rel")) / log2(col("rank") + 1)).as("__dcg"))
    val wIdeal = Window.partitionBy(qid).orderBy(col("__rel").desc, col(id).asc)
    val perQuery = rel.withColumn("__rn", row_number().over(wIdeal))
      .groupBy(qid).agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__rn") <= k, gain(col("__rel")) / log2(col("__rn") + 1))
          .otherwise(0.0)).as("__idcg"))
    perQuery.join(hits, Seq(qid), "left")
      .select(col(qid), col("n_rel"),
        round(coalesce(col("__hits").cast("double"), lit(0.0)) / col("n_rel"), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as("mrr_at_k"),
        round(coalesce(col("__dcg") / col("__idcg"), lit(0.0)), 6).as("ndcg_at_k"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
    * any per-query rankings — e.g. BM25 and a dense ANN list — into one,
    * scoring each doc Σᵢ 1/(kRrf + rankᵢ). Docs missing from a ranking
    * simply contribute nothing for it (the standard convention). Inputs
    * are already top-k-per-query tables, so everything here is
    * post-retrieval small: a union + one tiny aggregation + window.
    * Each input must carry columns (`qid`, `id`, `rank`).
    * Returns (qid, id, score, rank) with ties to the lowest id. */
  def rrfFuse(rankings: Seq[DataFrame], qid: String, id: String, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1 && kRrf >= 1, "k and kRrf must be >= 1")
    val parts = rankings.map(_.select(col(qid), col(id),
      (lit(1.0) / (lit(kRrf.toDouble) + col("rank"))).as("__c")))
    val w = Window.partitionBy(qid).orderBy(col("score").desc, col(id).asc)
    parts.reduce(_ unionByName _)
      .groupBy(qid, id)
      .agg(sum("__c").as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qid), col(id), col("score"), col("rank"))
  }

  /** Rank-biased overlap at evaluation depth k (Webber, Moffat & Zobel
    * 2010, "A Similarity Measure for Indefinite Rankings" — the RBO_MIN
    * prefix form: agreements beyond depth k count 0): per query,
    *
    *   rbo@k = (1 − p) · Σ_{d=1..k} p^{d−1} · |A_d ∩ B_d| / d
    *
    * where A_d/B_d are the two rankings' depth-d prefixes and p is the
    * top-weightedness (p = 0.9 ≈ the canonical "first 10 ranks carry
    * ~86 % of the weight"). The ranking-comparison metric for retrieval
    * A/B tests and curation-reorder audits: unlike Kendall/Spearman it
    * handles non-conjoint lists (docs present in only one ranking) and
    * weights the head, which is what retrieval cares about.
    *
    * Scale shape: a doc in both top-k lists contributes to every depth
    * d ≥ max(rank_A, rank_B), so its total weight is the PRECOMPUTED
    * constant c(m) = Σ_{d=m..k} p^{d−1}/d — the rankings join ONCE on
    * (qid, doc) with a literal k-entry lookup, no depth explosion.
    * Queries present in either input but with disjoint prefixes score 0.
    * Inputs carry (`qid`, `id`, `rank`); returns (qid, rbo). */
  /** c(m) = Σ_{d=m..k} p^(d−1)/d at 1-based index m — the per-doc RBO
    * weight for a doc first covered at depth m. Computed once on the
    * driver (ascending-d fold); the SQL twin interpolates these exact
    * doubles as literals, so both engines share one weight table. */
  private[graft] def rboWeights(k: Int, p: Double): Array[Double] =
    Array.tabulate(k)(i => (i + 1 to k)
      .foldLeft(0.0)((acc, d) => acc + math.pow(p, d - 1) / d))

  def rboTopK(a: DataFrame, b: DataFrame, qid: String, id: String, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    val cArr = array(rboWeights(k, p).toIndexedSeq.map(lit(_)): _*)
    // NOTE (r13): pinning the two (bounded) input rankings so each leg
    // runs once was probed and REJECTED — the legs' expensive stages are
    // construction-time collects (BM25's cf fold) that the plan's double
    // read never re-runs, and the checkpoint barrier measured 2.2x
    // SLOWER on retrieval_rbo at sf0.1 (1.21 s → 2.70 s min of 3). The
    // double read re-scans only pushdown-pruned postings.
    def prefix(df: DataFrame, r: String) = df.where(col("rank") <= k)
      .select(col(qid), col(id), col("rank").as(r))
    val hits = prefix(a, "__ra").join(prefix(b, "__rb"), Seq(qid, id))
      .select(col(qid),
        element_at(cArr, greatest(col("__ra"), col("__rb")).cast("int")).as("__w"))
      .groupBy(qid).agg(sum("__w").as("__s"))
    a.select(col(qid)).union(b.select(col(qid))).distinct()
      .join(hits, Seq(qid), "left")
      .select(col(qid), (coalesce(col("__s"), lit(0.0)) * (1 - p)).as("rbo"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2004,
    * "A Study of Smoothing Methods for Language Models Applied to
    * Information Retrieval" — the OTHER canonical lexical model besides
    * BM25, and the stronger one on short queries):
    *
    *   score(q, d) = Σ_{t∈q} log( (tf_{t,d} + μ·P(t|C)) / (dl_d + μ) ),
    *   P(t|C) = cf_t / |C|
    *
    * over the DISTINCT query terms (the bm25TopK convention); query
    * terms absent from the corpus (cf = 0) are dropped, the standard
    * practice (they would send every score to −∞ equally). Ranked docs
    * are those matching ≥ 1 surviving term.
    *
    * Scale shape — same as [[bm25TopK]]: ONE matched-postings token
    * scan (cf_t = Σ_d tf_{t,d} comes from those postings, NOT a second
    * scan) + one narrow total-token pass. The score is computed in the
    * decomposed form
    *
    *   A_q + Σ_{matched t} [log(tf + μp_t) − log(μp_t)] − m_q·log(dl + μ)
    *
    * (A_q = Σ_{t∈q} log(μp_t), m_q = #surviving terms — driver
    * constants), so unmatched-term smoothing never fans out rows.
    * Returns (qid, doc id, score, rank), rank 1..k as [[bm25TopK]]. */
  def qlTopK(docs: DataFrame, id: String, text: Column,
      queries: Seq[(String, String)], k: Int, mu: Double = 1000.0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(mu > 0, s"mu must be > 0, got $mu")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queryTerms(queries)
    val termSet = qterms.map(_._2).distinct

    val arr = toks(text)
    val tf = docs
      .select(col(id).as("__doc"), size(arr).as("dl"), explode(arr).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy("__doc", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false) // read twice: cf fold + contributions

    // greatest(..., 0): Spark's size(null) is -1 — a null-text doc must
    // contribute 0 tokens to |C|, matching the twin's token-row count
    val total = docs.select(sum(greatest(size(arr), lit(0))).as("t"))
      .head().getLong(0).toDouble
    val cf: Map[String, Long] = tf.groupBy("term")
      .agg(sum("tf").as("cf")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // per-(qid, term) smoothing mass μ·p_t as literals; per-qid constants
    // A_q and m_q driver-side in sorted-term order (deterministic fold)
    val seen = qterms.filter { case (_, t) => cf.contains(t) }
    require(seen.nonEmpty, "no query term occurs in the corpus")
    val qdf = seen.map { case (q, t) =>
      (q, t, mu * (cf(t) / total))
    }.toDF("qid", "term", "muP")
    val aq = seen.groupBy(_._1).map { case (q, ts) =>
      val sorted = ts.map(_._2).sorted
      (q, sorted.map(t => math.log(mu * (cf(t) / total))).sum, sorted.size)
    }.toSeq.toDF("qid", "aq", "mq")

    val wr = Window.partitionBy("qid").orderBy(col("score").desc, col("__doc").asc)
    tf.join(broadcast(qdf), "term")
      .withColumn("__c", log(col("tf") + col("muP")) - log(col("muP")))
      .groupBy("qid", "__doc", "dl")
      .agg(sum("__c").as("__bonus"))
      .join(broadcast(aq), "qid")
      .withColumn("score",
        col("aq") + col("__bonus") - col("mq") * log(col("dl") + mu))
      .withColumn("rank", row_number().over(wr))
      .where(col("rank") <= k)
      .select(col("qid"), col("__doc").as(id), col("score"), col("rank"))
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft 2001, "Relevance-
    * Based Language Models"; the RM3 interpolation of Abdul-Jaleel et
    * al. 2004 — the Anserini/Pyserini default expansion): run BM25, take
    * the top `fbDocs` per query as pseudo-relevant, estimate the
    * relevance model
    *
    *   RM1(t) = Σ_d P(t|d)·P(d|q),  P(t|d) = tf/dl,
    *   P(d|q) = the doc's BM25 score normalized within the query,
    *
    * keep the `fbTerms` heaviest terms, interpolate with the original
    * query's uniform term MLE (`lambda`·orig + (1−λ)·RM1), and rescore
    * the corpus with the weighted expanded query (per-term BM25 × term
    * weight). In a data pipeline this is the probe that finds
    * contaminated/topical documents the literal benchmark words miss —
    * the expansion surfaces the vocabulary of the matching docs.
    *
    * Scale shape: the feedback stage works on `queries × fbDocs` rows
    * (broadcast everywhere); the corpus text is tokenized ONCE into a
    * narrow materialized frame (doc id, doc length, matched original
    * terms) that feeds the stats literals, the stage-1 postings, AND the
    * rescore's reuse of every original-term posting — the only second
    * corpus scan is for net-new expansion terms (none, when the feedback
    * vocabulary ⊆ the query). P(d|q), RM1, and the final term weights
    * are rounded to 9 dp at each model face, so term selection and
    * scoring replay bit-stably across engines (the EM-iterate
    * convention).
    *
    * Returns (qid, doc id, score, rank), rank 1..k as [[bm25TopK]]. */
  def rm3TopK(docs: DataFrame, id: String, text: Column,
      queries: Seq[(String, String)], k: Int, fbDocs: Int = 5,
      fbTerms: Int = 8, lambda: Double = 0.5, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1 && fbDocs >= 1 && fbTerms >= 1, "k, fbDocs, fbTerms >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda $lambda outside [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val arr = toks(text)

    val qterms = queryTerms(queries)
    val termSet1 = qterms.map(_._2).distinct

    // ONE tokenizing corpus pass feeds both the stats aggregate and the
    // stage-1 postings: per doc, (id, dl, original-terms matched) — a
    // NARROW materialization (two scalars + a ≤|q|-element array per
    // doc), so the corpus text is split exactly once for everything
    // stage 1 needs. The rescore's net-new terms are the only reason to
    // touch the raw text again.
    val perDoc = docs.select(col(id).as("__doc"), size(arr).as("dl"),
        filter(arr, t => t.isin(termSet1: _*)).as("__mt"))
      .localCheckpoint(eager = false) // materialized by the first action below

    // corpus stats as a one-row plan: broadcast into stage-1 scoring and
    // collected (piggybacked on the P(d|q) job) into literals for the
    // rescore — same count/avg arithmetic either way, so scores are
    // bit-identical to the unshared form
    val statsDf = perDoc.where(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    // matched postings for a literal term set — a full tokenizing scan;
    // stage 1 never needs it (perDoc already carries its matches)
    def postings(termSet: Seq[String]): DataFrame = docs
      .select(col(id).as("__doc"), size(arr).as("dl"), explode(arr).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy("__doc", "dl", "term")
      .agg(count(lit(1)).as("tf"))

    // weighted-BM25 ranking from a postings frame: per-(qid, term) weight
    // × idf × saturated tf, summed per doc. With wq = 1.0 this is exactly
    // bm25TopK's score (1.0·x ≡ x in IEEE-754). Stats arrive either as
    // the broadcast one-row plan (stage 1) or as driver literals
    // (stage 4) — n_docs long and avgdl double in both shapes, so the
    // IEEE sequence is identical.
    def rankTopK(tf: DataFrame, weights: DataFrame, topK: Int,
        statsLit: Option[(Long, Double)]): DataFrame = {
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val joined = tf
        .join(broadcast(dfreq), "term")
        .join(broadcast(weights), "term")
      val withStats = statsLit match {
        case Some((n, a)) =>
          joined.withColumn("n_docs", lit(n)).withColumn("avgdl", lit(a))
        case None => joined.join(broadcast(statsDf))
      }
      val contrib = withStats
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
        .withColumn("__c", col("wq") * col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      val wr = Window.partitionBy("qid").orderBy(col("score").desc, col("__doc").asc)
      contrib.groupBy("qid", "__doc")
        .agg(sum("__c").as("score"))
        .withColumn("rank", row_number().over(wr))
        .where(col("rank") <= topK)
    }

    // ---- stage 1: pseudo-relevant set = base BM25 top fbDocs. The
    // original-term postings come from the materialized perDoc frame —
    // no second corpus scan — and stage 4 rescores from the SAME frame
    // for every term it shares with the original query.
    val tf1 = perDoc.where(size(col("__mt")) > 0)
      .select(col("__doc"), col("dl"), explode(col("__mt")).as("term"))
      .groupBy("__doc", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val ones = qterms.map { case (q, t) => (q, t, 1.0) }.toDF("qid", "term", "wq")
    val fb = rankTopK(tf1, ones, fbDocs, statsLit = None)
    val wq = Window.partitionBy("qid")
    // P(d|q) is BOUNDED (queries × fbDocs rows) — collected once and
    // re-injected as a local frame (the expandedRows pattern): leaving
    // it lazy re-executes the whole stage-1 ranking subtree once per
    // broadcast that references it. The one-row stats frame rides the
    // SAME collect (cross-joined onto every pd row), so the first action
    // of the query materializes the checkpoint, ranks the feedback docs,
    // AND surfaces n_docs/avgdl — one job, not three.
    val pdPlan = fb.withColumn("__pd",
        round(col("score") / sum("score").over(wq), 9))
      .select(col("qid"), col("__doc"), col("__pd"))
      .join(broadcast(statsDf))
    val pdCollected = pdPlan.collect()
    if (pdCollected.isEmpty) {
      // no query term matched any document (tf1 empty ⟺ fb empty): the
      // rescore can only be empty too — and on an all-empty corpus the
      // stats row holds avgdl = NULL, so proceeding would NPE
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(id, docs.schema(id).dataType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType)))
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), outSchema)
    }
    val nDocs = pdCollected.head.getAs[Long]("n_docs")
    val avgdl = pdCollected.head.getAs[Double]("avgdl")
    val pdSchema = org.apache.spark.sql.types.StructType(pdPlan.schema.take(3))
    val pd = spark.createDataFrame(
      java.util.Arrays.asList(pdCollected.map(r =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2))): _*), pdSchema)

    // ---- stage 2: relevance model over the feedback docs only — the
    // broadcast semi-join runs BEFORE the tokenizer, so only the
    // queries × fbDocs surviving docs are split and exploded at all
    // (tokenizing the whole corpus here would repeat the perDoc pass
    // for rows that are then thrown away)
    val fbToks = docs
      .select(col(id).as("__doc"), text.as("__text"))
      .join(broadcast(pd), "__doc")
      .select(col("qid"), col("__doc"), col("__pd"),
        toks(col("__text")).as("__arr"))
      .select(col("qid"), col("__doc"), col("__pd"),
        size(col("__arr")).as("dl"), explode(col("__arr")).as("term"))
    val rm1 = fbToks
      .groupBy("qid", "__doc", "__pd", "dl", "term")
      .agg(count(lit(1)).as("tf"))
      .withColumn("__w", col("tf").cast("double") / col("dl") * col("__pd"))
      .groupBy("qid", "term").agg(round(sum("__w"), 9).as("rm1"))
    val wt = Window.partitionBy("qid").orderBy(col("rm1").desc, col("term"))
    val topTerms = rm1.withColumn("__r", row_number().over(wt))
      .where(col("__r") <= fbTerms).drop("__r")

    // ---- stage 3: interpolate with the original query MLE (uniform
    // over DISTINCT terms — the bm25TopK dedup convention)
    val orig = qterms.groupBy(_._1).toSeq.flatMap { case (q, ts) =>
      ts.map { case (_, t) => (q, t, 1.0 / ts.size) }
    }.toDF("qid", "term", "__orig")
    // The expanded query is BOUNDED (≤ queries × (fbTerms + |q|) rows),
    // so it is collected ONCE and re-injected as literals (the
    // dsirScorer train-once pattern). Leaving it lazy would recompute
    // the whole feedback chain — including the base BM25 corpus passes —
    // once per broadcast subtree of the rescore plan (this plus the
    // pre-explode feedback filter took the 5M worst-case probe from
    // 204.6 s to 108.6 s), and the literal term set restores the
    // codegen'd hashed-InSet postings prefilter.
    // Zero-weight terms (λ = 1 expansion, or a 9-dp-rounded-to-zero RM1
    // tail) are pruned: they contribute nothing but would drag their
    // postings through the rescore shuffle AND surface score-0 docs.
    val expandedRows: Seq[(String, String, Double)] =
      topTerms.join(orig, Seq("qid", "term"), "full_outer")
        .select(col("qid"), col("term"),
          round(coalesce(col("__orig"), lit(0.0)) * lambda
            + coalesce(col("rm1"), lit(0.0)) * (1.0 - lambda), 9).as("wq"))
        .where(col("wq") > 0)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val expanded = expandedRows.toDF("qid", "term", "wq")

    // ---- stage 4: weighted-BM25 rescore with the expanded vocabulary.
    // Postings for terms stage 1 already matched come from the
    // materialized tf1 (a filter over the checkpoint, no corpus scan);
    // the corpus is re-scanned ONLY for the net-new expansion terms —
    // and not at all when the feedback vocabulary ⊆ the original query.
    val termSet2 = expandedRows.map(_._2).distinct
    val origSet = termSet1.toSet
    val (reusedTerms, newTerms) = termSet2.partition(origSet.contains)
    val tfReused = tf1.where(col("term").isin(reusedTerms: _*))
    val tf2 =
      if (newTerms.isEmpty) tfReused
      else if (reusedTerms.isEmpty) postings(newTerms)
      else tfReused.unionByName(postings(newTerms))
    rankTopK(tf2, expanded, k, statsLit = Some((nDocs, avgdl)))
      .select(col("qid"), col("__doc").as(id), col("score"), col("rank"))
  }
}
