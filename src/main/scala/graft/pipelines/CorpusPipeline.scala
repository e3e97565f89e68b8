package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Stats, TextOps}

/** End-to-end training-corpus curation — the 100 TB use case the
  * training-data operators exist for, composed engine-native (every stage
  * is one of the individually-oracled ops; nothing here is new math):
  *
  *  1. exact dedup — keep the lowest id per md5(content);
  *  2. near-dup clustering — MinHash-LSH candidate pairs → verified
  *     Jaccard → connected components → keep the BEST doc per cluster
  *     (highest quality score, ties to lowest id);
  *  3. benchmark decontamination — drop docs sharing ≥ `decontamMinShared`
  *     word n-grams with the eval set;
  *  4. quality + repetition filters (C4/Gopher-style);
  *  5. deterministic stratified sampling toward per-group rates;
  *  6. training-sequence packing (bin/offset per doc).
  *
  * Scale shape: stages 1–5 are the ops' documented one-shuffle forms;
  * nothing materializes the corpus more than once per stage. The funnel
  * counts in [[CurationResult.funnel]] are computed from ONE action per
  * stage — skip [[curateCounted]] and use [[curate]] when the counts
  * aren't worth the extra jobs.
  */
object CorpusPipeline {

  final case class CurationConfig(
      shingleWords: Int = 3,
      lshBands: Int = 8,
      lshRowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.8,
      decontamN: Int = 8,
      decontamMinShared: Long = 1L,
      minQuality: Double = 0.3,
      maxDupLineRatio: Double = 0.5,
      maxTopWordRatio: Double = 0.5,
      sampleRates: Map[String, Double] = Map.empty,
      defaultSampleRate: Double = 1.0,
      seed: Long = 7L,
      packBudgetTokens: Int = 2048,
      // CCNet delete step: Some(w) removes w-token tiles duplicated
      // across >= spanRemovalMinDocs docs BEFORE the quality filters
      // (repetition is then judged on the cleaned text; the near-dup
      // quality rank keeps the pre-removal score)
      spanRemovalTileWords: Option[Int] = None,
      spanRemovalMinDocs: Int = 2,
      // Some(t): after near-dedup, ALSO drop docs contained (C >= t) in
      // a bigger surviving doc — the quote/excerpt collapse Jaccard
      // clustering never fires on (Dedup.dedupByContainment)
      containmentThreshold: Option[Double] = None,
      containmentShingleWords: Int = 3)

  final case class CurationResult(packed: DataFrame, funnel: Seq[(String, Long)])

  /** The curated, packed corpus (lazy — no actions). */
  def curate(docs: DataFrame, id: String, text: String, group: Column,
      benchmark: DataFrame, benchText: String,
      cfg: CurationConfig = CurationConfig()): DataFrame =
    stages(docs, id, text, group, benchmark, benchText, cfg).last._2

  /** [[curate]] plus a per-stage row-count funnel (one count action per
    * stage — diagnostic mode). */
  def curateCounted(docs: DataFrame, id: String, text: String, group: Column,
      benchmark: DataFrame, benchText: String,
      cfg: CurationConfig = CurationConfig()): CurationResult = {
    val st = stages(docs, id, text, group, benchmark, benchText, cfg)
    CurationResult(st.last._2, st.map { case (n, df) => n -> df.count() })
  }

  private def stages(docs: DataFrame, id: String, text: String, group: Column,
      benchmark: DataFrame, benchText: String,
      cfg: CurationConfig): Seq[(String, DataFrame)] = {
    // 1. exact dedup
    val exact = Dedup.dedupExact(docs, id, text)

    // 2. near-dup clusters → keep best-quality doc per component
    val pairs = Dedup.minhashNearDuplicates(exact, id, text,
      cfg.jaccardThreshold, cfg.shingleWords, cfg.lshBands, cfg.lshRowsPerBand)
    val comps = Dedup.connectedComponents(exact, pairs, id, "id_a", "id_b")
    val scored = exact.withColumn("__q", TextOps.qualityScore(col(text)))
    val keepers = scored
      .join(comps.withColumnRenamed(id, "__cid"), col(id) === col("__cid"))
      .groupBy("component")
      // highest quality wins; ties to the LOWEST id (negate for max)
      .agg(max(struct(col("__q").as("q"), (-col(id)).cast("long").as("nid"))).as("best"))
      .select((-col("best.nid")).as("__keep"))
    val nearDeduped = scored
      .join(broadcastIfSmall(keepers), col(id) === col("__keep"), "left_semi")

    // 2.5 optional containment collapse (short-in-long excerpts)
    val contained = cfg.containmentThreshold match {
      case Some(t) => Dedup.dedupByContainment(nearDeduped, id, text,
        cfg.containmentShingleWords, t)
      case None => nearDeduped
    }

    // 3. decontamination
    val contaminated = Dedup
      .decontaminate(contained, id, text, benchmark, benchText, cfg.decontamN)
      .where(col("n_shared_grams") >= cfg.decontamMinShared)
      .select(col(id))
    val clean = contained.join(contaminated, Seq(id), "left_anti")

    // 3.5 optional in-document duplicate-span removal (CCNet delete step)
    val spanned = cfg.spanRemovalTileWords match {
      case Some(w) =>
        val removed = Dedup
          .removeDuplicateSpans(clean, id, text, w, cfg.spanRemovalMinDocs)
          .select(col(id), col("text_clean"))
        clean.drop(text).join(removed, Seq(id))
          .withColumnRenamed("text_clean", text)
      case None => clean
    }

    // 4. quality + repetition filters
    val rep = TextOps.repetitionStats(col(text))
    val filtered = spanned
      .where(col("__q") >= cfg.minQuality &&
        rep.getField("dup_line_ratio") <= cfg.maxDupLineRatio &&
        rep.getField("top_word_ratio") <= cfg.maxTopWordRatio)

    // 5. stratified sampling
    val sampled = Stats.stratifiedSample(filtered, col(id), group,
      cfg.sampleRates, cfg.defaultSampleRate, cfg.seed)

    // 6. packing
    val packed = TextOps
      .packSequences(sampled, col(text), Seq(col(id)), cfg.packBudgetTokens)
      .drop("__q")

    Seq("input" -> docs, "exact_dedup" -> exact, "near_dedup" -> nearDeduped) ++
      (if (cfg.containmentThreshold.isDefined)
         Seq("containment_dedup" -> contained) else Seq.empty) ++
      Seq("decontaminated" -> clean) ++
      (if (cfg.spanRemovalTileWords.isDefined) Seq("span_removed" -> spanned)
       else Seq.empty) ++
      Seq("filtered" -> filtered, "sampled" -> sampled, "packed" -> packed)
  }

  /** Keeper lists are one id per cluster — usually broadcastable; leave
    * the decision to the planner (AQE converts to broadcast when small),
    * but hint it for the common case. */
  private def broadcastIfSmall(df: DataFrame): DataFrame = broadcast(df)

  /** Stream-native front of the curation funnel — the stages whose state
    * is bounded without seeing the whole corpus, as ONE composable stage
    * over a streaming DataFrame:
    *
    *  1. watermarked exact dedup (first-seen doc per content hash wins;
    *     state = one hash per distinct doc inside the watermark horizon,
    *     evicted as event time advances — [[graft.streaming.StreamingOps.dedupExactStream]]);
    *  2. watermarked MinHash-LSH near-dup dedup when `nearDupId` names the
    *     doc-id column (first-seen doc per near-dup cluster wins, verified
    *     Jaccard at `cfg.jaccardThreshold` with `cfg.shingleWords`/
    *     `cfg.lshBands`/`cfg.lshRowsPerBand` — the online form of batch
    *     stage 2, [[graft.streaming.StreamingOps.nearDupStream]]; state =
    *     shingle-hash sets inside the retention horizon, keyed by LSH
    *     bucket. This stage narrows the stream to (id, ts, text));
    *  3. quality + repetition filters (row-local expressions — identical
    *     columns to the batch stage 4, zero streaming state).
    *
    * The output is an append-safe stream (no aggregation), so it feeds
    * `writeStream` directly. The rest of the batch funnel needs
    * corpus-global state and stays downstream: decontamination joins
    * across the corpus, sampling/packing need global prefix sums — run
    * them as a batch stage over this stream's sink, or per micro-batch
    * via `foreachBatch` where batch-local packing is acceptable (the
    * parity spec demonstrates both).
    *
    * Batch parity: on an in-order stream with no near-dups and an empty
    * benchmark, sinking this stage and batch-packing the result equals
    * [[curate]] exactly (spec-verified by
    * "CorpusPipeline.curateStream equals batch curate"); with `nearDupId`
    * set, the survivor set equals the batch keep-FIRST near-dedup (the
    * "curateStream with near-dup" spec).
    */
  def curateStream(docs: DataFrame, tsCol: String, text: String,
      cfg: CurationConfig = CurationConfig(),
      watermark: String = "10 minutes",
      nearDupId: Option[String] = None,
      nearDupRetentionMs: Long = 60L * 60 * 1000): DataFrame = {
    val deduped = graft.streaming.StreamingOps.dedupExactStream(docs, tsCol, text, watermark)
    val nearDeduped = nearDupId match {
      case Some(idCol) => graft.streaming.StreamingOps.nearDupStream(
        deduped, tsCol, idCol, text, cfg.jaccardThreshold, cfg.shingleWords,
        cfg.lshBands, cfg.lshRowsPerBand, watermark, nearDupRetentionMs)
      case None => deduped
    }
    val rep = TextOps.repetitionStats(col(text))
    nearDeduped.where(TextOps.qualityScore(col(text)) >= cfg.minQuality &&
      rep.getField("dup_line_ratio") <= cfg.maxDupLineRatio &&
      rep.getField("top_word_ratio") <= cfg.maxTopWordRatio)
  }

  /** The full ingest-time admission pipeline: [[curateStream]] (exact
    * dedup → optional near-dup dedup → quality/repetition filters)
    * composed with per-group token-budget admission
    * ([[graft.streaming.StreamingOps.QuotaAdmission]]) — four chained
    * append-mode stateful operators in ONE streaming query, the shape a
    * 100 TB ingest firehose runs continuously: duplicates never reach
    * the quota counters, and over-budget groups stop accumulating at the
    * source instead of in a nightly batch sweep.
    *
    * `group` must be computable from the curated columns (`idCol`,
    * `tsCol`, `textCol`) — e.g. a language-ID or source-prefix expression
    * over the text — because the near-dup stage narrows the stream to
    * those three columns; join wider metadata back on `idCol`
    * downstream. Token counts use [[TextOps.tokenCount]], matching the
    * batch [[TextOps.selectByTokenBudget]] accounting; admission is
    * arrival-order prefix-with-close semantics (see [[StreamingOps.QuotaAdmission]]).
    *
    * State at scale = (docs-in-horizon × bands) shingle sets for the
    * near-dup stage + one hash per distinct doc in the watermark horizon
    * + one (used, closed) pair per group — each partitioned by its own
    * key across executors; nothing global. */
  def curateAdmitStream(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, group: Column, budgetTokens: Long,
      cfg: CurationConfig = CurationConfig(),
      watermark: String = "10 minutes",
      nearDup: Boolean = true,
      nearDupRetentionMs: Long = 60L * 60 * 1000)
      : org.apache.spark.sql.Dataset[graft.streaming.StreamingOps.QuotaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // chained stateful ops trip the same static check nearDupStream
    // documents (its CONF paragraph); quota's gather never filters by
    // watermark, so the flagged failure mode cannot occur here either
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val curated = curateStream(docs, tsCol, textCol, cfg, watermark,
      nearDupId = if (nearDup) Some(idCol) else None, nearDupRetentionMs)
    val qdocs = curated.select(
        group.cast("string").as("group"),
        col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("nTokens"),
        col(textCol).as("text"))
      .as[graft.streaming.StreamingOps.QuotaDoc]
    graft.streaming.StreamingOps.QuotaAdmission.run(qdocs, budgetTokens)
  }
}
