package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Retrieval, Stats, TextOps}
import graft.queries.Q._

/** Training-data pipeline operators over `documents`: deduplication
  * (exact, n-gram Jaccard) and text analysis (token counts, quality,
  * language ID). MinHash-LSH / SimHash / rolling fingerprints are
  * xxhash64-based and not DuckDB-reproducible — they live in
  * [[RowsOnlyQueries]] with ScalaTest coverage instead.
  *
  * The sf documents are all unique, so the exact-dedup queries union the
  * table with an id-shifted copy of itself to manufacture duplicate groups
  * deterministically.
  */
object DedupTextQueries {

  private val IdShift = 1000000L

  val queries: Map[String, QueryFn] = Map(
    "dedup_exact_groups" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + IdShift))
      // doc_ids rendered as a CSV string: the driver's comparator sorts on
      // every output column and array cells aren't orderable in pandas.
      Dedup.exactDuplicates(doubled, "doc_id", "text")
        .withColumn("doc_ids",
          array_join(transform(col("doc_ids"), _.cast("string")), ","))
        .orderBy("dup_hash")
    }),

    "dedup_exact_keep" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + IdShift))
      Dedup.dedupExact(doubled, "doc_id", "text")
        .groupBy("source").agg(count(lit(1)).as("n"), sum("doc_id").as("id_sum"))
        .orderBy("source")
    }),

    "dedup_jaccard_pairs" -> ((s, dir) => {
      // Brute-force token-set Jaccard on a bounded subset (the LSH
      // verifier's exact form): pairs above threshold, deterministic order.
      // (1-gram shingles: this corpus is word soup from a tiny vocab, so
      // token-set overlap is the discriminating signal; 3-grams are ~0.)
      val docs = table(s, dir, "documents").where(col("doc_id") < 120)
      Dedup.jaccardSimilarity(docs, "doc_id", "text", n = 1)
        .where(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_split_leakage" -> ((s, dir) => {
      // Cross-split contamination audit: LSH-banded near-dup pairs
      // (verified Jaccard >= 0.8) that straddle a deterministic 80/20
      // train/eval split — eval docs whose near-dup sits in train.
      // Candidate recall at these banding params is certified by the
      // dedup_minhash_lsh oracle on this same corpus, so the brute
      // all-pairs twin is ground truth here too.
      val docs = table(s, dir, "documents").where(col("doc_id") < 120)
        .withColumn("split",
          when(pmod(col("doc_id"), lit(10)) < 8, "train").otherwise("eval"))
      Dedup.splitLeakage(docs, "doc_id", "text", "split", threshold = 0.8,
          numShingleWords = 1, numBands = 16, rowsPerBand = 2)
        .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_containment" -> ((s, dir) => {
      // Directed containment C(A→B) = |sh(A)∩sh(B)|/|sh(A)| via the
      // prefix-filter join (the SCALE path — lossless by pigeonhole, see
      // Dedup.containmentJoin), certified here against the brute
      // all-ordered-pairs DuckDB twin: a green hash match IS the 100%
      // recall proof on this corpus. Corpus = docs 0..99 plus a prefix
      // EXCERPT (first ⌈len/3⌉ tokens, id+100000) of each doc < 40 — a
      // contiguous prefix keeps its bigrams, so C(excerpt→original) = 1
      // while their Jaccard is far below any LSH threshold: exactly the
      // short-in-long case Jaccard misses.
      val base = table(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), t => length(t) > 0).as("toks"))
      val corpus = base
        .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
        .unionByName(base.where(col("doc_id") < 40).select(
          (col("doc_id") + 100000).as("doc_id"),
          array_join(slice(col("toks"), lit(1), greatest(lit(2),
            floor(size(col("toks")) / lit(3)).cast("int"))), " ").as("text")))
      Dedup.containmentJoin(corpus, "doc_id", "text", n = 2, threshold = 0.6)
        .select(col("id_a"), col("id_b"),
          round(col("containment"), 4).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    "dedup_containment_keep" -> ((s, dir) => {
      // The actionable form on the same corpus as dedup_containment:
      // every planted excerpt collapses into its original; survivors are
      // the containers (+ docs in no containment relation).
      val base = table(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          filter(split(trim(col("text")), "\\s+"), t => length(t) > 0).as("toks"))
      val corpus = base
        .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
        .unionByName(base.where(col("doc_id") < 40).select(
          (col("doc_id") + 100000).as("doc_id"),
          array_join(slice(col("toks"), lit(1), greatest(lit(2),
            floor(size(col("toks")) / lit(3)).cast("int"))), " ").as("text")))
      Dedup.dedupByContainment(corpus, "doc_id", "text", n = 2, threshold = 0.6)
        .select(col("doc_id")).orderBy("doc_id")
    }),

    "dedup_cc_clusters" -> ((s, dir) => {
      // Near-dup CLUSTERING: connected components (iterative min-label
      // propagation) over the brute Jaccard >= 0.9 pair graph; the oracle
      // is the exact min-reachable-id per node via a recursive CTE.
      val docs = table(s, dir, "documents").where(col("doc_id") < 120)
      val pairs = Dedup.jaccardSimilarity(docs, "doc_id", "text", n = 1)
        .where(col("jaccard") >= 0.9)
        .select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(docs, pairs, "doc_id", "id_a", "id_b")
        .orderBy("doc_id")
    }),

    "dedup_keep_best" -> ((s, dir) => {
      // Keep-best-per-cluster (the RefinedWeb keeper rule): same CC
      // clustering as dedup_cc_clusters, keeper = max qualityScore per
      // component, ties to the lowest id — the 6-dp-rounded score keeps
      // the DESC comparison engine-portable.
      // The slice feeds FIVE reads (both jaccard legs, the CC node
      // probe, the CC label rejoin, the quality rejoin): pin it so the
      // corpus is read once (r13)
      val docs = table(s, dir, "documents").where(col("doc_id") < 120)
        .select("doc_id", "text").localCheckpoint(false)
      val pairs = Dedup.jaccardSimilarity(docs, "doc_id", "text", n = 1)
        .where(col("jaccard") >= 0.9)
        .select(col("id_a"), col("id_b"))
      val comp = Dedup.connectedComponents(docs, pairs, "doc_id",
        "id_a", "id_b")
      val scored = docs.join(comp, "doc_id")
        .withColumn("quality", TextOps.qualityScore(col("text")))
      Dedup.keepBestPerCluster(scored, "doc_id", col("component"),
          col("quality"))
        .select(col("doc_id"), col("component"), col("quality"))
        .orderBy("doc_id")
    }),

    "pack_sequences" -> ((s, dir) =>
      // Concat-then-chunk packing into 256-token training sequences in
      // doc_id order — bin/offset from the distributed prefix sum.
      TextOps.packSequences(table(s, dir, "documents"), col("text"),
          Seq(col("doc_id")), budgetTokens = 256)
        .select(col("doc_id"), col("n_tokens"), col("bin"), col("offset"))
        .orderBy("doc_id")),

    "text_zipf_fit" -> ((s, dir) =>
      // Zipf rank–frequency health check: ln(tf) ~ ln(rank) least squares
      // over the top-100 vocabulary (centered sums — no raw-moment
      // cancellation); natural language sits near slope −1.
      TextOps.zipfFit(table(s, dir, "documents"), col("doc_id"), col("text"),
          nRanks = 100)
        .select(col("n_ranks"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"))),

    "pack_padding" -> ((s, dir) =>
      // Padding-efficiency audit for fixed-shape batches: power-of-two
      // sequence-length buckets 32..1024 (exact integer edge comparisons,
      // no log2 — float logs flip at exact power-of-two boundaries),
      // per-bucket pad-token cost and slot efficiency.
      TextOps.paddingEfficiency(table(s, dir, "documents"), col("text"),
          Seq(32, 64, 128, 256, 512, 1024))
        .select(col("seq_len"), col("n_docs"), col("sum_tokens"),
          col("pad_tokens"), round(col("efficiency"), 6).as("efficiency"))
        .orderBy("seq_len")),

    "pack_length_sorted" -> ((s, dir) =>
      // Length-sorted dynamic batching: per-lang shards, batches of 8 in
      // token-length-desc order, each padded to its OWN max — the
      // padding-waste sort saves vs arrival order is the whole point.
      TextOps.lengthSortedBatches(
          table(s, dir, "documents").where(col("doc_id") < 400),
          "doc_id", col("text"), shard = col("lang"), batchSize = 8)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("batch_id"), col("pad_to"), col("pad_tokens"))
        .orderBy("doc_id")),

    "text_entropy" -> ((s, dir) =>
      // Per-doc token Shannon entropy (information-density quality
      // signal): H = ln(n) − Σc·ln(c)/n over the doc's token counts,
      // plus the ln(n_distinct)-normalized form.
      TextOps.tokenEntropy(
          table(s, dir, "documents").where(col("doc_id") < 300),
          "doc_id", col("text"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("entropy"), col("entropy_norm"))
        .orderBy("doc_id")),

    "text_chao1" -> ((s, dir) =>
      // Unseen-vocabulary estimate: Chao1 richness + Good–Turing unseen
      // mass from the frequency-of-frequencies table.
      TextOps.chao1(table(s, dir, "documents"), col("text"))
        .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
          round(col("v_chao1"), 4).as("v_chao1"),
          round(col("p_unseen"), 6).as("p_unseen"))),

    "text_heaps_fit" -> ((s, dir) =>
      // Heaps'-law vocabulary growth V(N) ~ K·N^beta over 10 id-threshold
      // checkpoints — cumulative distinct via the per-token
      // first-appearance trick (two aggregations, no per-checkpoint pass).
      TextOps.heapsFit(table(s, dir, "documents"), col("doc_id"),
          col("text"), nCheckpoints = 10)
        .select(col("n_checkpoints"), round(col("beta"), 6).as("beta"),
          round(col("ln_k"), 6).as("ln_k"), round(col("r2"), 6).as("r2"))),

    "text_pmi_pairs" -> ((s, dir) =>
      // Collocation mining: top-20 adjacent pairs by PMI at >= 30
      // co-occurrences (the count gate keeps hapax pairs out) — the
      // multiword-expression / tokenizer-vocab dial.
      TextOps.pmiPairs(table(s, dir, "documents"), col("text"),
          minCount = 30L, topK = 20)
        .select(col("token_a"), col("token_b"), col("n_pair"),
          round(col("pmi"), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("token_a").asc, col("token_b").asc)),

    "text_distinct_ngrams" -> ((s, dir) =>
      // Lexical diversity (distinct-1/-2/-3): distinct vs total word
      // n-grams corpus-wide — low distinct-3 flags template/boilerplate
      // or decoding-loop synthetic text.
      TextOps.distinctNgramStats(table(s, dir, "documents"), col("text"),
          Seq(1, 2, 3))
        .select(col("n"), col("total_ngrams"), col("distinct_ngrams"),
          round(col("distinct_ratio"), 6).as("distinct_ratio"))
        .orderBy("n")),

    "text_regex_extract" -> ((s, dir) =>
      // regexp_extract_all + explode: the extract-all-matches table (RE2-
      // portable pattern, so both engines tokenize identically); top-20
      // matched substrings with a deterministic tie-break.
      table(s, dir, "documents").where(col("doc_id") < 150)
        .select(explode(regexp_extract_all(col("text"),
          lit("[aeiou][a-z]{3}"), lit(0))).as("m"))
        .groupBy("m").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("m"))
        .limit(20)),

    "pack_split" -> ((s, dir) =>
      // Boundary-splitting packing: docs crossing a 256-token sequence
      // boundary are cut into per-bin pieces (the layout a trainer
      // consumes; every bin exactly full except the corpus tail).
      TextOps.packSequencesSplit(table(s, dir, "documents"), col("text"),
          Seq(col("doc_id")), budgetTokens = 256)
        .select(col("doc_id"), col("n_tokens"), col("bin"), col("offset"),
          col("piece_len"), col("token_start"))
        .orderBy("doc_id", "bin")),

    "decontaminate" -> ((s, dir) => {
      // Train/eval leak scan: docs < 300 are the "corpus", docs 400-429
      // the "benchmark"; per-doc count of shared distinct word 3-grams
      // (IntHash-hashed — identical hash space in the oracle).
      val docs = table(s, dir, "documents")
      Dedup.decontaminate(
          docs.where(col("doc_id") < 300), "doc_id", "text",
          docs.where(col("doc_id") >= 400 && col("doc_id") < 430), "text", n = 3)
        .orderBy("doc_id")
    }),

    "text_repetition" -> ((s, dir) => {
      // Gopher-style repetition stats. The corpus is single-line word
      // soup, so the query synthesizes a 3-line layout with a REAL
      // duplicate line on every doc_id % 3 == 0 (both engines build the
      // identical string).
      val l1 = substring(col("text"), 1, 40)
      val l2 = substring(col("text"), 41, 40)
      val l3 = when(col("doc_id") % 3 === 0, l1).otherwise(substring(col("text"), 81, 40))
      val text2 = concat_ws("\n", l1, l2, l3)
      table(s, dir, "documents").where(col("doc_id") < 150)
        .select(col("doc_id"), TextOps.repetitionStats(text2).as("r"))
        .select(col("doc_id"),
          round(col("r.dup_line_ratio"), 4).as("dup_line_ratio"),
          round(col("r.top_word_ratio"), 4).as("top_word_ratio"),
          round(col("r.dup_2gram_ratio"), 4).as("dup_2gram_ratio"))
        .orderBy("doc_id")
    }),

    "text_pii_redact" -> ((s, dir) => {
      // Inject deterministic PII (emails / urls / long ids) and pin BOTH
      // the pre-redaction hit counts and the md5 of the redacted text.
      val d = col("doc_id")
      val text2 = concat(col("text"),
        when(d % 3 === 0, concat(lit(" contact user"), d, lit("@example.com now"))).otherwise(lit("")),
        when(d % 4 === 0, concat(lit(" see https://ex.org/p/"), d, lit(" ok"))).otherwise(lit("")),
        when(d % 5 === 0, concat(lit(" id 12345678"), d)).otherwise(lit("")))
      table(s, dir, "documents").where(d < 100)
        .select(col("doc_id"), TextOps.piiCounts(text2).as("c"),
          md5(TextOps.redactPii(text2)).as("redacted_md5"))
        .select(col("doc_id"), col("c.n_emails").as("n_emails"),
          col("c.n_urls").as("n_urls"), col("c.n_longnums").as("n_longnums"),
          col("redacted_md5"))
        .orderBy("doc_id")
    }),

    "text_bm25_topk" -> ((s, dir) =>
      // Okapi BM25 keyword retrieval: three literal queries over the
      // first 200 docs; corpus stats (N, avgdl) are fixed by the same
      // doc_id filter so both engines agree on the collection.
      Retrieval.bm25TopK(
          table(s, dir, "documents").where(col("doc_id") < 200), "doc_id",
          col("text"),
          queries = Seq("q1" -> "spark join merge",
            "q2" -> "window sort batch stream", "q3" -> "customer the data"),
          k = 10)
        .select(col("qid"), col("doc_id"),
          round(col("score"), 4).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")),

    "retrieval_rm3" -> ((s, dir) =>
      // RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; Abdul-
      // Jaleel 2004): BM25 top-5 feedback docs → 8 expansion terms →
      // interpolated weighted rescore. Same corpus/queries as
      // text_bm25_topk; every model face 9-dp-rounded for the replay.
      Retrieval.rm3TopK(
          table(s, dir, "documents").where(col("doc_id") < 200), "doc_id",
          col("text"),
          queries = Seq("q1" -> "spark join merge",
            "q2" -> "window sort batch stream", "q3" -> "customer the data"),
          k = 10, fbDocs = 5, fbTerms = 8, lambda = 0.5)
        .select(col("qid"), col("doc_id"),
          round(col("score"), 4).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")),

    "retrieval_ql" -> ((s, dir) =>
      // Dirichlet query-likelihood (Zhai & Lafferty 2004) — the other
      // canonical lexical model; same corpus/queries as text_bm25_topk,
      // mu = 500 (short-doc regime). Decomposed scoring: per-qid
      // constants + matched-postings bonus, no smoothing fan-out.
      Retrieval.qlTopK(
          table(s, dir, "documents").where(col("doc_id") < 200), "doc_id",
          col("text"),
          queries = Seq("q1" -> "spark join merge",
            "q2" -> "window sort batch stream", "q3" -> "customer the data"),
          k = 10, mu = 500.0)
        .select(col("qid"), col("doc_id"),
          round(col("score"), 4).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")),

    "retrieval_rrf" -> ((s, dir) => {
      // Hybrid-retrieval shape: reciprocal-rank fusion of two independent
      // lexical rankings (BM25 and distinct-term coverage) over the same
      // literal queries — the post-retrieval stage is rankings-sized, not
      // corpus-sized.
      val docs = table(s, dir, "documents").where(col("doc_id") < 200)
      val qs = Seq("q1" -> "spark join merge",
        "q2" -> "window sort batch stream", "q3" -> "customer the data")
      val bm = Retrieval.bm25TopK(docs, "doc_id", col("text"), qs, k = 20)
      val cov = Retrieval.coverageTopK(docs, "doc_id", col("text"), qs, k = 20)
      Retrieval.rrfFuse(
          Seq(bm.select("qid", "doc_id", "rank"),
            cov.select("qid", "doc_id", "rank")), "qid", "doc_id", k = 10)
        .select(col("qid"), col("doc_id"),
          round(col("score"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("qid", "rank")
    }),

    "text_bpe_pairs" -> ((s, dir) => {
      // BPE round-1 statistics: adjacent symbol-pair frequencies over
      // the distinct-word table (chars + '</w>' marker), weighted by
      // word frequency — the aggregation every bpeTrain iteration runs,
      // oracled exactly. The iterated merge loop is spec-covered
      // (Sennrich fixture + local==distributed parity in BpeSpec).
      val words = table(s, dir, "documents").where(col("doc_id") < 300)
        .select(explode(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      def syms = concat(split(col("w"), ""), array(lit("</w>")))
      words.select(col("freq"),
          explode(transform(sequence(lit(0), size(syms) - 2),
            i => struct(element_at(syms, i + 1).as("a"),
              element_at(syms, i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(20)
    }),

    "text_tfidf_topk" -> ((s, dir) =>
      // Top-3 TF-IDF terms per doc (smooth idf); N fixed by the doc_id
      // filter so both engines use the same corpus size.
      TextOps.tfIdfTopTerms(
          table(s, dir, "documents").where(col("doc_id") < 80), "doc_id",
          col("text"), k = 3)
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("score"), 4).as("score"), col("rank").cast("long").as("rank"))
        .orderBy("doc_id", "rank")),

    "sample_quota" -> ((s, dir) =>
      // Exact per-language quotas, hash-ranked (nested under rate
      // sampling's determinism guarantees).
      graft.ops.Stats.quotaPerGroup(table(s, dir, "documents"),
          col("doc_id"), col("lang"),
          quota = Map("en" -> 40, "es" -> 25), defaultQuota = 10, seed = 7L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
        .orderBy("lang")),

    "text_url_domains" -> ((s, dir) => {
      // Web-corpus domain capping: synthesize deterministic doc URLs,
      // extract the host with Spark's parse_url, cap each domain at 5
      // docs (the per-domain quota every web-scale curation run applies)
      // — the twin recomputes the host from the synthesis rule and
      // replays the hash-ranked quota.
      val docs = table(s, dir, "documents")
        .withColumn("url", concat(lit("https://site"),
          (col("doc_id") % 37).cast("string"),
          lit(".example.com/p/"), col("doc_id").cast("string")))
        .withColumn("host", expr("parse_url(url, 'HOST')"))
      val kept = graft.ops.Stats.quotaPerGroup(docs, col("doc_id"), col("host"),
        quota = Map.empty, defaultQuota = 5, seed = 7L)
      docs.groupBy("host").agg(count(lit(1)).as("n_docs"))
        .join(kept.groupBy("host")
          .agg(count(lit(1)).as("n_kept"), sum("doc_id").as("kept_sum")), Seq("host"))
        .select(col("host"), col("n_docs"), col("n_kept"),
          col("kept_sum").cast("long").as("kept_sum"))
        .orderBy("host")
    }),

    "mixture_weights" -> ((s, dir) =>
      // Data-mixing weights toward a target language distribution.
      graft.ops.Stats.mixtureWeights(table(s, dir, "documents"), col("lang"),
          Map("en" -> 0.6, "es" -> 0.3, "fr" -> 0.1))
        .select(col("grp"), col("n"),
          round(col("actual_frac"), 6).as("actual_frac"),
          col("target_frac"), round(col("weight"), 6).as("weight"))
        .orderBy("grp")),

    "sample_stratified" -> ((s, dir) =>
      // Deterministic hash sampling by language; content pinned by count +
      // id-sum per kept group.
      graft.ops.Stats.stratifiedSample(table(s, dir, "documents"),
          col("doc_id"), col("lang"),
          rates = Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.1),
          defaultRate = 0.05, seed = 7L)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sum_id"))
        .orderBy("lang")),

    "text_token_stats" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("lang"),
          TextOps.tokenCount(col("text")).as("n_tok"),
          TextOps.subwordCount(col("text")).as("n_sub"),
          TextOps.stopwordRatio(col("text"), TextOps.LangMarkers("en")).as("sw"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_tok"), 4).as("avg_tokens"),
          round(avg("n_sub"), 4).as("avg_subwords"),
          round(avg("sw"), 4).as("avg_stopword_ratio"))
        .orderBy("lang")),

    "text_quality" -> ((s, dir) =>
      table(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "text_readability" -> ((s, dir) =>
      // Flesch/FK difficulty features (Flesch 1948, Kincaid 1975):
      // dictionary-free word/sentence/vowel-group counts, pure row-local
      // projection — the "textbook quality" curation feature family.
      table(s, dir, "documents").where(col("doc_id") < 400)
        .select(col("doc_id"), TextOps.readability(col("text")).as("r"))
        .select(col("doc_id"), col("r.*"))
        .orderBy("doc_id")),

    "dedup_lsh_tune" -> ((s, dir) =>
      // S-curve banding sweep (MMDS §3.4.3): FP/FN areas for every
      // (bands, rows) factorization of a 32-hash signature at t = 0.7 —
      // the table that justifies the deployed 8×4 banding. No data scan;
      // `dir` is unused by design (the sweep is pure math).
      Dedup.lshTune(s, numHashes = 32, threshold = 0.7)),

    "text_script_mix" -> ((s, dir) => {
      // Script routing: the corpus is Latin-script, so deterministic
      // non-Latin tails (Cyrillic / CJK / Greek / digit-heavy) are
      // appended by doc_id residue before the explicit-range counts.
      val tail = when(col("doc_id") % 7 === 0, lit(" Привет мир"))
        .when(col("doc_id") % 7 === 1, lit(" 你好世界"))
        .when(col("doc_id") % 7 === 2, lit(" αβγ δέλτα"))
        .when(col("doc_id") % 7 === 3, lit(" 12345 67890"))
        .otherwise(lit(""))
      table(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          TextOps.scriptMix(concat(col("text"), tail)).as("m"))
        .select(col("doc_id"), col("m.*"))
        .orderBy("doc_id")
    }),

    "text_strip_html" -> ((s, dir) => {
      // HTML strip: docs are wrapped in deterministic markup + the six
      // core entities; the op must drop every tag, decode entities
      // (&amp; last — no double decode), and collapse whitespace.
      val html = concat(lit("<html><body class=\"x\">"), col("text"),
        lit(" &amp;&nbsp;<b>bold</b>&lt;i&gt; &#39;q&quot;</body></html>"))
      table(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), TextOps.stripHtml(html).as("h"))
        .select(col("doc_id"), col("h.n_tags"),
          length(col("h.text_clean")).cast("long").as("clean_len"),
          md5(col("h.text_clean")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    "text_code_fences" -> ((s, dir) => {
      // Code/prose routing: fenced blocks appended for doc_id % 3 == 0,
      // a dangling (unclosed) fence for % 3 == 1 — the dangling fence
      // must NOT count as a block but must raise the flag.
      val tail = when(col("doc_id") % 3 === 0,
          lit("\n```py\nprint(1)\n```\nafter"))
        .when(col("doc_id") % 3 === 1, lit("\n``` dangling"))
        .otherwise(lit(""))
      table(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"),
          TextOps.codeFenceStats(concat(col("text"), tail)).as("c"))
        .select(col("doc_id"), col("c.*"))
        .orderBy("doc_id")
    }),

    "quality_retention_curve" -> ((s, dir) =>
      // Filter-tuning table: docs/tokens surviving quality >= t for a
      // 0.0..0.9 threshold grid (the 6-dp-rounded score keeps boundary
      // comparisons engine-portable).
      Stats.retentionCurve(table(s, dir, "documents"),
          TextOps.qualityScore(col("text")), TextOps.tokenCount(col("text")),
          (0 to 9).map(_ / 10.0))
        .select(col("threshold"), col("n_kept"),
          round(col("frac_docs"), 6).as("frac_docs"), col("tokens_kept"),
          round(col("frac_tokens"), 6).as("frac_tokens"))
        .orderBy("threshold")),

    "text_gopher_rules" -> ((s, dir) => {
      // Gopher rule-suite audit (Rae et al. 2021 App. A): per-rule flags
      // + metrics for doc_id < 200, with a relaxed word-count floor (the
      // synthetic docs are short) so the flag is discriminative.
      val g = TextOps.gopherRules(col("text"), minWords = 12).as("g")
      table(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"), g)
        .select(col("doc_id"), col("g.*"))
        .orderBy("doc_id")
    }),

    "text_token_augment" -> ((s, dir) => {
      // Deterministic augmentation: 15% word dropout + 20% token masking
      // from the portable hash RNG keyed on (doc_id, position) — the
      // R1-R5 exact-replay stance applied to training-text augmentation.
      val a = TextOps.tokenAugment(col("doc_id"), col("text"),
        dropRate = 0.15, maskRate = 0.2, seed = 42L).as("a")
      table(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), a)
        .select(col("doc_id"), col("a.n_tokens"), col("a.n_kept"),
          col("a.n_masked"), md5(col("a.dropped_text")).as("h_dropped"),
          md5(col("a.masked_text")).as("h_masked"))
        .orderBy("doc_id")
    }),

    "text_wordlist_filter" -> ((s, dir) => {
      // C4's bad-words page filter (the stage c4Clean parameterizes out):
      // occurrence count + pass flag against a blocklist; "slow" and
      // "drop" occur in this corpus's vocabulary, "zzz_absent" never does.
      val h = TextOps.wordlistHits(col("text"),
        Seq("slow", "drop", "zzz_absent")).as("h")
      table(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"), h)
        .select(col("doc_id"), col("h.n_hits").cast("long").as("n_hits"),
          col("h.pass"))
        .orderBy("doc_id")
    }),

    "text_canary_scan" -> ((s, dir) => {
      // Secret-sharer canary audit (Carlini 2019): exact-substring
      // occurrence counts per canary; "slow fast" and "table table" occur
      // in this corpus's word soup, "zzz_canary_absent" never does — the
      // audit table must still report the clean canary with zero hits.
      TextOps.canaryScan(table(s, dir, "documents"), col("doc_id"),
          col("text"), Seq("slow fast", "table table", "zzz_canary_absent"))
        .orderBy("canary")
    }),

    "text_oov_rate" -> ((s, dir) => {
      // Tokenizer-vocab coverage: vocab = top-20 corpus tokens (the corpus
      // has 31 distinct words, so the 11 rarest really are OOV), then
      // per-doc OOV count/rate as a row-local InSet projection.
      TextOps.oovRate(table(s, dir, "documents").where(col("doc_id") < 200),
          col("doc_id"), col("text"), vocabSize = 20)
        .orderBy("doc_id")
    }),

    "text_c4_clean" -> ((s, dir) => {
      // C4 line-clean + page filter (Raffel et al. 2020 §2.2) on
      // manufactured multi-line pages: the corpus is single-line word
      // soup, so each page is built from token slices with one designed
      // violation per rule — a short line (< 5 words), a line without
      // terminal punctuation, a javascript-boilerplate line, a
      // lorem-ipsum page (doc_id % 5), and a curly-brace code page
      // (doc_id % 7, which also drops the page below 3 sentences).
      val toks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)
      val l1 = concat(array_join(slice(toks, 1, 6), " "), lit("."))
      val l2 = concat(array_join(slice(toks, 1, 3), " "), lit("!"))
      val l3 = array_join(slice(toks, 7, 6), " ")
      val l4 = lit("Please enable JavaScript to view the comments powered by widgets.")
      val l5 = when(col("doc_id") % 5 === 0,
        lit("Lorem ipsum dolor sit amet consectetur adipiscing elit.")).otherwise(l1)
      val l6 = when(col("doc_id") % 7 === 0, lit("function f() { return 1; }"))
        .otherwise(concat(array_join(slice(toks, 4, 7), " "), lit("?")))
      val page = concat_ws("\n", l1, l2, l3, l4, l5, l6)
      val c = TextOps.c4Clean(page).as("c")
      table(s, dir, "documents").where(col("doc_id") < 150)
        .select(col("doc_id"), c)
        .select(col("doc_id"), col("c.n_lines"), col("c.n_lines_kept"),
          col("c.n_sentences"), col("c.has_lorem_ipsum"),
          col("c.has_curly_brace"), col("c.ok_sentences"), col("c.pass"),
          col("c.cleaned_text"))
        .orderBy("doc_id")
    }),

    "dedup_soft_weights" -> ((s, dir) => {
      // Soft dedup: copies manufactured at three multiplicities (all docs
      // once, evens twice, multiples of 4 thrice) so n_copies ∈ {1,2,3}
      // and the weight column is discriminative. beta = 1 (the
      // exact-IEEE-division regime; other betas are spec-covered).
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val multi = docs
        .unionByName(docs.where(col("doc_id") % 2 === 0)
          .withColumn("doc_id", col("doc_id") + IdShift))
        .unionByName(docs.where(col("doc_id") % 4 === 0)
          .withColumn("doc_id", col("doc_id") + 2 * IdShift))
      Dedup.softDedupWeights(multi, "doc_id", "text")
        .select(col("doc_id"), col("n_copies"), col("sample_weight"))
        .orderBy("doc_id")
    }),

    "corpus_diff" -> ((s, dir) => {
      // Snapshot diff: prev = ids < 300, next = ids 150–449 with every
      // 7th text edited -> all four statuses appear (removed <150,
      // added >=300, changed = 150–299 % 7, else unchanged).
      val docs = table(s, dir, "documents")
      val prev = docs.where(col("doc_id") < 300).select(col("doc_id"), col("text"))
      val next = docs.where(col("doc_id") >= 150 && col("doc_id") < 450)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      Dedup.corpusDiff(prev, next, "doc_id", "text").orderBy("doc_id")
    }),

    "text_lang_id" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn("__toks", TextOps.languageTokens(col("text")))
        .withColumn("lang_pred", TextOps.languageIdFromTokens(col("__toks")))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")),

    "text_vocabulary" -> ((s, dir) =>
      // Corpus vocabulary: top-30 tokens by global frequency with document
      // frequencies (min tf 50; ties broken by token string).
      TextOps.vocabulary(table(s, dir, "documents"), col("doc_id"),
          col("text"), minCount = 50L, topN = 30)
        .orderBy(col("tf").desc, col("token").asc)),

    "dedup_span_flags" -> ((s, dir) => {
      // CCNet-style corpus-duplicated-span profile: 8-token tiles shared
      // by >= 2 docs. Duplication is manufactured by unioning each doc
      // with a copy truncated to its first 40 tokens — the copy's 5 tiles
      // are shared, the original's tail tiles are not, so dup_ratio
      // varies with doc length. Tiles travel as md5 hashes (identical in
      // both engines).
      val docs = table(s, dir, "documents").select("doc_id", "text")
        .where(col("doc_id") < 200)
      val truncated = docs.select(
        (col("doc_id") + IdShift).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 40), " ").as("text"))
      Dedup.duplicateSpans(docs.unionByName(truncated),
          "doc_id", "text", w = 8, minDocs = 2, tileHash = md5(_))
        .select(col("doc_id"), col("n_tiles"), col("n_distinct_tiles"),
          col("n_dup_tiles"), round(col("dup_ratio"), 6).as("dup_ratio"))
        .orderBy("doc_id")
    }),

    "dedup_span_remove" -> ((s, dir) => {
      // Removal companion of dedup_span_flags on the SAME manufactured
      // corpus: cross-doc duplicated 8-token tiles are deleted and the
      // text rebuilt from surviving tiles + the sub-tile tail; compared
      // by md5 of the rebuilt text (whitespace-normalized) + counts.
      val docs = table(s, dir, "documents").select("doc_id", "text")
        .where(col("doc_id") < 200)
      val truncated = docs.select(
        (col("doc_id") + IdShift).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 40), " ").as("text"))
      Dedup.removeDuplicateSpans(docs.unionByName(truncated),
          "doc_id", "text", w = 8, minDocs = 2, tileHash = md5(_))
        .select(col("doc_id"), md5(col("text_clean")).as("clean_md5"),
          col("n_tiles_removed"),
          size(filter(split(trim(col("text_clean")), "\\s+"),
            t => length(t) > 0)).cast("long").as("n_tokens_clean"))
        .orderBy("doc_id")
    }),

    "dedup_substring" -> ((s, dir) => {
      // Cross-doc duplicated substrings at ARBITRARY offsets (Lee et al.
      // 2022 style): stride-1 8-token window hashes + distinct-doc
      // frequency + per-doc island merge. Duplication is manufactured by
      // unioning each doc with a MISALIGNED copy (tokens 4..43 — offset
      // 3, which 8-token tiles can straddle but windows cannot miss).
      // Windows travel as md5 (identical in both engines).
      val docs = table(s, dir, "documents").select("doc_id", "text")
        .where(col("doc_id") < 200)
      val offsetCopy = docs.select(
        (col("doc_id") + IdShift).as("doc_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 4, 40), " ").as("text"))
      Dedup.substringDuplicates(docs.unionByName(offsetCopy),
          "doc_id", "text", w = 8, minDocs = 2, windowHash = md5(_))
        .orderBy("doc_id", "span_start")
    }),

    "dedup_edit_pairs" -> ((s, dir) =>
      // Fuzzy near-dup pairs by edit distance <= 3 over part names —
      // length-banded blocking + exact levenshtein; the twin is the
      // unblocked all-pairs filter, so a green row proves the banding
      // loses nothing.
      Dedup.editDistancePairs(table(s, dir, "part"), col("p_name"), maxDist = 3)
        .withColumn("dist", col("dist").cast("long"))
        .orderBy("name_a", "name_b")),

    "pack_by_group" -> ((s, dir) =>
      // Per-language sequence packing: independent 256-token bin spaces
      // per lang from ONE global prefix sum (group-leading range order +
      // per-group rebase — see TextOps.packSequencesByGroup).
      TextOps.packSequencesByGroup(table(s, dir, "documents"), "lang",
          col("text"), Seq(col("doc_id")), budgetTokens = 256)
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("bin"),
          col("offset"))
        .orderBy("lang", "doc_id")),

    "q_top_coverage" -> ((s, dir) => {
      // Coverage cutoff: per event type, the heaviest users that together
      // carry 50% of the value mass (vocabulary-truncation-by-coverage
      // shape). Runs on the aggregated (type, user) table — the window
      // never sees raw events.
      import org.apache.spark.sql.expressions.Window
      val perUser = table(s, dir, "events")
        .groupBy("event_type", "user_id")
        .agg(sum("value").as("s"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("s").desc, col("user_id").asc)
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy("event_type")
      perUser
        .withColumn("cum", sum("s").over(cum))
        .withColumn("total", sum("s").over(tot))
        .where(col("cum") - col("s") < col("total") * 0.5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_top_users"),
          round(max(col("cum") / col("total")), 6).as("coverage"))
        .orderBy("event_type")
    }),

    "mixture_temperature" -> ((s, dir) =>
      // Multinomial-temperature language rebalancing (T=2 flattens the
      // mix toward uniform): target derived from the data, not supplied.
      graft.ops.Stats.temperatureMixture(table(s, dir, "documents"),
          col("lang"), temperature = 2.0)
        .select(col("grp"), col("n"),
          round(col("actual_frac"), 6).as("actual_frac"),
          round(col("target_frac"), 6).as("target_frac"),
          round(col("weight"), 6).as("weight"))
        .orderBy("grp")),

    "mixture_doremi" -> ((s, dir) =>
      // DoReMi domain reweighting: per-source excess loss (deterministic
      // synthetic proxy/reference losses derived from n_chars) drives 4
      // exponentiated-gradient steps from the uniform mix; the oracle
      // replays the whole trajectory (9-dp rounding at every iterate
      // kills summation-order/exp ulp drift between engines).
      graft.ops.Stats.doremiWeights(
          table(s, dir, "documents")
            .withColumn("loss", (col("n_chars") % 97) / lit(10.0))
            .withColumn("ref_loss", (col("n_chars") % 89) / lit(10.0)),
          col("source"), col("loss"), col("ref_loss"),
          steps = 4, eta = 0.5, smoothing = 0.01)
        .orderBy("domain")),

    "sample_weighted" -> ((s, dir) =>
      // Deterministic weighted sampling (Efraimidis–Spirakis over the
      // engine-portable hash-uniform): 50 docs, inclusion odds ~ n_chars.
      graft.ops.Stats.weightedSample(table(s, dir, "documents"),
          col("doc_id"), col("n_chars"), k = 50, seed = 11L)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "sample_match_dist" -> ((s, dir) =>
      // Distribution-matching rejection sampling: thin the corpus so the
      // language marginal matches a target profile (en-heavy corpus →
      // balanced-ish target; zh is absent from the target so it drops
      // entirely, fr most under-shoots so it is kept whole). The twin
      // recomputes counts → ratios → rates in SQL with the identical
      // double arithmetic and the same hash-uniform keep rule.
      graft.ops.Stats.matchDistribution(table(s, dir, "documents"),
          col("doc_id"), col("lang"),
          target = Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2),
          seed = 31L)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "text_normalize" -> ((s, dir) =>
      // Canonicalization for match keys: md5 of the normalized text pins
      // content; n_chars before/after pins the collapse arithmetic.
      table(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          md5(TextOps.normalizeText(concat(col("text"),
            lit("  X.Y;Z!!  tail   CASE")))).as("norm_md5"),
          length(TextOps.normalizeText(concat(col("text"),
            lit("  X.Y;Z!!  tail   CASE")))).cast("long").as("n_norm"))
        .orderBy("doc_id")),

    "sample_shuffle" -> ((s, dir) =>
      // Deterministic global training order: first 20 docs under the
      // engine-portable hash order (stable across engines/partitionings).
      table(s, dir, "documents")
        .orderBy(TextOps.shuffleKey(col("doc_id"), seed = 23L), col("doc_id"))
        .select("doc_id", "lang")
        .limit(20)),

    "dedup_fuzzy_join" -> ((s, dir) => {
      // Cross-table fuzzy join (entity matching): docs 0-99 vs re-idded
      // docs 50-149 — the 50-doc overlap has Jaccard 1 (identical
      // signatures -> banding recall is deterministic, so the brute-force
      // twin is exact); random word-trigram sets never approach the 0.9
      // threshold.
      val docs = table(s, dir, "documents")
      val left = docs.where(col("doc_id") < 100).select("doc_id", "text")
      val right = docs.where(col("doc_id") >= 50 && col("doc_id") < 150)
        .select((col("doc_id") + 10000).as("rid"), col("text"))
      Dedup.fuzzyJoin(left, "doc_id", "text", right, "rid", "text",
          threshold = 0.9, numShingleWords = 3)
        .select(col("doc_id"), col("rid"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_id", "rid")
    }),

    "dedup_jaro_pairs" -> ((s, dir) =>
      // Prefix-boosted fuzzy name pairs: the native JaroWinkler expression
      // vs DuckDB's jaro_winkler_similarity — an exact cross-engine
      // semantic pin (window, transpositions, 0.7 boost gate, p=0.1).
      Dedup.jaroWinklerPairs(table(s, dir, "part"), col("p_name"),
          minSim = 0.87)
        .select(col("name_a"), col("name_b"), round(col("jw"), 6).as("jw"))
        .orderBy("name_a", "name_b")),

    "graph_triangles" -> ((s, dir) => {
      // Triangle diagnostic over the fuzzy-match graph (levenshtein <= 3
      // on part names): dense-cluster evidence vs hub-star noise.
      val pairs = Dedup.editDistancePairs(table(s, dir, "part"),
        col("p_name"), maxDist = 3)
      Dedup.triangles(pairs, "name_a", "name_b")
        .orderBy("a", "b", "c")
    }),

    "graph_pagerank" -> ((s, dir) => {
      // PageRank (3 iterations, d=0.85, dangling redistribution) over a
      // deterministic 40-node link graph derived from events; the twin
      // unrolls the same iterations in SQL. The edge recipe guarantees
      // v != u and leaves some nodes sink-only, so the dangling-mass
      // path is actually exercised.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          (col("user_id") % 40 + 1 + col("event_id") % 11) % 40 as "v")
        .distinct()
      graft.ops.Graph.pageRank(edges, "u", "v", iterations = 3)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node")
    }),

    "graph_label_prop" -> ((s, dir) => {
      // Deterministic synchronous label propagation (3 rounds, min-label
      // tie-break) over the same 40-node link graph as graph_pagerank —
      // community detection for near-dup cluster labeling. The twin
      // unrolls the 3 rounds; a per-round count + rank window in SQL
      // mirrors the most-frequent-neighbor-label update exactly.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          (col("user_id") % 40 + 1 + col("event_id") % 11) % 40 as "v")
        .distinct()
      graft.ops.Graph.labelPropagation(edges, "u", "v", iterations = 3)
        .orderBy("node")
    }),

    "graph_hits" -> ((s, dir) => {
      // HITS (2 rounds, L1-normalized per round) over the graph_pagerank
      // link graph — authorities vs hubs for link-graph curation. The
      // twin unrolls both rounds; round(…,6) absorbs summation-order ULP.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          (col("user_id") % 40 + 1 + col("event_id") % 11) % 40 as "v")
        .distinct()
      graft.ops.Graph.hits(edges, "u", "v", iterations = 2)
        .select(col("node"), round(col("hub"), 6).as("hub"),
          round(col("auth"), 6).as("auth"))
        .orderBy("node")
    }),

    "graph_kcore" -> ((s, dir) => {
      // 2-core over a chain ∪ 10-cycle ∪ K7 ∪ bridge graph derived from
      // events: the chain and bridge cascade away over 26 synchronized
      // sweeps (each sweep exposes the next chain end), the cycle
      // (deg 2) and clique (deg 6) survive. The twin peels the same
      // sweeps in a recursive CTE with per-iteration degree windows.
      val ev = table(s, dir, "events").where(col("event_id") < 1000)
      val chain = ev.select((col("event_id") % 25).as("u"),
        (col("event_id") % 25 + 1).as("v"))
      val cycle = ev.select((lit(50) + col("event_id") % 10).as("u"),
        (lit(50) + (col("event_id") % 10 + 1) % 10).as("v"))
      val clique = ev.select((lit(100) + col("event_id") % 7).as("u"),
        (lit(100) + col("user_id") % 7).as("v"))
      val bridge = ev.limit(1).select(lit(25L).as("u"), lit(100L).as("v"))
      val edges = chain.unionByName(cycle).unionByName(clique)
        .unionByName(bridge).distinct()
      graft.ops.Graph.kCore(edges, "u", "v", k = 2)
        .orderBy("node")
    }),

    "graph_modularity" -> ((s, dir) => {
      // Newman modularity of the decade partition (node/10 → 4
      // communities) over the graph_pagerank link graph: the edge recipe
      // (v within u+1..u+11 mod 40) keeps most edges inside a decade, so
      // the partition scores visibly above the configuration-model null.
      val edges = table(s, dir, "events").where(col("event_id") < 3000)
        .select((col("user_id") % 40).as("u"),
          (col("user_id") % 40 + 1 + col("event_id") % 11) % 40 as "v")
        .distinct()
      val comm = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node"))).distinct()
        .withColumn("community", floor(col("node") / 10).cast("long"))
      graft.ops.Graph.modularity(edges, "u", "v", comm, "node", "community")
        .select(col("community"), col("n_nodes"), col("internal_edges"),
          col("degree_sum"), round(col("q_contrib"), 6).as("q_contrib"))
        .orderBy("community")
    }),

    "graph_clustering_coef" -> ((s, dir) => {
      // Local clustering coefficient over the graph_kcore fixture
      // (chain ∪ 10-cycle ∪ K7 ∪ bridge): clique interiors hit 1.0, the
      // bridged clique node dips (its bridge edge closes no triangle),
      // the chain/cycle sit at 0 — the per-node cluster-vs-star gauge.
      val ev = table(s, dir, "events").where(col("event_id") < 1000)
      val chain = ev.select((col("event_id") % 25).as("u"),
        (col("event_id") % 25 + 1).as("v"))
      val cycle = ev.select((lit(50) + col("event_id") % 10).as("u"),
        (lit(50) + (col("event_id") % 10 + 1) % 10).as("v"))
      val clique = ev.select((lit(100) + col("event_id") % 7).as("u"),
        (lit(100) + col("user_id") % 7).as("v"))
      val bridge = ev.limit(1).select(lit(25L).as("u"), lit(100L).as("v"))
      val edges = chain.unionByName(cycle).unionByName(clique)
        .unionByName(bridge).distinct()
      graft.ops.Graph.clusteringCoefficient(edges, "u", "v")
        .select(col("node"), col("degree"), col("triangles"),
          round(col("coef"), 6).as("coef"))
        .orderBy("node")
    }),

    "dedup_entity_resolution" -> ((s, dir) => {
      // Entity resolution capstone: fuzzy-match edges (levenshtein <= 2,
      // length-banded) -> connected components -> canonical entity per
      // cluster (min name) with the sorted member list. Composes two
      // independently-oracled ops; the twin re-derives both.
      // ONE distinct-name table feeds the edge generator, the CC node
      // probe and the CC label rejoin (r13; editDistancePairs dedups
      // internally, so handing it the distinct table is identical) —
      // pinned so the corpus is scanned and deduped once, not three times
      val part = table(s, dir, "part")
      val names = part.select(col("p_name").as("name"))
        .where(col("name").isNotNull).distinct().localCheckpoint(false)
      val pairs = Dedup.editDistancePairs(names, col("name"), maxDist = 2)
      Dedup.connectedComponents(names, pairs, "name", "name_a", "name_b")
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          array_join(sort_array(collect_list(col("name"))), ",").as("members"))
        .orderBy("component")
    }),

    "linkage_fellegi_sunter" -> ((s, dir) => {
      // Probabilistic record linkage (Fellegi–Sunter, EM-fitted with NO
      // labels): within-brand candidate pairs over part, three
      // comparison fields (type equality, size ±2, retail price ±10 —
      // thresholds chosen so all 8 γ-patterns occur). 2 EM iterations
      // (the oracle unrolls both with the same 9-dp iterate rounding);
      // output = the 8-pattern table with fitted posterior + weight.
      val p = table(s, dir, "part").where(col("p_partkey") < 300)
      val a = p.select(col("p_partkey").as("id_a"), col("p_brand").as("brand"),
        col("p_type").as("type_a"), col("p_size").as("size_a"),
        col("p_retailprice").as("price_a"))
      val b = p.select(col("p_partkey").as("id_b"), col("p_brand").as("brand_b"),
        col("p_type").as("type_b"), col("p_size").as("size_b"),
        col("p_retailprice").as("price_b"))
      val pairs = a.join(b,
          col("brand") === col("brand_b") && col("id_a") < col("id_b"))
        .select(
          (col("type_a") === col("type_b")).as("g_type"),
          (abs(col("size_a") - col("size_b")) <= 2).as("g_size"),
          (abs(col("price_a") - col("price_b")) <= 10.0).as("g_price"))
      graft.ops.RecordLinkage
        .fellegiSunter(pairs, Seq("g_type", "g_size", "g_price"),
          lambda0 = 0.1, iters = 2)
        .groupBy("g_type", "g_size", "g_price")
        .agg(count(lit(1)).as("n"),
          round(first("match_prob"), 6).as("match_prob"),
          round(first("match_weight"), 4).as("match_weight"))
        .orderBy("g_type", "g_size", "g_price")
    }),

    "sft_flatten" -> ((s, dir) => {
      // Multi-turn dialogue flattening (SFT layout): 50 conversations ×
      // 6 alternating user/assistant turns manufactured from documents;
      // token count exact under the rendering contract.
      val t = table(s, dir, "documents").where(col("doc_id") < 300)
        .select((col("doc_id") % 50).as("conv_id"),
          floor(col("doc_id") / 50).cast("long").as("turn_idx"),
          when(floor(col("doc_id") / 50).cast("long") % 2 === 0, "user")
            .otherwise("assistant").as("role"),
          col("text"))
      graft.ops.Sft.flattenDialogues(t, "conv_id", "turn_idx", "role",
          "text")
        .select(col("conv_id"), col("n_turns"), col("n_tokens"),
          length(col("text")).cast("long").as("text_len"),
          md5(col("text")).as("text_md5"))
        .orderBy("conv_id")
    }),

    "sft_loss_spans" -> ((s, dir) => {
      // Assistant-only loss-mask spans: half-open token intervals per
      // turn inside the flattened text, from one per-conversation
      // running sum.
      val t = table(s, dir, "documents").where(col("doc_id") < 300)
        .select((col("doc_id") % 50).as("conv_id"),
          floor(col("doc_id") / 50).cast("long").as("turn_idx"),
          when(floor(col("doc_id") / 50).cast("long") % 2 === 0, "user")
            .otherwise("assistant").as("role"),
          col("text"))
      graft.ops.Sft.lossSpans(t, "conv_id", "turn_idx", "role", "text")
        .orderBy("conv_id", "turn_idx")
    }),

    "sft_pref_pairs" -> ((s, dir) => {
      // DPO preference-pair construction: responses grouped by
      // prompt_id = doc_id % 40, scored by the 6-dp quality score;
      // chosen/rejected = per-prompt argmax/argmin, margin-gated.
      val t = table(s, dir, "documents").where(col("doc_id") < 400)
        .select((col("doc_id") % 40).as("prompt_id"), col("doc_id"),
          TextOps.qualityScore(col("text")).as("q"))
      graft.ops.Sft.preferencePairs(t, "prompt_id", "doc_id", col("q"),
          minMargin = 0.05)
        .orderBy("prompt_id")
    }),

    "linkage_blocking_quality" -> ((s, dir) => {
      // Blocking audit (Christen 2012 ch. 4): brand-key blocking over
      // part, scored against the (p_type, p_size)-equality truth pairs —
      // RR / PC / PQ from count algebra, pairs never materialized.
      val p = table(s, dir, "part")
      val a = p.select(col("p_partkey").as("id_a"), col("p_type").as("t_a"),
        col("p_size").as("sz_a"))
      val b = p.select(col("p_partkey").as("id_b"), col("p_type").as("t_b"),
        col("p_size").as("sz_b"))
      val truth = a.join(b, col("t_a") === col("t_b")
          && col("sz_a") === col("sz_b") && col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      graft.ops.RecordLinkage.blockingQuality(p, "p_partkey",
        col("p_brand"), truth)
    }),

    "text_lm_score" -> ((s, dir) =>
      // Unigram-LM fluency (perplexity proxy): model trained on the whole
      // corpus, docs < 100 scored.
      TextOps.lmScore(table(s, dir, "documents"), "doc_id", col("text"))
        .where(col("doc_id") < 100)
        .select(col("doc_id"), col("n_tokens"),
          round(col("avg_logp"), 6).as("avg_logp"),
          round(col("ppl"), 4).as("ppl"))
        .orderBy("doc_id")),

    "dedup_paragraph" -> ((s, dir) => {
      // Paragraph-level dedup: the sf docs are single-paragraph, so the
      // fixture manufactures two-paragraph documents deterministically —
      // doc k's text = text(k) + "\n\n" + text(k+1) (last doc gets only
      // its own). Every original text then appears as a paragraph in two
      // consecutive constructed docs; the keeper rule (globally-first
      // (id, pos) occurrence) keeps doc 0 intact, keeps exactly the
      // second paragraph of every middle doc, and empties the last doc.
      val docs = table(s, dir, "documents").select("doc_id", "text")
      val partner = docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("t2"))
      val paired = docs.join(partner, Seq("doc_id"), "left")
        .select(col("doc_id"),
          concat(col("text"), lit("\n\n"), coalesce(col("t2"), lit("")))
            .as("text"))
      Dedup.dedupParagraphs(paired, "doc_id", "text")
        .select(col("doc_id"), col("n_paras"), col("n_kept"),
          md5(col("text_clean")).as("text_md5"))
        .orderBy("doc_id")
    }),

    "mixture_unimax" -> ((s, dir) =>
      // UniMax waterfilling over language sizes (sum of n_chars):
      // budget 160k at 1.5 epochs caps de/fr/es, puts zh/en on the
      // shared waterline (en far below its own cap) — all regimes.
      graft.ops.Stats.unimaxAllocation(table(s, dir, "documents"),
          col("lang"), col("n_chars"), budget = 160000.0, maxEpochs = 1.5)
        .orderBy("grp")),

    "sample_group_split" -> ((s, dir) => {
      // Leakage-safe split: whole SOURCES assigned to train/val/test by
      // the portable hash — no source straddles two splits (the
      // n_sources counts sum to the 20 distinct sources).
      table(s, dir, "documents")
        .withColumn("split", graft.ops.Stats.splitAssign(col("source"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("source")).as("n_sources"))
        .orderBy("split")
    }),

    "sample_token_budget" -> ((s, dir) => {
      // Greedy per-source token-budget fill: longest (n_chars) docs
      // first, ties by doc_id, stop at 800 cumulative tokens inclusive.
      val docs = table(s, dir, "documents")
      TextOps.selectByTokenBudget(docs, "source", col("n_chars"),
          col("doc_id"), col("text"), budgetTokens = 800L)
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("source", "doc_id")
    }),

    "corpus_group_jaccard" -> ((s, dir) => {
      // Corpus-level overlap matrix: pairwise bigram-set Jaccard between
      // sources (bounded doc slice keeps the twin's all-pairs join cheap;
      // bigrams discriminate where the shared tiny vocab makes 1-gram
      // Jaccard degenerate 1.0).
      val docs = table(s, dir, "documents").where(col("doc_id") < 200)
      TextOps.groupJaccard(docs, col("source"), col("text"), n = 2)
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          col("n_inter"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("group_a", "group_b")
    }),

    "text_ppl_buckets" -> ((s, dir) =>
      // CCNet head/middle/tail tiering: terciles fitted on the WHOLE
      // corpus's rounded perplexities, sliced output.
      TextOps.perplexityBuckets(table(s, dir, "documents"), "doc_id",
          col("text"))
        .where(col("doc_id") < 120)
        .select(col("doc_id"), col("n_bigrams"), col("ppl_r").as("ppl"),
          col("ppl_bucket"))
        .orderBy("doc_id")),

    "text_bigram_lm" -> ((s, dir) =>
      // Context-aware fluency: add-1 bigram LM perplexity per doc.
      TextOps.bigramLmScore(table(s, dir, "documents"), "doc_id",
          col("text"))
        .where(col("doc_id") < 100)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"),
          round(col("ppl"), 4).as("ppl"))
        .orderBy("doc_id")),

    "text_url_normalize" -> ((s, dir) => {
      // Canonical URL keys from manufactured messy URLs: mixed-case
      // scheme/host, default vs explicit ports (http:80 strips, :8080
      // and ftp:80 keep), tracking params out of order, fragments, and
      // a non-URL passthrough row every 11th doc.
      val raw = concat(
        when(col("doc_id") % 3 === 0, "HTTP")
          .when(col("doc_id") % 3 === 1, "https").otherwise("ftp"),
        lit("://ExAmple"), (col("doc_id") % 7).cast("string"), lit(".COM"),
        when(col("doc_id") % 4 === 0, ":80")
          .when(col("doc_id") % 4 === 1, ":8080").otherwise(""),
        lit("/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 2 === 0, "?b=2&utm_source=x&a=1")
          .otherwise("?a=1"),
        lit("#frag"))
      val url = when(col("doc_id") % 11 === 0, lit("  not a url  "))
        .otherwise(raw)
      table(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"), TextOps.normalizeUrl(url).as("url"))
        .orderBy("doc_id")
    }),

    "text_extract_links" -> ((s, dir) => {
      // Outlink extraction: manufactured HTML wrappers with absolute,
      // tracking-params, and relative hrefs (plus a quoteless non-match)
      // — (doc_id, pos, url) in document order.
      val html = concat(
        lit("<a href=\"https://ex.org/"), col("lang"), lit("/"),
        (col("doc_id") % 7).cast("string"), lit("?utm_source=t&q=1\">l</a> "),
        col("text"),
        when(col("doc_id") % 3 === 0,
          lit(" <p><a class=\"z\" href=\"/rel/path\">r</a></p>"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" <a href=unquoted>x</a>"))
          .otherwise(lit("")))
      table(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          posexplode(TextOps.extractLinks(html)).as(Seq("pos", "url")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("url"))
        .orderBy("doc_id", "pos")
    }),

    "text_ngram_novelty" -> ((s, dir) =>
      // Memorization/boilerplate signal: share of each doc's distinct
      // trigrams found in no other document.
      TextOps.ngramNovelty(
          table(s, dir, "documents").where(col("doc_id") < 200),
          "doc_id", col("text"), n = 3)
        .select(col("doc_id"), col("n_grams"),
          round(col("novel_ratio"), 6).as("novel_ratio"))
        .orderBy("doc_id")),

    "text_winnowing" -> ((s, dir) =>
      // MOSS winnowing fingerprints (k=3-token grams, window w=4):
      // content-determined minima, so any shared >= w+k-1 = 6-token run
      // is guaranteed a shared fingerprint hash. Portable 31-bit hash ->
      // exact cross-engine replay.
      Dedup.winnowingFingerprints(
          table(s, dir, "documents").where(col("doc_id") < 100),
          "doc_id", "text", k = 3, w = 4)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
        .orderBy("doc_id", "pos")),

    "text_kneser_ney" -> ((s, dir) =>
      // Interpolated Kneser-Ney bigram perplexity (D = 0.75) — the
      // KenLM-family smoothing behind CCNet-class quality filters.
      TextOps.bigramKneserNeyScore(table(s, dir, "documents"), "doc_id",
          col("text"))
        .where(col("doc_id") < 100)
        .select(col("doc_id"), col("n_bigrams"),
          round(col("avg_logp"), 6).as("avg_logp"),
          round(col("ppl"), 4).as("ppl"))
        .orderBy("doc_id")),

    "corpus_report" -> ((s, dir) =>
      // One-call corpus data card: size/token stats, vocab, exact-dup
      // rate, language-mix entropy as a skinny (metric, value) frame.
      TextOps.corpusReport(table(s, dir, "documents"), col("doc_id"),
          col("text"), col("lang"))
        .select(col("metric"), round(col("value"), 4).as("value"))
        .orderBy("metric")),

    "mixture_materialize" -> ((s, dir) =>
      // Physical epoch expansion of mixture weights: src0 upsampled 2.5x
      // (2 copies + hash-Bernoulli(0.5) third), src1 kept, src2 kept with
      // prob 0.25, src3 dropped, all other sources absent -> dropped.
      Stats.materializeMixture(
          table(s, dir, "documents").where(col("doc_id") < 200),
          col("doc_id"), col("source"),
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25, "src3" -> 0.0),
          seed = 13L)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy("doc_id", "copy")),

    "pack_whole" -> ((s, dir) =>
      // Whole-document greedy packing (SFT layout — no truncation): at
      // this corpus size the default chunk covers everything, so the
      // result is the bit-exact GLOBAL sequential greedy, replayed in
      // the twin as a linear recursive CTE.
      TextOps.packSequencesWhole(
          table(s, dir, "documents").where(col("doc_id") < 300),
          "doc_id", col("text"), Seq(col("doc_id")), budgetTokens = 128)
        .select(col("doc_id"), col("n_tokens"), col("bin"), col("offset"))
        .orderBy("doc_id")),

    "corpus_report_incremental" -> ((s, dir) => {
      // The incremental data card: three ingest batches (doc_id % 3),
      // one mergeable snapshot row per (batch, lang), report re-derived
      // from the bounded snapshot table — history never rescanned. The
      // EXACT metrics must equal the whole-corpus numbers (this oracle);
      // the sketch-backed *_est metrics are spec-bounded
      // (CurationStatsSpec) and excluded here.
      val docs = table(s, dir, "documents")
      val snaps = (0 until 3).map(b => TextOps.corpusStatsSnapshot(
          docs.where(pmod(col("doc_id"), lit(3)) === b),
          col("text"), col("lang"), b))
        .reduce(_ unionByName _)
      TextOps.corpusStatsReport(snaps)
        .where(!col("metric").endsWith("_est"))
        .select(col("metric"), round(col("value"), 4).as("value"))
        .orderBy("metric")
    }),

    "quality_classifier" -> ((s, dir) => {
      // FastText-style quality classifier: 2 full-batch GD epochs of
      // logistic regression on hashed bag-of-words (512 IntHash buckets,
      // lr 4.0) against the "looks like English" target, then score via
      // the shipped literal-map projection. The twin replays both epochs
      // closed-form (epoch 1 from sigma(0) = 0.5 exactly; 9-dp weight
      // rounding on both sides kills summation-order ulp drift between
      // epochs).
      val docs = table(s, dir, "documents")
      val y = (col("lang") === "en").cast("int")
      val model = graft.ops.LinearModel.trainTextClassifier(docs, "doc_id",
        col("text"), y, numBuckets = 512, epochs = 2, lr = 4.0)
      docs.select(col("doc_id"), y.as("y"),
          round(graft.ops.LinearModel.scorer(model)(col("text")), 6)
            .as("score"))
        .where(col("doc_id") < 300)
        .orderBy("doc_id")
    }),

    "dsir_weights" -> ((s, dir) =>
      // DSIR importance weights: hashed-bigram log-likelihood ratio of
      // every doc under the English (target) vs non-English (raw)
      // distributions, over 1024 IntHash buckets. Distributions come
      // from the WHOLE corpus; the output is the bounded doc_id < 200
      // slice. High weight = looks like the target corpus; feeds
      // Stats.weightedSample for the resampling step.
      TextOps.dsirWeights(table(s, dir, "documents"), "doc_id", col("text"),
          col("lang") === "en", n = 2, numBuckets = 1024)
        .where(col("doc_id") < 200)
        .select(col("doc_id"), col("n_grams"),
          round(col("weight"), 4).as("weight"))
        .orderBy("doc_id")),
  )

  /** Shared SQL fragment: whitespace tokens of trimmed lower-cased text. */
  private val toksLower = "regexp_split_to_array(lower(trim(text)), '\\s+')"
  private val toks = "regexp_split_to_array(trim(text), '\\s+')"
  private def markerList(lang: String): String =
    TextOps.LangMarkers(lang).map(m => s"'$m'").mkString("[", ",", "]")
  private def swRatio(lang: String): String =
    s"CASE WHEN len($toksLower) > 0 THEN len(list_filter($toksLower, t -> list_contains(${markerList(lang)}, t))) * 1.0 / len($toksLower) ELSE 0.0 END"

  /** SQL twin of [[TextOps.qualityScore]] (6-dp rounded, like the Scala
    * op — the rounding is what makes threshold comparisons on the score
    * engine-portable). Shared by `text_quality` and
    * `quality_retention_curve`. */
  private val qualitySql: String =
    s"""round(
       |  least(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($toks) END / 20.0, 1.0) * 0.4 +
       |  greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
       |    THEN (length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\]^_`{|}~]', '', 'g'))) * 1.0 / length(text)
       |    ELSE 0.0 END) * 4) * 0.2 +
       |  greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
       |    THEN (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text)
       |    ELSE 0.0 END) * 4) * 0.2 +
       |  least(${swRatio("en")} * 5, 1.0) * 0.2, 6)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_paragraph" ->
      s"""WITH paired AS (
         |  SELECT d1.doc_id,
         |         d1.text || chr(10) || chr(10) || coalesce(d2.text, '') AS text
         |  FROM documents d1 LEFT JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
         |paras AS (
         |  SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos,
         |         trim(unnest(l)) AS para
         |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
         |        FROM paired)),
         |np AS (SELECT doc_id, pos, para FROM paras WHERE length(para) > 0),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT doc_id, pos, para,
         |           row_number() OVER (PARTITION BY md5(para)
         |                              ORDER BY doc_id, pos) AS rn
         |    FROM np) t WHERE rn = 1)
         |SELECT p.doc_id, count(*) AS n_paras,
         |  CAST(coalesce(sum(CASE WHEN k.para IS NOT NULL THEN 1 ELSE 0 END), 0)
       AS BIGINT) AS n_kept,
         |  md5(coalesce(string_agg(k.para, chr(10) || chr(10) ORDER BY p.pos),
         |               '')) AS text_md5
         |FROM np p LEFT JOIN kept k ON k.doc_id = p.doc_id AND k.pos = p.pos
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "sample_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, n_chars,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |         ORDER BY n_chars DESC, doc_id
         |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM t)
         |SELECT source, doc_id, n_tokens, cum_tokens FROM c
         |WHERE cum_tokens <= 800 ORDER BY source, doc_id""".stripMargin,

    "corpus_group_jaccard" ->
      s"""WITH tok AS (
         |  SELECT source AS g, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents WHERE doc_id < 200),
         |gt AS (
         |  SELECT DISTINCT g, unnest(list_distinct(list_transform(
         |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]))) AS tok
         |  FROM tok),
         |sz AS (SELECT g, count(*) AS n FROM gt GROUP BY 1),
         |it AS (
         |  SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_inter
         |  FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
         |  GROUP BY 1, 2)
         |SELECT group_a, group_b, sa.n AS n_a, sb.n AS n_b, n_inter,
         |  round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 4) AS jaccard
         |FROM it JOIN sz sa ON sa.g = group_a JOIN sz sb ON sb.g = group_b
         |ORDER BY 1, 2""".stripMargin,

    "text_ppl_buckets" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
         |    '\\s+'), x -> x <> '') AS toks FROM documents),
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM tok),
         |c AS (SELECT bg, count(*) AS cnt FROM bi GROUP BY 1),
         |cw AS (SELECT bg, cnt, split_part(bg, ' ', 1) AS w1 FROM c),
         |p AS (SELECT w1, sum(cnt) AS pcnt FROM cw GROUP BY 1),
         |v AS (SELECT count(DISTINCT u) AS vs FROM
         |        (SELECT unnest(toks) AS u FROM tok)),
         |lp AS (SELECT bg, ln((cnt + 1.0) / (pcnt + vs)) AS logp
         |       FROM cw JOIN p USING (w1) CROSS JOIN v),
         |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |        round(exp(-avg(logp)), 4) AS ppl
         |      FROM bi JOIN lp USING (bg) GROUP BY 1),
         |f AS (SELECT round(quantile_cont(ppl, CAST(1 AS DOUBLE) / 3), 6) AS q1,
         |        round(quantile_cont(ppl, CAST(2 AS DOUBLE) / 3), 6) AS q2
         |      FROM d)
         |SELECT doc_id, n_bigrams, ppl,
         |  CASE (CASE WHEN ppl > q1 THEN 1 ELSE 0 END
         |      + CASE WHEN ppl > q2 THEN 1 ELSE 0 END)
         |    WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END
         |    AS ppl_bucket
         |FROM d CROSS JOIN f WHERE doc_id < 120 ORDER BY doc_id""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
         |    '\\s+'), x -> x <> '') AS toks FROM documents),
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM tok),
         |c AS (SELECT bg, count(*) AS cnt FROM bi GROUP BY 1),
         |cw AS (SELECT bg, cnt, split_part(bg, ' ', 1) AS w1 FROM c),
         |p AS (SELECT w1, sum(cnt) AS pcnt FROM cw GROUP BY 1),
         |v AS (SELECT count(DISTINCT u) AS vs FROM
         |        (SELECT unnest(toks) AS u FROM tok)),
         |lp AS (SELECT bg, ln((cnt + 1.0) / (pcnt + vs)) AS logp
         |       FROM cw JOIN p USING (w1) CROSS JOIN v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(logp), 6) AS avg_logp,
         |  round(exp(-avg(logp)), 4) AS ppl
         |FROM bi JOIN lp USING (bg)
         |WHERE doc_id < 100 GROUP BY 1 ORDER BY 1""".stripMargin,

    // full replay: same fixture CASE construction, same RE2 parse +
    // list_filter/list_sort canonicalization
    "text_url_normalize" ->
      s"""WITH r AS (
         |  SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN '  not a url  ' ELSE
         |    (CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
         |      ELSE 'ftp' END) || '://ExAmple' || (doc_id % 7) || '.COM' ||
         |    (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':8080'
         |      ELSE '' END) || '/p/' || doc_id ||
         |    (CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=x&a=1'
         |      ELSE '?a=1' END) || '#frag' END AS u0
         |  FROM documents WHERE doc_id < 200),
         |s1 AS (SELECT doc_id, trim(u0) AS u,
         |         regexp_replace(trim(u0), '#.*', '') AS nf FROM r),
         |p AS (SELECT doc_id, u,
         |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         |  regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
         |  FROM s1),
         |q AS (SELECT doc_id, u, scheme,
         |  regexp_extract(rest, '^([^/?]*)', 1) AS hostport,
         |  regexp_replace(rest, '^[^/?]*', '') AS afterhost FROM p),
         |w AS (SELECT doc_id, u, scheme, afterhost,
         |  lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
         |  regexp_extract(hostport, ':([0-9]+)$$', 1) AS port FROM q),
         |x AS (SELECT doc_id, u, scheme, host,
         |  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
         |       OR (scheme = 'https' AND port = '443')
         |    THEN '' ELSE ':' || port END AS keepport,
         |  regexp_extract(afterhost, '^([^?]*)', 1) AS pth,
         |  CASE WHEN contains(afterhost, '?')
         |    THEN regexp_replace(afterhost, '^[^?]*\\?', '') ELSE '' END AS qs
         |  FROM w),
         |y AS (SELECT doc_id, u, scheme, host, keepport,
         |  CASE WHEN pth = '' THEN '/' ELSE pth END AS pathn,
         |  array_to_string(list_sort(list_filter(string_split(qs, '&'),
         |    pp -> len(pp) > 0 AND NOT regexp_matches(lower(pp),
         |      '^(utm_[^=]*|fbclid|gclid)='))), '&') AS sq
         |  FROM x)
         |SELECT doc_id, CASE WHEN scheme = '' THEN u
         |  ELSE scheme || '://' || host || keepport || pathn ||
         |    (CASE WHEN sq = '' THEN '' ELSE '?' || sq END) END AS url
         |FROM y ORDER BY doc_id""".stripMargin,

    "text_extract_links" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<a href="https://ex.org/' || lang || '/' || (doc_id % 7) ||
         |      '?utm_source=t&q=1">l</a> ' || text ||
         |    (CASE WHEN doc_id % 3 = 0
         |      THEN ' <p><a class="z" href="/rel/path">r</a></p>' ELSE '' END) ||
         |    (CASE WHEN doc_id % 5 = 0
         |      THEN ' <a href=unquoted>x</a>' ELSE '' END) AS html
         |  FROM documents WHERE doc_id < 200),
         |l AS (SELECT doc_id,
         |        regexp_extract_all(html, 'href="([^"]*)"', 1) AS ls FROM h)
         |SELECT doc_id,
         |  CAST(generate_subscripts(ls, 1) - 1 AS BIGINT) AS pos,
         |  unnest(ls) AS url
         |FROM l ORDER BY doc_id, pos""".stripMargin,

    "text_ngram_novelty" ->
      s"""WITH g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(toks) - 2, 0) + 1),
         |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS gr
         |  FROM (SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
         |          '\\s+'), x -> x <> '') AS toks
         |        FROM documents WHERE doc_id < 200)),
         |f AS (SELECT gr, count(*) AS df FROM g GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novel_ratio
         |FROM g JOIN f USING (gr) GROUP BY 1 ORDER BY 1""".stripMargin,

    // winnowing replay: gram hashes at row level (the quality_classifier
    // unnest pattern), re-assembled ordered per doc, then the same
    // min-of-each-window selection with the rightmost-tie rule
    "text_winnowing" -> {
      val h = graft.ops.IntHash.stringHashSql("wt")
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
         |    '\\s+'), x -> x <> '') AS toks
         |  FROM documents WHERE doc_id < 100),
         |gpos AS (
         |  SELECT doc_id, j,
         |    toks[j] || ' ' || toks[j + 1] || ' ' || toks[j + 2] AS wt
         |  FROM (SELECT doc_id, toks,
         |          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS j
         |        FROM tok)),
         |gho AS (SELECT doc_id, j, ($h) AS gh FROM gpos),
         |ghl AS (SELECT doc_id, list(gh ORDER BY j) AS gh FROM gho GROUP BY 1),
         |picks AS (
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(gh) - 3, 0) + 1),
         |    s -> struct_pack(
         |      pos := s - 1 + list_max(list_transform(range(0, 4),
         |        p -> CASE WHEN gh[s + p] = list_min(gh[s:s+3])
         |             THEN p ELSE -1 END)),
         |      h := list_min(gh[s:s+3])))) AS f
         |  FROM ghl)
         |SELECT DISTINCT doc_id, CAST(f.pos AS BIGINT) AS pos, f.h AS h
         |FROM picks ORDER BY doc_id, pos""".stripMargin
    },

    // KN replay: the distinct-bigram table feeds c(w1·), N1+(w1·),
    // N1+(·w2), N1+(··) exactly as the op derives them
    "text_kneser_ney" ->
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text),
         |    '\\s+'), x -> x <> '') AS toks FROM documents),
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM tok),
         |c AS (SELECT bg, count(*) AS cnt,
         |        split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', -1) AS w2
         |      FROM bi GROUP BY 1),
         |l AS (SELECT w1, sum(cnt) AS c1, count(*) AS nl FROM c GROUP BY 1),
         |r AS (SELECT w2, count(*) AS nr FROM c GROUP BY 1),
         |t AS (SELECT count(*) * 1.0 AS n_types FROM c),
         |lp AS (SELECT bg, ln(greatest(cnt - 0.75, 0.0) / c1 +
         |         (0.75 * nl / c1) * (nr / n_types)) AS logp
         |       FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(logp), 6) AS avg_logp,
         |  round(exp(-avg(logp)), 4) AS ppl
         |FROM bi JOIN lp USING (bg)
         |WHERE doc_id < 100 GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact replay: same weight CASE + same hash-Bernoulli for the
    // fractional copy, expanded via range()
    "mixture_materialize" -> {
      val u = graft.ops.Robustness.seededUniformSql("13", Seq("doc_id"))
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
         |      WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.0 ELSE 0.0 END AS w
         |  FROM documents WHERE doc_id < 200),
         |n AS (
         |  SELECT doc_id, source,
         |    CAST(floor(w) AS BIGINT) +
         |    CASE WHEN $u < w - floor(w) THEN 1 ELSE 0 END AS n_copies
         |  FROM d)
         |SELECT doc_id, source, unnest(range(0, n_copies)) AS copy
         |FROM n WHERE n_copies > 0 ORDER BY doc_id, copy""".stripMargin
    },

    // the greedy recurrence as a linear recursive CTE (state =
    // (bin, fill) walked doc by doc in order)
    "pack_whole" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS nt,
         |    row_number() OVER (ORDER BY doc_id) AS rn
         |  FROM documents WHERE doc_id < 300),
         |g AS (
         |  SELECT rn, doc_id, nt, CAST(0 AS BIGINT) AS bin,
         |    CAST(0 AS BIGINT) AS off, nt AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.rn, d.doc_id, d.nt,
         |    CASE WHEN d.nt > 0 AND g.fill + d.nt > 128 AND g.fill > 0
         |      THEN g.bin + 1 ELSE g.bin END,
         |    CASE WHEN d.nt > 0 AND g.fill + d.nt > 128 AND g.fill > 0
         |      THEN CAST(0 AS BIGINT) ELSE g.fill END,
         |    CASE WHEN d.nt > 0 AND g.fill + d.nt > 128 AND g.fill > 0
         |      THEN d.nt ELSE g.fill + d.nt END
         |  FROM g JOIN d ON d.rn = g.rn + 1)
         |SELECT doc_id, nt AS n_tokens, bin, off AS offset
         |FROM g ORDER BY doc_id""".stripMargin,

    // whole-corpus replay of the EXACT metrics — merging per-batch
    // counters must lose nothing
    "corpus_report_incremental" ->
      s"""WITH t AS (
         |  SELECT text, lang,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS nt,
         |    coalesce(length(text), 0) AS nc
         |  FROM documents),
         |base AS (
         |  SELECT count(*) * 1.0 AS n_docs, sum(nt) * 1.0 AS n_tokens,
         |    sum(nt) * 1.0 / count(*) AS avg_tokens,
         |    sum(nc) * 1.0 / count(*) AS avg_chars,
         |    avg(CASE WHEN nt = 0 THEN 1.0 ELSE 0.0 END) AS empty_rate
         |  FROM t),
         |ent AS (
         |  SELECT sum(-(n * 1.0 / tot) * ln(n * 1.0 / tot)) AS group_entropy
         |  FROM (SELECT n, sum(n) OVER () AS tot
         |        FROM (SELECT lang, count(*) AS n FROM t GROUP BY 1)))
         |SELECT metric, round(value, 4) AS value FROM (
         |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
         |  UNION ALL SELECT 'n_tokens', n_tokens FROM base
         |  UNION ALL SELECT 'avg_tokens', avg_tokens FROM base
         |  UNION ALL SELECT 'avg_chars', avg_chars FROM base
         |  UNION ALL SELECT 'empty_rate', empty_rate FROM base
         |  UNION ALL SELECT 'group_entropy', group_entropy FROM ent)
         |ORDER BY metric""".stripMargin,

    "corpus_report" ->
      s"""WITH t AS (
         |  SELECT text, lang,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
         |      AS BIGINT) AS nt,
         |    md5(text) AS h, coalesce(length(text), 0) AS nc
         |  FROM documents),
         |base AS (
         |  SELECT count(*) * 1.0 AS n_docs, sum(nt) * 1.0 AS n_tokens,
         |    avg(nt) AS avg_tokens, quantile_cont(nt, 0.5) AS p50_tokens,
         |    1.0 - count(DISTINCT h) * 1.0 / count(*) AS exact_dup_rate,
         |    avg(CASE WHEN nt = 0 THEN 1.0 ELSE 0.0 END) AS empty_rate,
         |    avg(nc) AS avg_chars
         |  FROM t),
         |vocab AS (
         |  SELECT count(DISTINCT tok) * 1.0 AS vocab_size FROM (
         |    SELECT unnest(list_filter(
         |      regexp_split_to_array(lower(trim(text)), '\\s+'),
         |      x -> len(x) > 0)) AS tok FROM t)),
         |ent AS (
         |  SELECT sum(-(n * 1.0 / tot) * ln(n * 1.0 / tot)) AS group_entropy
         |  FROM (SELECT n, sum(n) OVER () AS tot
         |        FROM (SELECT lang, count(*) AS n FROM t GROUP BY 1)))
         |SELECT metric, round(value, 4) AS value FROM (
         |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
         |  UNION ALL SELECT 'n_tokens', n_tokens FROM base
         |  UNION ALL SELECT 'avg_tokens', avg_tokens FROM base
         |  UNION ALL SELECT 'p50_tokens', p50_tokens FROM base
         |  UNION ALL SELECT 'exact_dup_rate', exact_dup_rate FROM base
         |  UNION ALL SELECT 'empty_rate', empty_rate FROM base
         |  UNION ALL SELECT 'avg_chars', avg_chars FROM base
         |  UNION ALL SELECT 'vocab_size', vocab_size FROM vocab
         |  UNION ALL SELECT 'group_entropy', group_entropy FROM ent)
         |ORDER BY metric""".stripMargin,

    "quality_classifier" -> {
      val h = graft.ops.IntHash.stringHashSql("tk")
      val LR = "4.0"
      s"""WITH tok AS (
         |  SELECT doc_id, CAST(lang = 'en' AS INT) AS y,
         |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |                t -> len(t) > 0) AS toks
         |  FROM documents),
         |d AS (SELECT doc_id, y, len(toks) AS n FROM tok),
         |nn AS (SELECT count(*) AS nd FROM d),
         |u AS (SELECT doc_id, unnest(toks) AS tk FROM tok),
         |f AS (SELECT u.doc_id, ($h) % 512 AS b, count(*) AS cnt
         |      FROM u GROUP BY 1, 2),
         |fx AS (SELECT f.doc_id, b, cnt * 1.0 / d.n AS x
         |       FROM f JOIN d USING (doc_id)),
         |g1 AS (SELECT b,
         |         round(-($LR * sum((0.5 - y) * x)) / (SELECT nd FROM nn), 9) AS w
         |       FROM fx JOIN d USING (doc_id) GROUP BY b),
         |b1 AS (SELECT round(-($LR * sum(0.5 - y)) / count(*), 9) AS bias FROM d),
         |dot1 AS (SELECT fx.doc_id, sum(fx.x * g1.w) AS dot
         |         FROM fx JOIN g1 USING (b) GROUP BY 1),
         |e2 AS (SELECT d.doc_id, d.y,
         |         1.0 / (1.0 + exp(-((SELECT bias FROM b1)
         |           + coalesce(dot1.dot, 0)))) - d.y AS e
         |       FROM d LEFT JOIN dot1 USING (doc_id)),
         |g2 AS (SELECT fx.b,
         |         round(any_value(g1.w)
         |           - $LR * sum(e2.e * fx.x) / (SELECT nd FROM nn), 9) AS w
         |       FROM fx JOIN e2 USING (doc_id) JOIN g1 ON g1.b = fx.b
         |       GROUP BY fx.b),
         |b2 AS (SELECT round((SELECT bias FROM b1)
         |         - $LR * sum(e) / (SELECT nd FROM nn), 9) AS bias FROM e2),
         |dot2 AS (SELECT fx.doc_id, sum(fx.x * g2.w) AS dot
         |         FROM fx JOIN g2 USING (b) GROUP BY 1)
         |SELECT d.doc_id, d.y,
         |  round(1.0 / (1.0 + exp(-((SELECT bias FROM b2)
         |    + coalesce(dot2.dot, 0)))), 6) AS score
         |FROM d LEFT JOIN dot2 USING (doc_id)
         |WHERE d.doc_id < 300 ORDER BY d.doc_id""".stripMargin
    },

    "dedup_exact_groups" ->
      s"""WITH doubled AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + $IdShift, text FROM documents)
         |SELECT md5(text) AS dup_hash, count(*) AS n_copies,
         |  min(doc_id) AS keeper_id,
         |  array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
         |FROM doubled GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,

    "dedup_exact_keep" ->
      s"""WITH doubled AS (
         |  SELECT * FROM documents
         |  UNION ALL SELECT doc_id + $IdShift, text, lang, source, n_chars FROM documents),
         |kept AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM doubled) t WHERE rn = 1)
         |SELECT source, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_jaccard_pairs" ->
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct($toks) AS sh
         |  FROM documents WHERE doc_id < 120)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
         |ORDER BY 1, 2""".stripMargin,

    // brute ALL-ordered-pairs twin — the prefix-filter join must find
    // every pair this finds (losslessness certificate)
    "dedup_containment" ->
      s"""WITH base AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents WHERE doc_id < 100),
         |corpus AS (
         |  SELECT doc_id, toks FROM base
         |  UNION ALL
         |  SELECT doc_id + 100000,
         |    toks[1:greatest(2, CAST(floor(len(toks)/3.0) AS INT))]
         |  FROM base WHERE doc_id < 40),
         |docs AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS sh
         |  FROM corpus WHERE len(toks) >= 2)
         |SELECT id_a, id_b, round(c, 4) AS containment FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh) AS c
         |  FROM docs a JOIN docs b ON a.doc_id <> b.doc_id)
         |WHERE c >= 0.6 ORDER BY 1, 2""".stripMargin,

    // same brute containment twin + the drop rule (bigger wins, ties to
    // lower id), anti-joined
    "dedup_containment_keep" ->
      s"""WITH base AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents WHERE doc_id < 100),
         |corpus AS (
         |  SELECT doc_id, toks FROM base
         |  UNION ALL
         |  SELECT doc_id + 100000,
         |    toks[1:greatest(2, CAST(floor(len(toks)/3.0) AS INT))]
         |  FROM base WHERE doc_id < 40),
         |docs AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS sh
         |  FROM corpus WHERE len(toks) >= 2),
         |dropped AS (
         |  SELECT DISTINCT a.doc_id AS d
         |  FROM docs a JOIN docs b ON a.doc_id <> b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh) >= 0.6
         |    AND (len(b.sh) > len(a.sh)
         |      OR (len(b.sh) = len(a.sh) AND b.doc_id < a.doc_id)))
         |SELECT doc_id FROM corpus
         |WHERE doc_id NOT IN (SELECT d FROM dropped)
         |ORDER BY doc_id""".stripMargin,

    "dedup_split_leakage" ->
      s"""WITH docs AS (
         |  SELECT doc_id, list_distinct($toks) AS sh,
         |    CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'eval' END AS split
         |  FROM documents WHERE doc_id < 120)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  a.split AS split_a, b.split AS split_b,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
         |  AND a.split <> b.split
         |ORDER BY 1, 2""".stripMargin,

    // Exact components via recursive min-reachability: reach(n, comp)
    // holds every (node, component-seed) pair the propagation can see;
    // min(comp) per node is the component id (= min reachable doc_id),
    // exactly what iterative min-label propagation converges to.
    "dedup_cc_clusters" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, list_distinct($toks) AS sh
         |  FROM documents WHERE doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(n, comp) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.n)
         |SELECT n AS doc_id, min(comp) AS component
         |FROM reach GROUP BY n ORDER BY doc_id""".stripMargin,

    "dedup_keep_best" ->
      s"""WITH RECURSIVE docs AS (
         |  SELECT doc_id, list_distinct($toks) AS sh
         |  FROM documents WHERE doc_id < 120),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.9),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(n, comp) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.n),
         |cc AS (SELECT n AS doc_id, min(comp) AS component
         |       FROM reach GROUP BY n),
         |q AS (SELECT d.doc_id, cc.component, $qualitySql AS quality
         |      FROM documents d JOIN cc ON d.doc_id = cc.doc_id),
         |r AS (SELECT doc_id, component, quality, row_number() OVER (
         |        PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
         |      FROM q)
         |SELECT doc_id, component, quality FROM r
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "text_regex_extract" ->
      """SELECT m, count(*) AS n FROM (
        |  SELECT unnest(regexp_extract_all(text, '[aeiou][a-z]{3}')) AS m
        |  FROM documents WHERE doc_id < 150)
        |GROUP BY 1 ORDER BY n DESC, m LIMIT 20""".stripMargin,

    // rt CAST early: the window sum is HUGEINT in DuckDB, and every
    // derived column would inherit it (the round-3 dtype-drift lesson).
    "pack_split" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rt
         |  FROM t),
         |p AS (SELECT doc_id, n_tokens, rt, rt - n_tokens AS st FROM c),
         |x AS (
         |  SELECT p.*, u.b AS bin
         |  FROM p, LATERAL unnest(range(CAST(floor(st / 256.0) AS BIGINT),
         |    CAST(floor(greatest(rt - 1, st) / 256.0) AS BIGINT) + 1)) AS u(b))
         |SELECT doc_id, n_tokens, bin,
         |  greatest(bin * 256, st) - bin * 256 AS "offset",
         |  least((bin + 1) * 256, rt) - greatest(bin * 256, st) AS piece_len,
         |  greatest(bin * 256, st) - st AS token_start
         |FROM x ORDER BY doc_id, bin""".stripMargin,

    "pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS prev
         |  FROM t)
         |SELECT doc_id, n_tokens,
         |  CAST(floor(prev / 256.0) AS BIGINT) AS bin,
         |  CAST(prev % 256 AS BIGINT) AS "offset"
         |FROM c ORDER BY doc_id""".stripMargin,

    "text_zipf_fit" ->
      s"""WITH t AS (
         |  SELECT unnest(list_filter($toks, x -> x <> '')) AS token
         |  FROM documents),
         |v AS (SELECT token, count(*) AS tf FROM t GROUP BY 1
         |      ORDER BY tf DESC, token ASC LIMIT 100),
         |pts AS (
         |  SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS DOUBLE)) AS x,
         |         ln(CAST(tf AS DOUBLE)) AS y
         |  FROM v),
         |m AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my FROM pts),
         |s AS (SELECT sum((x - mx) * (y - my)) AS sxy,
         |             sum((x - mx) * (x - mx)) AS sxx,
         |             sum((y - my) * (y - my)) AS syy
         |      FROM pts CROSS JOIN m)
         |SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_ranks,
         |       round(sxy / sxx, 6) AS slope,
         |       round((SELECT my FROM m) - sxy / sxx * (SELECT mx FROM m), 6) AS intercept,
         |       round(sxy * sxy / (sxx * syy), 6) AS r2
         |FROM s""".stripMargin,

    "text_chao1" ->
      s"""WITH tok AS (
         |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $toks END AS toks
         |  FROM documents),
         |v AS (SELECT t, count(*) AS c FROM (SELECT unnest(toks) AS t FROM tok)
         |      GROUP BY 1),
         |s AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
         |             count(*) FILTER (c = 1) AS f1,
         |             count(*) FILTER (c = 2) AS f2 FROM v)
         |SELECT n_tokens, CAST(vocab AS BIGINT) AS vocab,
         |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
         |  round(vocab + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1)), 4) AS v_chao1,
         |  round(CAST(f1 AS DOUBLE) / n_tokens, 6) AS p_unseen
         |FROM s""".stripMargin,

    "text_heaps_fit" ->
      s"""WITH b AS (SELECT CAST(min(doc_id) AS BIGINT) AS lo,
         |                  CAST(max(doc_id) AS BIGINT) AS hi FROM documents),
         |ck AS (SELECT lo + ((hi - lo) * c + 9) // 10 AS thr
         |       FROM b, (SELECT unnest(range(1, 11)) AS c)),
         |tok AS (SELECT doc_id, unnest(list_filter($toks, x -> x <> '')) AS token
         |        FROM documents),
         |fs AS (SELECT token, min(doc_id) AS first_id FROM tok GROUP BY 1),
         |dc AS (SELECT doc_id, CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |         ELSE len($toks) END AS BIGINT) AS n FROM documents),
         |pts AS (
         |  SELECT ln(CAST((SELECT sum(n) FROM dc WHERE doc_id <= ck.thr) AS DOUBLE)) AS x,
         |         ln(CAST((SELECT count(*) FROM fs WHERE first_id <= ck.thr) AS DOUBLE)) AS y
         |  FROM ck),
         |m AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my FROM pts),
         |s AS (SELECT sum((x - mx) * (y - my)) AS sxy,
         |             sum((x - mx) * (x - mx)) AS sxx,
         |             sum((y - my) * (y - my)) AS syy
         |      FROM pts CROSS JOIN m)
         |SELECT (SELECT CAST(n AS BIGINT) FROM m) AS n_checkpoints,
         |       round(sxy / sxx, 6) AS beta,
         |       round((SELECT my FROM m) - sxy / sxx * (SELECT mx FROM m), 6) AS ln_k,
         |       round(sxy * sxy / (sxx * syy), 6) AS r2
         |FROM s""".stripMargin,

    "text_pmi_pairs" ->
      s"""WITH tok AS (
         |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $toks END AS toks
         |  FROM documents),
         |uni AS (SELECT t, count(*) AS c FROM (SELECT unnest(toks) AS t FROM tok)
         |        GROUP BY 1),
         |bi AS (SELECT g, count(*) AS n_pair FROM (
         |         SELECT unnest(list_transform(range(1, len(toks)),
         |           i -> toks[i] || ' ' || toks[i + 1])) AS g FROM tok)
         |       GROUP BY 1),
         |tot AS (SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM bi) AS t,
         |               (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS u),
         |j AS (
         |  SELECT string_split(g, ' ')[1] AS token_a,
         |         string_split(g, ' ')[2] AS token_b, n_pair
         |  FROM bi WHERE n_pair >= 30),
         |scored AS (
         |  SELECT token_a, token_b, n_pair,
         |    ln((n_pair / tot.t) / ((ca.c / tot.u) * (cb.c / tot.u))) AS pmi_raw
         |  FROM j JOIN uni ca ON ca.t = j.token_a
         |         JOIN uni cb ON cb.t = j.token_b CROSS JOIN tot)
         |SELECT token_a, token_b, n_pair, round(pmi_raw, 6) AS pmi
         |FROM scored
         |ORDER BY pmi_raw DESC, token_a ASC, token_b ASC LIMIT 20""".stripMargin,

    "text_distinct_ngrams" -> {
      def stats(src: String) =
        s"""SELECT CAST(count(*) AS BIGINT) AS total_ngrams,
           |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           |  round(CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS distinct_ratio
           |FROM $src""".stripMargin
      s"""WITH tok AS (
         |  SELECT CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $toks END AS toks
         |  FROM documents),
         |g1 AS (SELECT unnest(toks) AS g FROM tok),
         |g2 AS (SELECT unnest(list_transform(range(1, len(toks)),
         |         i -> toks[i] || ' ' || toks[i + 1])) AS g FROM tok),
         |g3 AS (SELECT unnest(list_transform(range(1, len(toks) - 1),
         |         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g FROM tok)
         |SELECT * FROM (
         |  SELECT CAST(1 AS INTEGER) AS n, * FROM (${stats("g1")})
         |  UNION ALL SELECT CAST(2 AS INTEGER), * FROM (${stats("g2")})
         |  UNION ALL SELECT CAST(3 AS INTEGER), * FROM (${stats("g3")}))
         |ORDER BY n""".stripMargin
    },

    "pack_padding" ->
      s"""WITH t AS (
         |  SELECT CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |    ELSE len($toks) END AS BIGINT) AS n
         |  FROM documents),
         |b AS (
         |  SELECT CAST(CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
         |    WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
         |    WHEN n <= 512 THEN 512 ELSE 1024 END AS BIGINT) AS seq_len, n
         |  FROM t),
         |g AS (
         |  SELECT seq_len, count(*) AS n_docs,
         |         CAST(sum(least(n, seq_len)) AS BIGINT) AS sum_tokens
         |  FROM b GROUP BY 1)
         |SELECT seq_len, n_docs, sum_tokens,
         |       seq_len * n_docs - sum_tokens AS pad_tokens,
         |       round(CAST(sum_tokens AS DOUBLE) / (seq_len * n_docs), 6) AS efficiency
         |FROM g ORDER BY seq_len""".stripMargin,

    "decontaminate" -> {
      val grams = "list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])"
      val h = graft.ops.IntHash.stringHashSql("u.g")
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |cg AS (
         |  SELECT DISTINCT t.doc_id, $h AS h
         |  FROM (SELECT doc_id, $grams AS gs FROM tok WHERE doc_id < 300) t,
         |       UNNEST(t.gs) AS u(g)),
         |bg AS (
         |  SELECT DISTINCT $h AS h
         |  FROM (SELECT $grams AS gs FROM tok
         |        WHERE doc_id >= 400 AND doc_id < 430) t,
         |       UNNEST(t.gs) AS u(g))
         |SELECT cg.doc_id, count(*) AS n_shared_grams
         |FROM cg JOIN bg ON cg.h = bg.h
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "text_repetition" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    concat_ws(chr(10), substr(text, 1, 40), substr(text, 41, 40),
         |      CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40)
         |           ELSE substr(text, 81, 40) END) AS t
         |  FROM documents WHERE doc_id < 150),
         |tk AS (
         |  SELECT doc_id, t, regexp_split_to_array(trim(t), '\\s+') AS toks,
         |    list_filter(string_split(t, chr(10)), l -> len(trim(l)) > 0) AS lines
         |  FROM base),
         |top AS (
         |  SELECT doc_id, max(c) AS top_run FROM (
         |    SELECT tk.doc_id, u.w, count(*) AS c
         |    FROM tk, UNNEST(tk.toks) AS u(w) GROUP BY 1, 2) GROUP BY 1),
         |g AS (
         |  SELECT doc_id,
         |    CASE WHEN len(lines) > 0
         |      THEN 1.0 - len(list_distinct(lines)) * 1.0 / len(lines) ELSE 0.0 END AS dup_line_ratio,
         |    CASE WHEN len(toks) > 1 THEN
         |      1.0 - len(list_distinct(list_transform(range(1, len(toks)),
         |        i -> toks[i] || ' ' || toks[i + 1]))) * 1.0 / (len(toks) - 1)
         |      ELSE 0.0 END AS dup_2gram_ratio,
         |    CASE WHEN len(trim(t)) = 0 THEN 0 ELSE len(toks) END AS n_tok
         |  FROM tk)
         |SELECT g.doc_id, round(dup_line_ratio, 4) AS dup_line_ratio,
         |  round(CASE WHEN n_tok > 0 THEN top.top_run * 1.0 / n_tok ELSE 0.0 END, 4) AS top_word_ratio,
         |  round(dup_2gram_ratio, 4) AS dup_2gram_ratio
         |FROM g JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |    text
         |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
         |    || CASE WHEN doc_id % 4 = 0 THEN ' see https://ex.org/p/' || doc_id || ' ok' ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ' id 12345678' || doc_id ELSE '' END AS t
         |  FROM documents WHERE doc_id < 100)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${TextOps.EmailRe}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${TextOps.UrlRe}')) AS INT) AS n_urls,
         |  CAST(len(regexp_extract_all(t, '${TextOps.LongNumRe}')) AS INT) AS n_longnums,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${TextOps.UrlRe}', '<URL>', 'g'),
         |    '${TextOps.EmailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.LongNumRe}', '<NUM>', 'g')) AS redacted_md5
         |FROM base ORDER BY doc_id""".stripMargin,

    "text_bm25_topk" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT c.doc_id, u.term
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |q(qid, qtext) AS (VALUES ('q1', 'spark join merge'),
         |  ('q2', 'window sort batch stream'), ('q3', 'customer the data')),
         |qt AS (
         |  SELECT DISTINCT qid, u.term
         |  FROM (SELECT qid, regexp_split_to_array(lower(trim(qtext)), '\\s+') AS t
         |        FROM q) x, UNNEST(x.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT qt.qid, tf.doc_id,
         |    sum(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN qt USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, doc_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored)
         |SELECT qid, doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "retrieval_ql" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT c.doc_id, u.term
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks),
         |q(qid, qtext) AS (VALUES ('q1', 'spark join merge'),
         |  ('q2', 'window sort batch stream'), ('q3', 'customer the data')),
         |qt AS (
         |  SELECT DISTINCT qid, u.term
         |  FROM (SELECT qid, regexp_split_to_array(lower(trim(qtext)), '\\s+') AS t
         |        FROM q) x, UNNEST(x.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
         |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
         |mup AS (SELECT term, 500.0 * (CAST(cf AS DOUBLE) / t.total) AS mup
         |        FROM cf CROSS JOIN tot t),
         |aq AS (SELECT qid, sum(ln(mup)) AS aq, count(*) AS mq
         |       FROM qt JOIN mup USING (term) GROUP BY 1),
         |bonus AS (
         |  SELECT qt.qid, tf.doc_id, dl.dl,
         |    sum(ln(tf.tf + mup.mup) - ln(mup.mup)) AS bonus
         |  FROM tf JOIN mup USING (term) JOIN qt USING (term)
         |    JOIN dl USING (doc_id)
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT b.qid, b.doc_id,
         |    a.aq + b.bonus - a.mq * ln(b.dl + 500.0) AS score
         |  FROM bonus b JOIN aq a USING (qid)),
         |ranked AS (
         |  SELECT qid, doc_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored)
         |SELECT qid, doc_id, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "text_entropy" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |toks AS (
         |  SELECT c.doc_id, u.term
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |tc AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
         |h AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    count(*) AS n_distinct,
         |    ln(CAST(sum(c) AS DOUBLE))
         |      - sum(c * ln(c)) / CAST(sum(c) AS DOUBLE) AS h
         |  FROM tc GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct, round(h, 6) AS entropy,
         |  CASE WHEN n_distinct > 1
         |    THEN round(h / ln(CAST(n_distinct AS DOUBLE)), 6)
         |    ELSE 0.0 END AS entropy_norm
         |FROM h ORDER BY doc_id""".stripMargin,

    "pack_length_sorted" ->
      s"""WITH corpus AS (SELECT doc_id, lang, text FROM documents WHERE doc_id < 400),
         |t AS (
         |  SELECT doc_id, lang,
         |    CAST(CASE WHEN text IS NULL OR len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
         |      AS n_tokens
         |  FROM corpus),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang
         |    ORDER BY n_tokens DESC, doc_id ASC) AS rn FROM t),
         |b AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(floor((rn - 1) / 8) AS BIGINT) AS batch_id FROM r),
         |p AS (
         |  SELECT *, max(n_tokens) OVER (PARTITION BY lang, batch_id) AS pad_to
         |  FROM b)
         |SELECT doc_id, lang, n_tokens, batch_id, pad_to,
         |  pad_to - n_tokens AS pad_tokens
         |FROM p ORDER BY doc_id""".stripMargin,

    "retrieval_rm3" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT c.doc_id, u.term
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |q(qid, qtext) AS (VALUES ('q1', 'spark join merge'),
         |  ('q2', 'window sort batch stream'), ('q3', 'customer the data')),
         |qt AS (
         |  SELECT DISTINCT qid, u.term
         |  FROM (SELECT qid, regexp_split_to_array(lower(trim(qtext)), '\\s+') AS t
         |        FROM q) x, UNNEST(x.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT qt.qid, tf.doc_id,
         |    sum(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN qt USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, doc_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored),
         |fb AS (SELECT qid, doc_id, score FROM ranked WHERE rank <= 5),
         |pd AS (SELECT qid, doc_id,
         |    round(score / sum(score) OVER (PARTITION BY qid), 9) AS pd
         |  FROM fb),
         |rm1 AS (
         |  SELECT qid, term, round(sum(w), 9) AS rm1 FROM (
         |    SELECT p.qid, p.doc_id, t.term,
         |      CAST(count(*) AS DOUBLE) / min(d.dl) * min(p.pd) AS w
         |    FROM pd p JOIN toks t ON t.doc_id = p.doc_id
         |      JOIN dl d ON d.doc_id = p.doc_id
         |    GROUP BY 1, 2, 3)
         |  GROUP BY 1, 2),
         |topt AS (SELECT qid, term, rm1 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY rm1 DESC, term) AS r FROM rm1) WHERE r <= 8),
         |qn AS (SELECT qid, count(*) AS nq FROM qt GROUP BY 1),
         |orig AS (SELECT qt.qid, qt.term, 1.0 / qn.nq AS o
         |         FROM qt JOIN qn USING (qid)),
         |ex AS (
         |  SELECT coalesce(t.qid, o.qid) AS qid,
         |    coalesce(t.term, o.term) AS term,
         |    round(coalesce(o.o, 0.0) * 0.5 + coalesce(t.rm1, 0.0) * 0.5, 9) AS wq
         |  FROM topt t FULL OUTER JOIN orig o
         |    ON t.qid = o.qid AND t.term = o.term),
         |exf AS (SELECT * FROM ex WHERE wq > 0),
         |tf2 AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (SELECT DISTINCT term FROM exf) GROUP BY 1, 2),
         |dfq2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY 1),
         |scored2 AS (
         |  SELECT e.qid, tf2.doc_id,
         |    sum(e.wq * ln(1 + (s.n_docs - dfq2.df + 0.5) / (dfq2.df + 0.5))
         |      * tf2.tf * 2.2 / (tf2.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
         |  FROM tf2 JOIN dfq2 USING (term) JOIN exf e USING (term)
         |    JOIN dl ON dl.doc_id = tf2.doc_id CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |ranked2 AS (
         |  SELECT qid, doc_id, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id ASC) AS rank
         |  FROM scored2)
         |SELECT qid, doc_id, round(score, 4) AS score,
         |  CAST(rank AS BIGINT) AS rank
         |FROM ranked2 WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "retrieval_rrf" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT c.doc_id, u.term
         |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |q(qid, qtext) AS (VALUES ('q1', 'spark join merge'),
         |  ('q2', 'window sort batch stream'), ('q3', 'customer the data')),
         |qt AS (
         |  SELECT DISTINCT qid, u.term
         |  FROM (SELECT qid, regexp_split_to_array(lower(trim(qtext)), '\\s+') AS t
         |        FROM q) x, UNNEST(x.t) AS u(term)
         |  WHERE len(u.term) > 0),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT qt.qid, tf.doc_id,
         |    sum(ln(1 + (s.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         |      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
         |  FROM tf JOIN dfq USING (term) JOIN qt USING (term)
         |    JOIN dl USING (doc_id) CROSS JOIN stats s
         |  GROUP BY 1, 2),
         |bmk AS (
         |  SELECT * FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
         |  WHERE rank <= 20),
         |covscore AS (
         |  SELECT qt.qid, td.doc_id, count(*) AS n_terms
         |  FROM (SELECT DISTINCT doc_id, term FROM toks
         |        WHERE term IN (SELECT term FROM qt)) td
         |  JOIN qt USING (term) GROUP BY 1, 2),
         |covk AS (
         |  SELECT * FROM (
         |    SELECT qid, doc_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY n_terms DESC, doc_id ASC) AS rank FROM covscore)
         |  WHERE rank <= 20),
         |unioned AS (
         |  SELECT qid, doc_id, 1.0 / (60 + rank) AS c FROM bmk
         |  UNION ALL SELECT qid, doc_id, 1.0 / (60 + rank) FROM covk),
         |fused AS (SELECT qid, doc_id, sum(c) AS score FROM unioned GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, doc_id, score, row_number() OVER (PARTITION BY qid
         |    ORDER BY score DESC, doc_id ASC) AS rank FROM fused)
         |SELECT qid, doc_id, round(score, 6) AS score, rank
         |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,

    "text_bpe_pairs" ->
      s"""WITH corpus AS (SELECT text FROM documents WHERE doc_id < 300),
         |words AS (
         |  SELECT u.w, count(*) AS freq
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
         |        FROM corpus) c, UNNEST(c.t) AS u(w)
         |  WHERE len(u.w) > 0 GROUP BY 1),
         |syms AS (
         |  SELECT freq, list_concat(
         |    list_transform(range(1, length(w) + 1), i -> w[i]), ['</w>']) AS s
         |  FROM words),
         |pairs AS (
         |  SELECT y.s[CAST(p.range AS INT)] AS a,
         |    y.s[CAST(p.range AS INT) + 1] AS b, y.freq
         |  FROM syms y JOIN range(1, 200) p ON p.range <= len(y.s) - 1)
         |SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
         |FROM pairs GROUP BY 1, 2
         |ORDER BY n DESC, a ASC, b ASC LIMIT 20""".stripMargin,

    "text_tfidf_topk" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
         |n AS (SELECT count(*) AS n_docs FROM corpus),
         |tc AS (
         |  SELECT c.doc_id, u.term, count(*) AS tf
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |        FROM corpus) c, UNNEST(c.toks) AS u(term)
         |  WHERE len(u.term) > 0
         |  GROUP BY 1, 2),
         |dfq AS (
         |  SELECT term, ln((1.0 + n_docs) / (1.0 + count(*))) + 1.0 AS idf
         |  FROM tc, n GROUP BY term, n_docs),
         |ranked AS (
         |  SELECT tc.doc_id, tc.term, tc.tf, tc.tf * dfq.idf AS score,
         |    row_number() OVER (PARTITION BY tc.doc_id
         |      ORDER BY tc.tf * dfq.idf DESC, tc.term ASC) AS rank
         |  FROM tc JOIN dfq USING (term))
         |SELECT doc_id, term, tf, round(score, 4) AS score, rank
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "text_url_domains" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    'site' || CAST(doc_id % 37 AS VARCHAR) || '.example.com' AS host
         |  FROM documents),
         |ranked AS (
         |  SELECT host, doc_id,
         |    row_number() OVER (PARTITION BY host
         |      ORDER BY ${graft.ops.Robustness.seededUniformSql("7", Seq("doc_id"))} ASC,
         |               doc_id ASC) AS rk
         |  FROM d),
         |k AS (SELECT host, count(*) AS n_kept,
         |        CAST(sum(doc_id) AS BIGINT) AS kept_sum
         |      FROM ranked WHERE rk <= 5 GROUP BY 1),
         |a AS (SELECT host, count(*) AS n_docs FROM d GROUP BY 1)
         |SELECT a.host, a.n_docs, k.n_kept, k.kept_sum
         |FROM a JOIN k USING (host) ORDER BY host""".stripMargin,

    "sample_quota" ->
      s"""WITH ranked AS (
         |  SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${graft.ops.Robustness.seededUniformSql("7", Seq("doc_id"))} ASC,
         |               doc_id ASC) AS rk
         |  FROM documents)
         |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id FROM ranked
         |WHERE rk <= CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 25 ELSE 10 END
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mixture_weights" ->
      s"""WITH c AS (SELECT CAST(lang AS VARCHAR) AS grp, count(*) AS n
         |           FROM documents GROUP BY 1),
         |t AS (SELECT sum(n) AS total FROM c)
         |SELECT grp, n, round(n * 1.0 / total, 6) AS actual_frac,
         |  CAST(CASE grp WHEN 'en' THEN 0.6 WHEN 'es' THEN 0.3 WHEN 'fr' THEN 0.1
         |    ELSE 0.0 END AS DOUBLE) AS target_frac,
         |  round((CASE grp WHEN 'en' THEN 0.6 WHEN 'es' THEN 0.3 WHEN 'fr' THEN 0.1
         |    ELSE 0.0 END) / (n * 1.0 / total), 6) AS weight
         |FROM c, t ORDER BY grp""".stripMargin,

    "mixture_unimax" ->
      s"""WITH sizes AS (
         |  SELECT CAST(lang AS VARCHAR) AS grp,
         |    CAST(sum(n_chars) AS BIGINT) AS size,
         |    CAST(sum(n_chars) AS DOUBLE) * 1.5 AS capacity
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT grp, size, capacity,
         |    row_number() OVER asc_w AS i,
         |    count(*) OVER () AS k,
         |    coalesce(sum(capacity) OVER (asc_w
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
         |      AS cum_before
         |  FROM sizes
         |  WINDOW asc_w AS (ORDER BY capacity ASC, grp ASC)),
         |l AS (
         |  SELECT w.*, (160000.0 - cum_before) / (k - i + 1) AS lambda
         |  FROM w),
         |f AS (
         |  SELECT min(CASE WHEN lambda <= capacity THEN i END) AS first_i
         |  FROM l),
         |wl AS (
         |  SELECT max(CASE WHEN l.i = f.first_i THEN l.lambda END) AS waterline
         |  FROM l CROSS JOIN f)
         |SELECT grp, size, capacity,
         |  round(CASE WHEN f.first_i IS NULL OR l.i < f.first_i
         |    THEN capacity ELSE wl.waterline END, 6) AS allocation,
         |  round(round(CASE WHEN f.first_i IS NULL OR l.i < f.first_i
         |    THEN capacity ELSE wl.waterline END, 6)
         |    / CAST(size AS DOUBLE), 6) AS epochs
         |FROM l CROSS JOIN f CROSS JOIN wl
         |ORDER BY grp""".stripMargin,

    "sample_group_split" -> {
      val splitSql = graft.ops.Stats.splitAssignSql("source",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7L)
      s"""SELECT split, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_sources
         |FROM (SELECT source, $splitSql AS split FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "linkage_fellegi_sunter" -> {
      // Replays BOTH EM iterations from the deterministic start
      // (m = 0.9, u = 0.1, lam = 0.1), rounding every new parameter to
      // 9 dp at exactly the same points as RecordLinkage.fellegiSunterFit
      // (the (1 - x) forms mirror the Scala arithmetic — DO NOT fold
      // them to literals, 1 - 0.1 is a different double than 0.9 in
      // general even though they coincide here).
      def pm(p: String) =
        s"((CASE WHEN g1 THEN $p.m1 ELSE 1 - $p.m1 END) * " +
          s"(CASE WHEN g2 THEN $p.m2 ELSE 1 - $p.m2 END) * " +
          s"(CASE WHEN g3 THEN $p.m3 ELSE 1 - $p.m3 END))"
      def pu(p: String) =
        s"((CASE WHEN g1 THEN $p.u1 ELSE 1 - $p.u1 END) * " +
          s"(CASE WHEN g2 THEN $p.u2 ELSE 1 - $p.u2 END) * " +
          s"(CASE WHEN g3 THEN $p.u3 ELSE 1 - $p.u3 END))"
      def wExpr(p: String) =
        s"$p.lam * ${pm(p)} / ($p.lam * ${pm(p)} + (1 - $p.lam) * ${pu(p)})"
      def mStep(t: Int) =
        s"""p$t AS (
           |  SELECT
           |    round(sum(CASE WHEN g1 THEN w * n ELSE 0 END) / sum(w * n), 9) AS m1,
           |    round(sum(CASE WHEN g2 THEN w * n ELSE 0 END) / sum(w * n), 9) AS m2,
           |    round(sum(CASE WHEN g3 THEN w * n ELSE 0 END) / sum(w * n), 9) AS m3,
           |    round(sum(CASE WHEN g1 THEN (1 - w) * n ELSE 0 END) / sum((1 - w) * n), 9) AS u1,
           |    round(sum(CASE WHEN g2 THEN (1 - w) * n ELSE 0 END) / sum((1 - w) * n), 9) AS u2,
           |    round(sum(CASE WHEN g3 THEN (1 - w) * n ELSE 0 END) / sum((1 - w) * n), 9) AS u3,
           |    round(sum(w * n) / sum(n), 9) AS lam
           |  FROM w$t)""".stripMargin
      s"""WITH p AS (
         |  SELECT p_partkey AS id, p_brand AS brand, p_type AS type,
         |    p_size AS size, p_retailprice AS price
         |  FROM part WHERE p_partkey < 300),
         |pr AS (
         |  SELECT (a.type = b.type) AS g1, (abs(a.size - b.size) <= 2) AS g2,
         |    (abs(a.price - b.price) <= 10.0) AS g3
         |  FROM p a JOIN p b ON a.brand = b.brand AND a.id < b.id),
         |pat AS (SELECT g1, g2, g3, CAST(count(*) AS DOUBLE) AS n
         |        FROM pr GROUP BY 1, 2, 3),
         |p0 AS (SELECT CAST(0.9 AS DOUBLE) AS m1, CAST(0.9 AS DOUBLE) AS m2,
         |  CAST(0.9 AS DOUBLE) AS m3, CAST(0.1 AS DOUBLE) AS u1,
         |  CAST(0.1 AS DOUBLE) AS u2, CAST(0.1 AS DOUBLE) AS u3,
         |  CAST(0.1 AS DOUBLE) AS lam),
         |w1 AS (SELECT pat.*, ${wExpr("p")} AS w FROM pat CROSS JOIN p0 p),
         |${mStep(1)},
         |w2 AS (SELECT pat.*, ${wExpr("p")} AS w FROM pat CROSS JOIN p1 p),
         |${mStep(2)}
         |SELECT g1 AS g_type, g2 AS g_size, g3 AS g_price,
         |  CAST(n AS BIGINT) AS n,
         |  round(${wExpr("p")}, 6) AS match_prob,
         |  round(log2(${pm("p")} / ${pu("p")}), 4) AS match_weight
         |FROM pat CROSS JOIN p2 p
         |ORDER BY g_type, g_size, g_price""".stripMargin
    },

    "sft_flatten" ->
      s"""WITH t AS (
         |  SELECT doc_id % 50 AS conv_id,
         |    CAST(floor(doc_id / 50) AS BIGINT) AS turn_idx,
         |    CASE WHEN CAST(floor(doc_id / 50) AS BIGINT) % 2 = 0
         |      THEN 'user' ELSE 'assistant' END AS role, text
         |  FROM documents WHERE doc_id < 300),
         |r AS (
         |  SELECT conv_id, turn_idx,
         |    '<|' || role || '|>' || CASE WHEN len(trim(text)) > 0
         |      THEN ' ' || trim(text) ELSE '' END AS rt,
         |    1 + CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
         |  FROM t),
         |f AS (
         |  SELECT conv_id, string_agg(rt, ' ' ORDER BY turn_idx) AS text,
         |    count(*) AS n_turns, CAST(sum(nt) AS BIGINT) AS n_tokens
         |  FROM r GROUP BY 1)
         |SELECT conv_id, n_turns, n_tokens,
         |  CAST(length(text) AS BIGINT) AS text_len, md5(text) AS text_md5
         |FROM f ORDER BY conv_id""".stripMargin,

    "sft_loss_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id % 50 AS conv_id,
         |    CAST(floor(doc_id / 50) AS BIGINT) AS turn_idx,
         |    CASE WHEN CAST(floor(doc_id / 50) AS BIGINT) % 2 = 0
         |      THEN 'user' ELSE 'assistant' END AS role, text
         |  FROM documents WHERE doc_id < 300),
         |r AS (
         |  SELECT conv_id, turn_idx, role,
         |    '<|' || role || '|>' || CASE WHEN len(trim(text)) > 0
         |      THEN ' ' || trim(text) ELSE '' END AS rt,
         |    1 + CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt
         |  FROM t)
         |SELECT conv_id, turn_idx, role,
         |  CAST(sum(nt) OVER w - nt AS BIGINT) AS token_start,
         |  CAST(sum(nt) OVER w AS BIGINT) AS token_end,
         |  role = 'assistant' AS mask
         |FROM r
         |WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, rt
         |  ROWS UNBOUNDED PRECEDING)
         |ORDER BY conv_id, turn_idx""".stripMargin,

    "sft_pref_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id % 40 AS prompt_id, doc_id, $qualitySql AS q
         |  FROM documents WHERE doc_id < 400),
         |c AS (SELECT prompt_id, doc_id AS chosen_id, q AS cs,
         |    row_number() OVER (PARTITION BY prompt_id
         |      ORDER BY q DESC, doc_id) AS r FROM t),
         |w AS (SELECT prompt_id, doc_id AS rejected_id, q AS ws,
         |    row_number() OVER (PARTITION BY prompt_id
         |      ORDER BY q ASC, doc_id) AS r FROM t)
         |SELECT c.prompt_id, chosen_id, rejected_id,
         |  round(cs - ws, 9) AS margin
         |FROM c JOIN w USING (prompt_id)
         |WHERE c.r = 1 AND w.r = 1 AND chosen_id <> rejected_id
         |  AND round(cs - ws, 9) >= 0.05 AND round(cs - ws, 9) > 0.0
         |ORDER BY prompt_id""".stripMargin,

    "linkage_blocking_quality" ->
      s"""WITH blocks AS (SELECT p_brand AS bk, count(*) AS n FROM part GROUP BY 1),
         |base AS (SELECT CAST(sum(n) AS BIGINT) AS n_records,
         |  count(*) AS n_blocks, CAST(max(n) AS BIGINT) AS max_block,
         |  CAST(sum(n * (n - 1)) // 2 AS BIGINT) AS n_candidates FROM blocks),
         |truth AS (SELECT a.p_brand AS bk_a, b.p_brand AS bk_b
         |  FROM part a JOIN part b ON a.p_type = b.p_type
         |    AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey),
         |ta AS (SELECT count(*) AS n_truth,
         |  CAST(sum(CASE WHEN bk_a = bk_b THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_truth_covered FROM truth)
         |SELECT n_records, n_blocks, max_block, n_candidates,
         |  round(1.0 - CAST(n_candidates AS DOUBLE)
         |    / (CAST(n_records AS DOUBLE) * (n_records - 1) / 2), 6) AS reduction_ratio,
         |  n_truth, n_truth_covered,
         |  round(CAST(n_truth_covered AS DOUBLE) / n_truth, 6) AS pairs_completeness,
         |  round(CAST(n_truth_covered AS DOUBLE) / n_candidates, 6) AS pairs_quality
         |FROM base CROSS JOIN ta""".stripMargin,

    "mixture_doremi" -> {
      // Replays all 4 exponentiated-gradient steps: each step's
      // unnormalized scores in u<t>, the rounded smoothed iterate in
      // s<t>. Must round to 9 dp at exactly the same points as
      // Stats.doremiWeights.
      val steps = 4; val eta = 0.5; val c = 0.01
      val stepCtes = (1 to steps).map { t =>
        s"""u$t AS (SELECT l.domain, s${t - 1}.alpha * exp($eta * l.excess_loss) AS x
           |     FROM lam l JOIN s${t - 1} USING (domain)),
           |s$t AS (SELECT domain, round((1 - $c) * x / (SELECT sum(x) FROM u$t)
           |     + $c / (SELECT k FROM kk), 9) AS alpha FROM u$t)""".stripMargin
      }.mkString(",\n")
      val avgExpr = (1 to steps).map(t => s"s$t.alpha").mkString(" + ")
      val joins = (1 to steps).map(t => s"JOIN s$t USING (domain)").mkString(" ")
      s"""WITH lam AS (
         |  SELECT CAST(source AS VARCHAR) AS domain, count(*) AS n,
         |    round(avg(greatest((n_chars % 97) / 10.0
         |      - (n_chars % 89) / 10.0, 0.0)), 9) AS excess_loss
         |  FROM documents GROUP BY 1),
         |kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM lam),
         |s0 AS (SELECT domain, round(1.0 / (SELECT k FROM kk), 9) AS alpha FROM lam),
         |$stepCtes
         |SELECT lam.domain, lam.n, lam.excess_loss,
         |  s$steps.alpha AS weight_final,
         |  ($avgExpr) / $steps AS weight_avg
         |FROM lam $joins ORDER BY lam.domain""".stripMargin
    },

    "sample_stratified" ->
      s"""SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id
         |FROM documents
         |WHERE ${graft.ops.Robustness.seededUniformSql("7", Seq("doc_id"))} <
         |  CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.1 ELSE 0.05 END
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_token_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  round(avg(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($toks) END), 4) AS avg_tokens,
         |  round(avg(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))), 4) AS avg_subwords,
         |  round(avg(${swRatio("en")}), 4) AS avg_stopword_ratio
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id, $qualitySql AS quality
         |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,

    "text_readability" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      t -> len(t) > 0) AS toks,
         |    len(regexp_extract_all(text, '[.!?]+')) AS runs
         |  FROM documents WHERE doc_id < 400),
         |k AS (
         |  SELECT doc_id, len(toks) AS n_words,
         |    CASE WHEN len(toks) > 0 THEN greatest(1, runs) ELSE 0 END AS n_sentences,
         |    CASE WHEN len(toks) > 0 THEN COALESCE(list_sum(list_transform(toks,
         |      t -> greatest(1, len(regexp_extract_all(lower(t), '[aeiouy]+'))
         |        - CASE WHEN regexp_matches(lower(t), '[^aeiouy]e$$')
         |          THEN 1 ELSE 0 END))), 0) ELSE 0 END AS n_syllables
         |  FROM c)
         |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |  CAST(n_sentences AS BIGINT) AS n_sentences,
         |  CAST(n_syllables AS BIGINT) AS n_syllables,
         |  CASE WHEN n_words > 0 THEN round(206.835
         |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) END AS fre,
         |  CASE WHEN n_words > 0 THEN round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
         |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 4) END AS fk_grade
         |FROM k ORDER BY doc_id""".stripMargin,

    "dedup_lsh_tune" ->
      // Midpoint-grid S-curve integration replay. The grid term mirrors
      // the Spark fold exactly: s = (i + 0.5) * (1.0/1000) and each term
      // is multiplied by the SAME precomputed ds double (not divided by
      // 1000 — a different rounding), summed in list order.
      s"""WITH p AS (
         |  SELECT CAST(b AS INTEGER) AS bands, CAST(32 // b AS INTEGER) AS rows_per_band
         |  FROM (SELECT unnest(generate_series(1, 32)) AS b) WHERE 32 % b = 0),
         |a AS (
         |  SELECT bands, rows_per_band,
         |    list_sum(list_transform(generate_series(0, 999), i ->
         |      CASE WHEN (i + 0.5) * (1.0/1000) < 0.7
         |        THEN (1.0 - pow(1.0 - pow((i + 0.5) * (1.0/1000), rows_per_band), bands)) * (1.0/1000)
         |        ELSE 0.0 END)) AS fp_area,
         |    list_sum(list_transform(generate_series(0, 999), i ->
         |      CASE WHEN (i + 0.5) * (1.0/1000) >= 0.7
         |        THEN (1.0 - (1.0 - pow(1.0 - pow((i + 0.5) * (1.0/1000), rows_per_band), bands))) * (1.0/1000)
         |        ELSE 0.0 END)) AS fn_area
         |  FROM p)
         |SELECT bands, rows_per_band,
         |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS inflection,
         |  round(fp_area, 6) AS fp_area, round(fn_area, 6) AS fn_area,
         |  round(0.5 * fn_area + 0.5 * fp_area, 6) AS error
         |FROM a ORDER BY bands""".stripMargin,

    "text_script_mix" -> {
      // per-class count: codepoints removed by the class regex. The
      // dominant CASE checks classes in REVERSE-alphabetical order —
      // the struct-max tie convention (alphabetically-last name wins).
      val classes = Seq(
        "arabic" -> "[\\x{0600}-\\x{06FF}]",
        "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
        "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
        "greek" -> "[\\x{0370}-\\x{03FF}]",
        "hangul" -> "[\\x{AC00}-\\x{D7AF}]",
        "hebrew" -> "[\\x{0590}-\\x{05FF}]",
        "kana" -> "[\\x{3040}-\\x{30FF}]",
        "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]")
      val cnt = classes.map { case (n, p) =>
        s"CAST(length(tx) - length(regexp_replace(tx, '$p', '', 'g')) AS BIGINT) AS $n"
      }.mkString(",\n|  ")
      val names = classes.map(_._1)
      val mx = s"greatest(${names.mkString(", ")})"
      val dom = names.reverse.map(n => s"WHEN $n = mx THEN '$n'")
        .mkString(" ")
      s"""WITH t AS (
         |  SELECT doc_id, text || CASE
         |    WHEN doc_id % 7 = 0 THEN ' Привет мир'
         |    WHEN doc_id % 7 = 1 THEN ' 你好世界'
         |    WHEN doc_id % 7 = 2 THEN ' αβγ δέλτα'
         |    WHEN doc_id % 7 = 3 THEN ' 12345 67890'
         |    ELSE '' END AS tx
         |  FROM documents WHERE doc_id < 300),
         |c AS (
         |  SELECT doc_id, CAST(length(tx) AS BIGINT) AS n_chars,
         |  $cnt,
         |  CAST(length(tx) - length(regexp_replace(tx, '[0-9]', '', 'g')) AS BIGINT) AS digit,
         |  CAST(length(tx) - length(regexp_replace(tx, '\\s', '', 'g')) AS BIGINT) AS space
         |  FROM t),
         |d AS (SELECT *, $mx AS mx FROM c)
         |SELECT doc_id, n_chars, ${names.mkString(", ")}, digit, space,
         |  n_chars - (${names.mkString(" + ")}) - digit - space AS other,
         |  CASE WHEN mx <= 0 THEN 'none' $dom END AS dominant
         |FROM d ORDER BY doc_id""".stripMargin
    },

    "text_strip_html" -> {
      // replace chain order mirrors TextOps.stripHtml exactly (&amp;
      // LAST); tags become one space each, then whitespace collapses.
      val decoded = Seq(
        "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&"
      ).foldLeft("regexp_replace(tx, '<[^>]*>', ' ', 'g')") {
        case (c, (from, to)) => s"replace($c, '$from', '$to')"
      }
      s"""WITH t AS (
         |  SELECT doc_id,
         |    '<html><body class="x">' || text ||
         |    ' &amp;&nbsp;<b>bold</b>&lt;i&gt; &#39;q&quot;</body></html>' AS tx
         |  FROM documents WHERE doc_id < 300),
         |s AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(tx, '<[^>]*>')) AS BIGINT) AS n_tags,
         |    trim(regexp_replace($decoded, '\\s+', ' ', 'g')) AS clean
         |  FROM t)
         |SELECT doc_id, n_tags, CAST(length(clean) AS BIGINT) AS clean_len,
         |  md5(clean) AS clean_md5
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "text_code_fences" ->
      s"""WITH t AS (
         |  SELECT doc_id, text || CASE
         |    WHEN doc_id % 3 = 0 THEN chr(10) || '```py' || chr(10) ||
         |      'print(1)' || chr(10) || '```' || chr(10) || 'after'
         |    WHEN doc_id % 3 = 1 THEN chr(10) || '``` dangling'
         |    ELSE '' END AS tx
         |  FROM documents WHERE doc_id < 300),
         |c AS (
         |  SELECT doc_id, tx,
         |    regexp_extract_all(tx, '(?s)```.*?```') AS blocks,
         |    len(regexp_extract_all(tx, '```')) AS n_fences
         |  FROM t),
         |k AS (
         |  SELECT doc_id, tx, CAST(len(blocks) AS BIGINT) AS n_blocks,
         |    CAST(coalesce(list_sum(list_transform(blocks,
         |      b -> length(b))), 0) AS BIGINT) AS code_chars,
         |    n_fences
         |  FROM c)
         |SELECT doc_id, n_blocks, code_chars,
         |  CASE WHEN length(tx) > 0 THEN round(CAST(code_chars AS DOUBLE)
         |    / length(tx), 6) ELSE 0.0 END AS code_frac,
         |  (n_fences - n_blocks * 2) > 0 AS dangling_fence
         |FROM k ORDER BY doc_id""".stripMargin,

    "quality_retention_curve" -> {
      val grid = (0 to 9).map(i => s"0.$i").mkString("[", ", ", "]")
      s"""WITH s AS (
         |  SELECT $qualitySql AS s,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len($toks) END AS BIGINT) AS w
         |  FROM documents),
         |t AS (SELECT count(*) AS nt, CAST(sum(w) AS BIGINT) AS wt FROM s),
         |g AS (SELECT CAST(unnest($grid) AS DOUBLE) AS threshold),
         |sel AS (
         |  SELECT g.threshold,
         |    CAST(count(*) FILTER (s.s >= g.threshold) AS BIGINT) AS n_kept,
         |    CAST(COALESCE(sum(s.w) FILTER (s.s >= g.threshold), 0) AS BIGINT) AS tokens_kept
         |  FROM g CROSS JOIN s GROUP BY 1)
         |SELECT threshold, n_kept,
         |  round(CAST(n_kept AS DOUBLE) / t.nt, 6) AS frac_docs,
         |  tokens_kept,
         |  round(CAST(tokens_kept AS DOUBLE) / t.wt, 6) AS frac_tokens
         |FROM sel CROSS JOIN t ORDER BY threshold""".stripMargin
    },

    "text_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang, ${swRatio("de")} AS r_de, ${swRatio("en")} AS r_en,
         |         ${swRatio("es")} AS r_es, ${swRatio("fr")} AS r_fr
         |  FROM documents),
         |pred AS (
         |  SELECT lang, CASE
         |    WHEN greatest(r_de, r_en, r_es, r_fr) <= 0 THEN 'und'
         |    WHEN r_fr = greatest(r_de, r_en, r_es, r_fr) THEN 'fr'
         |    WHEN r_es = greatest(r_de, r_en, r_es, r_fr) THEN 'es'
         |    WHEN r_en = greatest(r_de, r_en, r_es, r_fr) THEN 'en'
         |    ELSE 'de' END AS lang_pred
         |  FROM scored)
         |SELECT lang, lang_pred, count(*) AS n FROM pred
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_vocabulary" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(list_filter($toks, x -> x <> '')) AS token
         |  FROM documents)
         |SELECT token, CAST(count(*) AS BIGINT) AS tf,
         |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
         |FROM t GROUP BY 1 HAVING count(*) >= 50
         |ORDER BY tf DESC, token ASC LIMIT 30""".stripMargin,

    "text_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0) AS toks,
         |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS lines
         |  FROM documents WHERE doc_id < 200),
         |m AS (
         |  SELECT doc_id, len(toks) AS n_words, len(lines) AS n_lines,
         |    CASE WHEN len(toks) > 0 THEN
         |      list_sum(list_transform(toks, x -> len(x))) * 1.0 / len(toks)
         |      ELSE 0.0 END AS mean_word_len,
         |    CASE WHEN len(toks) > 0 THEN
         |      ((length(text) - length(replace(text, '#', '')))
         |       + (length(text) - length(replace(text, '...', ''))) / 3
         |       + (length(text) - length(replace(text, '…', '')))) / len(toks)
         |      ELSE 0.0 END AS symbol_ratio,
         |    CASE WHEN len(lines) > 0 THEN
         |      len(list_filter(lines, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))
         |        * 1.0 / len(lines) ELSE 0.0 END AS bullet_ratio,
         |    CASE WHEN len(lines) > 0 THEN
         |      len(list_filter(lines, l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'))
         |        * 1.0 / len(lines) ELSE 0.0 END AS ellipsis_ratio,
         |    CASE WHEN len(toks) > 0 THEN
         |      len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
         |        * 1.0 / len(toks) ELSE 0.0 END AS alpha_word_ratio,
         |    len(list_filter(['the','be','to','of','and','that','have','with'],
         |      w -> list_contains(list_transform(toks, x -> lower(x)), w)))
         |      AS n_req_stopwords
         |  FROM t)
         |SELECT doc_id, CAST(n_words AS INT) AS n_words,
         |  round(mean_word_len, 4) AS mean_word_len,
         |  round(symbol_ratio, 6) AS symbol_ratio,
         |  round(bullet_ratio, 6) AS bullet_ratio,
         |  round(ellipsis_ratio, 6) AS ellipsis_ratio,
         |  round(alpha_word_ratio, 6) AS alpha_word_ratio,
         |  CAST(n_req_stopwords AS INT) AS n_req_stopwords,
         |  n_words BETWEEN 12 AND 100000 AS ok_word_count,
         |  mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_word_len,
         |  symbol_ratio <= 0.1 AS ok_symbol_ratio,
         |  bullet_ratio <= 0.9 AS ok_bullet_lines,
         |  ellipsis_ratio <= 0.3 AS ok_ellipsis_lines,
         |  alpha_word_ratio >= 0.8 AS ok_alpha_words,
         |  n_req_stopwords >= 2 AS ok_stopwords,
         |  (n_words BETWEEN 12 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         |    AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
         |    AND ellipsis_ratio <= 0.3 AND alpha_word_ratio >= 0.8
         |    AND n_req_stopwords >= 2 AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    // exact replay of both RNG streams; 905157 = TextOps.MaskSalt (the
    // independent masking stream's extra key)
    "text_token_augment" -> {
      val uDrop = graft.ops.Robustness.seededUniformSql("42",
        Seq("doc_id", "(i - 1)"))
      val uMask = graft.ops.Robustness.seededUniformSql("42",
        Seq("doc_id", "(i - 1)", "905157"))
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(
         |    regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0) AS toks
         |  FROM documents WHERE doc_id < 100),
         |aug AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |    list_filter(list_transform(range(1, len(toks) + 1),
         |      i -> CASE WHEN $uDrop >= 0.15 THEN toks[i] END),
         |      x -> x IS NOT NULL) AS dropped,
         |    list_transform(range(1, len(toks) + 1),
         |      i -> CASE WHEN $uMask < 0.2 THEN '<mask>' ELSE toks[i] END) AS masked
         |  FROM t)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(len(dropped) AS BIGINT) AS n_kept,
         |  CAST(len(list_filter(masked, x -> x = '<mask>')) AS BIGINT) AS n_masked,
         |  md5(array_to_string(dropped, ' ')) AS h_dropped,
         |  md5(array_to_string(masked, ' ')) AS h_masked
         |FROM aug ORDER BY doc_id""".stripMargin
    },

    "text_canary_scan" ->
      s"""WITH c AS (
         |  SELECT unnest(['slow fast', 'table table', 'zzz_canary_absent'])
         |    AS canary),
         |h AS (
         |  SELECT c.canary,
         |    (length(d.text) - length(replace(d.text, c.canary, '')))
         |      // length(c.canary) AS n,
         |    d.doc_id
         |  FROM c CROSS JOIN documents d)
         |SELECT canary, CAST(SUM(n) AS BIGINT) AS n_hits,
         |  CAST(COUNT(CASE WHEN n > 0 THEN 1 END) AS BIGINT) AS n_docs,
         |  MIN(CASE WHEN n > 0 THEN doc_id END) AS first_doc
         |FROM h GROUP BY canary ORDER BY canary""".stripMargin,

    "text_oov_rate" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter(
         |    regexp_split_to_array(lower(trim(text)), '\\s+'),
         |    t -> len(t) > 0)) AS term
         |  FROM documents WHERE doc_id < 200),
         |vocab AS (
         |  SELECT term FROM (
         |    SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term)
         |  ORDER BY cnt DESC, term LIMIT 20),
         |scored AS (
         |  SELECT t.doc_id, COUNT(*) AS n_tokens,
         |    COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS n_oov
         |  FROM tok t LEFT JOIN vocab v USING (term) GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
         |  round(CASE WHEN COALESCE(s.n_tokens, 0) > 0
         |    THEN s.n_oov * 1.0 / s.n_tokens ELSE 0.0 END, 6) AS oov_rate
         |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
         |WHERE d.doc_id < 200 ORDER BY d.doc_id""".stripMargin,

    "text_wordlist_filter" ->
      s"""SELECT doc_id,
         |  len(list_filter(
         |    regexp_split_to_array(lower(trim(text)), '\\s+'),
         |    t -> list_contains(['slow', 'drop', 'zzz_absent'],
         |      regexp_replace(t, '^[^a-z0-9]+|[^a-z0-9]+$$', '', 'g'))))
         |    AS n_hits,
         |  len(list_filter(
         |    regexp_split_to_array(lower(trim(text)), '\\s+'),
         |    t -> list_contains(['slow', 'drop', 'zzz_absent'],
         |      regexp_replace(t, '^[^a-z0-9]+|[^a-z0-9]+$$', '', 'g')))) = 0
         |    AS pass
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "text_c4_clean" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS l
         |  FROM documents WHERE doc_id < 150),
         |seed AS (
         |  SELECT doc_id,
         |    coalesce(array_to_string(l[1:6], ' '), '') || '.' AS l1,
         |    coalesce(array_to_string(l[1:3], ' '), '') || '!' AS l2,
         |    coalesce(array_to_string(l[7:12], ' '), '') AS l3,
         |    'Please enable JavaScript to view the comments powered by widgets.' AS l4,
         |    coalesce(array_to_string(l[4:10], ' '), '') || '?' AS l6a
         |  FROM t),
         |pg AS (
         |  SELECT doc_id, concat_ws(chr(10), l1, l2, l3, l4,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN 'Lorem ipsum dolor sit amet consectetur adipiscing elit.'
         |      ELSE l1 END,
         |    CASE WHEN doc_id % 7 = 0
         |      THEN 'function f() { return 1; }' ELSE l6a END) AS page
         |  FROM seed),
         |cl AS (
         |  SELECT doc_id, page, string_split(page, chr(10)) AS lines,
         |    list_filter(string_split(page, chr(10)), ln ->
         |      substr(trim(ln), -1, 1) IN ('.', '!', '?', '"')
         |      AND len(list_filter(regexp_split_to_array(trim(ln), '\\s+'),
         |        w -> w <> '')) >= 5
         |      AND NOT contains(lower(trim(ln)), 'javascript')) AS kept
         |  FROM pg),
         |m AS (
         |  SELECT doc_id, page, len(lines) AS n_lines, len(kept) AS n_lines_kept,
         |    array_to_string(kept, chr(10)) AS cleaned_text,
         |    len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]+'))
         |      AS n_sentences,
         |    contains(lower(page), 'lorem ipsum') AS has_lorem_ipsum,
         |    contains(page, '{') AS has_curly_brace
         |  FROM cl)
         |SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
         |  CAST(n_lines_kept AS INT) AS n_lines_kept,
         |  CAST(n_sentences AS INT) AS n_sentences,
         |  has_lorem_ipsum, has_curly_brace,
         |  n_sentences >= 3 AS ok_sentences,
         |  (NOT has_lorem_ipsum) AND (NOT has_curly_brace)
         |    AND n_sentences >= 3 AS pass,
         |  cleaned_text
         |FROM m ORDER BY doc_id""".stripMargin,

    "dedup_soft_weights" ->
      s"""WITH multi AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $IdShift, text FROM documents WHERE doc_id % 2 = 0
         |  UNION ALL
         |  SELECT doc_id + ${2 * IdShift}, text FROM documents WHERE doc_id % 4 = 0)
         |SELECT doc_id,
         |  count(*) OVER (PARTITION BY md5(text)) AS n_copies,
         |  round(power(count(*) OVER (PARTITION BY md5(text)), -1.0), 9)
         |    AS sample_weight
         |FROM multi ORDER BY doc_id""".stripMargin,

    "corpus_diff" ->
      s"""WITH prev AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 300),
         |nxt AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
         |  FROM documents WHERE doc_id >= 150 AND doc_id < 450)
         |SELECT coalesce(p.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN p.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN md5(p.text) <> md5(n.text) THEN 'changed'
         |       ELSE 'unchanged' END AS status
         |FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin,

    "dedup_span_remove" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + $IdShift AS doc_id,
         |         array_to_string((list_filter($toks, x -> x <> ''))[1:40], ' ') AS text
         |  FROM documents WHERE doc_id < 200),
         |tk AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |    x -> x <> '') AS l
         |  FROM corpus),
         |base AS (
         |  -- out-of-range list slice is NULL in DuckDB, not [] -> coalesce
         |  SELECT doc_id, l, CAST(len(l) // 8 AS INT) AS nt,
         |    coalesce(array_to_string(
         |      l[(CAST(len(l) // 8 AS INT) * 8 + 1):len(l)], ' '), '') AS tail
         |  FROM tk),
         |tiles AS (
         |  SELECT b.doc_id, u.i AS pos,
         |    array_to_string(b.l[(u.i * 8 + 1):(u.i * 8 + 8)], ' ') AS tiletext
         |  FROM base b, LATERAL unnest(range(0, b.nt)) AS u(i)),
         |freq AS (SELECT md5(tiletext) AS tile, count(DISTINCT doc_id) AS docs
         |         FROM tiles GROUP BY 1),
         |flg AS (SELECT t.doc_id, t.pos, t.tiletext, f.docs
         |        FROM tiles t JOIN freq f ON f.tile = md5(t.tiletext)),
         |agg AS (SELECT doc_id,
         |          list(tiletext ORDER BY pos) FILTER (WHERE docs < 2) AS keptlist,
         |          CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS nrem
         |        FROM flg GROUP BY 1),
         |fin AS (
         |  -- array_to_string([]) is NULL in DuckDB, not '' -> coalesce
         |  SELECT b.doc_id,
         |    coalesce(array_to_string(list_filter(
         |      list_append(coalesce(a.keptlist, []), b.tail),
         |      x -> len(x) > 0), ' '), '') AS clean,
         |    CAST(coalesce(a.nrem, 0) AS BIGINT) AS n_tiles_removed
         |  FROM base b LEFT JOIN agg a USING (doc_id))
         |SELECT doc_id, md5(clean) AS clean_md5, n_tiles_removed,
         |  CAST(CASE WHEN trim(clean) = '' THEN 0
         |    ELSE len(list_filter(regexp_split_to_array(trim(clean), '\\s+'),
         |      x -> x <> '')) END AS BIGINT) AS n_tokens_clean
         |FROM fin ORDER BY doc_id""".stripMargin,

    "dedup_span_flags" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + $IdShift AS doc_id,
         |         array_to_string((list_filter($toks, x -> x <> ''))[1:40], ' ') AS text
         |  FROM documents WHERE doc_id < 200),
         |toks AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |    x -> x <> '') AS l
         |  FROM corpus),
         |tiles AS (
         |  SELECT doc_id, CAST(len(l) // 8 AS INT) AS nt,
         |    unnest(list_transform(range(0, len(l) // 8),
         |      i -> md5(array_to_string(l[(i*8+1):(i*8+8)], ' ')))) AS tile
         |  FROM toks WHERE len(l) // 8 > 0),
         |dt AS (SELECT DISTINCT doc_id, nt, tile FROM tiles),
         |freq AS (SELECT tile, count(DISTINCT doc_id) AS docs FROM dt GROUP BY 1),
         |per AS (
         |  SELECT doc_id, min(nt) AS n_tiles, CAST(count(*) AS BIGINT) AS n_distinct_tiles,
         |    CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_tiles
         |  FROM dt JOIN freq USING (tile) GROUP BY 1)
         |SELECT c.doc_id, CAST(coalesce(per.n_tiles, 0) AS INT) AS n_tiles,
         |  coalesce(per.n_distinct_tiles, 0) AS n_distinct_tiles,
         |  coalesce(per.n_dup_tiles, 0) AS n_dup_tiles,
         |  round(CASE WHEN coalesce(per.n_distinct_tiles, 0) > 0
         |    THEN per.n_dup_tiles * 1.0 / per.n_distinct_tiles ELSE 0.0 END, 6)
         |    AS dup_ratio
         |FROM corpus c LEFT JOIN per USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,

    "dedup_substring" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id < 200
         |  UNION ALL
         |  SELECT doc_id + $IdShift AS doc_id,
         |         array_to_string((list_filter($toks, x -> x <> ''))[4:43], ' ') AS text
         |  FROM documents WHERE doc_id < 200),
         |tk AS (
         |  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |    x -> x <> '') AS l
         |  FROM corpus),
         |wins AS (
         |  SELECT doc_id,
         |    CAST(unnest(range(0, greatest(len(l) - 7, 0))) AS BIGINT) AS pos,
         |    unnest(list_transform(range(0, greatest(len(l) - 7, 0)),
         |      i -> md5(array_to_string(l[(i+1):(i+8)], ' ')))) AS h
         |  FROM tk),
         |freq AS (
         |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS docs
         |                 FROM wins GROUP BY 1) WHERE docs >= 2),
         |dup AS (SELECT doc_id, pos FROM wins JOIN freq USING (h)),
         |lagged AS (
         |  SELECT doc_id, pos,
         |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |  FROM dup),
         |isl AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM lagged)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,

    "dedup_edit_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY 1, 2""".stripMargin,

    "pack_by_group" ->
      s"""WITH t AS (
         |  SELECT lang, doc_id,
         |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
         |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT lang, doc_id, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS prev
         |  FROM t)
         |SELECT lang, doc_id, n_tokens,
         |  CAST(floor(prev / 256.0) AS BIGINT) AS bin,
         |  CAST(prev % 256 AS BIGINT) AS "offset"
         |FROM c ORDER BY lang, doc_id""".stripMargin,

    "q_top_coverage" ->
      """WITH u AS (
        |  SELECT event_type, user_id, sum(value) AS s FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, user_id, s,
        |    sum(s) OVER (PARTITION BY event_type ORDER BY s DESC, user_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(s) OVER (PARTITION BY event_type) AS total
        |  FROM u)
        |SELECT event_type, count(*) AS n_top_users,
        |  round(max(cum / total), 6) AS coverage
        |FROM c WHERE cum - s < total * 0.5
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "mixture_temperature" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS grp, count(*) AS n
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |             sum(pow(CAST(n AS DOUBLE), 0.5)) AS powsum FROM c)
        |SELECT grp, CAST(n AS BIGINT) AS n,
        |  round(n * 1.0 / total, 6) AS actual_frac,
        |  round(pow(CAST(n AS DOUBLE), 0.5) / powsum, 6) AS target_frac,
        |  round((pow(CAST(n AS DOUBLE), 0.5) / powsum) / (n * 1.0 / total), 6) AS weight
        |FROM c CROSS JOIN t ORDER BY grp""".stripMargin,

    "sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars FROM (
         |  SELECT doc_id, lang, n_chars,
         |    pow(${graft.ops.Robustness.seededUniformSql("11", Seq("doc_id"))},
         |        1.0 / n_chars) AS k
         |  FROM documents WHERE n_chars > 0
         |  ORDER BY k DESC, doc_id ASC LIMIT 50)
         |ORDER BY doc_id""".stripMargin,

    // e0-exponent literals force DOUBLE (not DECIMAL) so the
    // ratio/rate arithmetic is bit-identical to the driver's
    "sample_match_dist" ->
      s"""WITH c AS (SELECT lang AS g, count(*) AS n FROM documents GROUP BY 1),
         |t(g, t) AS (VALUES ('en', 0.4e0), ('de', 0.2e0), ('es', 0.2e0), ('fr', 0.2e0)),
         |r AS (SELECT c.g, t.t / c.n AS ratio FROM c JOIN t USING (g)),
         |mx AS (SELECT max(ratio) AS m FROM r),
         |rates AS (SELECT g, ratio / m AS rate FROM r CROSS JOIN mx)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN rates ON rates.g = d.lang
         |WHERE ${graft.ops.Robustness.seededUniformSql("31", Seq("d.doc_id"))} < rates.rate
         |ORDER BY d.doc_id""".stripMargin,

    "text_normalize" ->
      s"""WITH n AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text || '  X.Y;Z!!  tail   CASE'),
         |    '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\]^_`{|}~]', ' ', 'g'),
         |    '\\s+', ' ', 'g')) AS nt
         |  FROM documents WHERE doc_id < 50)
         |SELECT doc_id, md5(nt) AS norm_md5, length(nt) AS n_norm
         |FROM n ORDER BY doc_id""".stripMargin,

    "sample_shuffle" ->
      s"""SELECT doc_id, lang FROM documents
         |ORDER BY ${graft.ops.IntHash.mixSql("23", Seq("doc_id"))}, doc_id
         |LIMIT 20""".stripMargin,

    "dedup_fuzzy_join" -> {
      val grams = "list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |l AS (SELECT doc_id, $grams AS sh FROM tok WHERE doc_id < 100),
         |r AS (SELECT doc_id + 10000 AS rid, $grams AS sh FROM tok
         |      WHERE doc_id >= 50 AND doc_id < 150)
         |SELECT l.doc_id, r.rid,
         |  round(len(list_intersect(l.sh, r.sh)) * 1.0 /
         |        len(list_distinct(list_concat(l.sh, r.sh))), 4) AS jaccard
         |FROM l JOIN r ON len(list_intersect(l.sh, r.sh)) * 1.0 /
         |      len(list_distinct(list_concat(l.sh, r.sh))) >= 0.9
         |ORDER BY 1, 2""".stripMargin
    },

    "dedup_jaro_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE jaro_winkler_similarity(a.name, b.name) >= 0.87
        |ORDER BY 1, 2""".stripMargin,

    // Two unrolled HITS rounds: a ← Σ_in h, h ← Σ_out a, both
    // L1-normalized per round. Nodes without in/out edges carry 0 via
    // the LEFT JOIN + coalesce, exactly like the engine's `nodes` frame.
    "graph_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id % 40 AS u,
        |    (user_id % 40 + 1 + event_id % 11) % 40 AS v
        |  FROM events WHERE event_id < 3000),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |a0 AS (SELECT v AS node, sum(1.0e0 / nn.n) AS s
        |       FROM e CROSS JOIN nn GROUP BY v),
        |h0 AS (SELECT e.u AS node, sum(coalesce(a0.s, 0.0e0)) AS s
        |       FROM e LEFT JOIN a0 ON a0.node = e.v GROUP BY e.u),
        |n1 AS (SELECT (SELECT sum(s) FROM h0) AS hs,
        |              (SELECT sum(s) FROM a0) AS "as"),
        |h1 AS (SELECT nodes.node, coalesce(h0.s, 0.0e0) / n1.hs AS hub
        |       FROM nodes LEFT JOIN h0 ON h0.node = nodes.node CROSS JOIN n1),
        |a1 AS (SELECT nodes.node, coalesce(a0.s, 0.0e0) / n1."as" AS auth
        |       FROM nodes LEFT JOIN a0 ON a0.node = nodes.node CROSS JOIN n1),
        |a2 AS (SELECT e.v AS node, sum(h1.hub) AS s
        |       FROM e JOIN h1 ON h1.node = e.u GROUP BY e.v),
        |h2 AS (SELECT e.u AS node, sum(coalesce(a2.s, 0.0e0)) AS s
        |       FROM e LEFT JOIN a2 ON a2.node = e.v GROUP BY e.u),
        |n2 AS (SELECT (SELECT sum(s) FROM h2) AS hs,
        |              (SELECT sum(s) FROM a2) AS "as")
        |SELECT nodes.node,
        |  round(coalesce(h2.s, 0.0e0) / n2.hs, 6) AS hub,
        |  round(coalesce(a2.s, 0.0e0) / n2."as", 6) AS auth
        |FROM nodes LEFT JOIN h2 ON h2.node = nodes.node
        |LEFT JOIN a2 ON a2.node = nodes.node CROSS JOIN n2
        |ORDER BY nodes.node""".stripMargin,

    // Synchronized k-core peel as a recursive CTE: each iteration keeps
    // the edges whose BOTH endpoints have degree >= k in the previous
    // iteration's edge set (degree = count() windows over the symmetrized
    // working table), re-emitting stable rows with it+1. The fixture
    // converges in 26 sweeps; depth 32 leaves margin, rows at it = 32 are
    // the fixpoint.
    "graph_kcore" ->
      """WITH RECURSIVE raw AS (
        |  SELECT event_id % 25 AS u, event_id % 25 + 1 AS v
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 50 + event_id % 10, 50 + (event_id % 10 + 1) % 10
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 100 + event_id % 7, 100 + user_id % 7
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 25, 100),
        |sym AS (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw)
        |  WHERE u != v),
        |alive AS (
        |  SELECT u, v, 0 AS it FROM sym
        |  UNION ALL
        |  SELECT u, v, it + 1 FROM (
        |    SELECT u, v, it,
        |      count(*) OVER (PARTITION BY u) AS du,
        |      count(*) OVER (PARTITION BY v) AS dv
        |    FROM alive)
        |  WHERE du >= 2 AND dv >= 2 AND it < 32)
        |SELECT u AS node, count(*) AS deg
        |FROM alive WHERE it = 32 GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_modularity" ->
      """WITH e AS (
        |  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM (
        |    SELECT user_id % 40 AS u,
        |      (user_id % 40 + 1 + event_id % 11) % 40 AS v
        |    FROM events WHERE event_id < 3000)
        |  WHERE u != v),
        |tagged AS (SELECT a, b, CAST(a // 10 AS VARCHAR) AS ca,
        |    CAST(b // 10 AS VARCHAR) AS cb FROM e),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM tagged),
        |deg AS (SELECT c AS community, count(*) AS degree_sum FROM (
        |    SELECT ca AS c FROM tagged UNION ALL SELECT cb FROM tagged)
        |  GROUP BY 1),
        |nodes AS (SELECT c AS community,
        |    CAST(count(DISTINCT n) AS BIGINT) AS n_nodes FROM (
        |    SELECT a AS n, ca AS c FROM tagged
        |    UNION SELECT b, cb FROM tagged)
        |  GROUP BY 1),
        |inn AS (SELECT ca AS community, count(*) AS internal_edges
        |  FROM tagged WHERE ca = cb GROUP BY 1)
        |SELECT deg.community, n_nodes,
        |  CAST(coalesce(internal_edges, 0) AS BIGINT) AS internal_edges,
        |  CAST(degree_sum AS BIGINT) AS degree_sum,
        |  round(coalesce(internal_edges, 0) / m
        |    - pow(degree_sum / (2.0 * m), 2), 6) AS q_contrib
        |FROM deg JOIN nodes ON deg.community = nodes.community
        |LEFT JOIN inn ON deg.community = inn.community
        |CROSS JOIN m
        |ORDER BY 1""".stripMargin,

    "graph_clustering_coef" ->
      """WITH raw AS (
        |  SELECT event_id % 25 AS u, event_id % 25 + 1 AS v
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 50 + event_id % 10, 50 + (event_id % 10 + 1) % 10
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 100 + event_id % 7, 100 + user_id % 7
        |  FROM events WHERE event_id < 1000
        |  UNION
        |  SELECT 25, 100),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        |  FROM raw WHERE u != v),
        |deg AS (SELECT n AS node, count(*) AS degree FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pern AS (SELECT n AS node, count(*) AS triangles FROM (
        |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT deg.node, CAST(degree AS BIGINT) AS degree,
        |  CAST(coalesce(triangles, 0) AS BIGINT) AS triangles,
        |  round(CASE WHEN degree >= 2 THEN 2.0 * coalesce(triangles, 0)
        |    / (degree * (degree - 1.0)) ELSE 0.0 END, 6) AS coef
        |FROM deg LEFT JOIN pern ON deg.node = pern.node
        |ORDER BY 1""".stripMargin,

    // 3 unrolled PageRank iterations; double literals via e0 exponents so
    // DuckDB doesn't fall into DECIMAL arithmetic; round(…,6) absorbs
    // summation-order ULP drift.
    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id % 40 AS u,
        |    (user_id % 40 + 1 + event_id % 11) % 40 AS v
        |  FROM events WHERE event_id < 3000),
        |nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        |r0 AS (SELECT node, 1.0e0 / n AS rank FROM nodes CROSS JOIN nn),
        |d1 AS (SELECT coalesce(sum(rank), 0.0e0) AS dm FROM r0
        |       WHERE node NOT IN (SELECT u FROM deg)),
        |c1 AS (SELECT e.v AS node, sum(r0.rank / deg.d) AS c
        |       FROM e JOIN r0 ON r0.node = e.u JOIN deg ON deg.u = e.u GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |         (1.0e0 - 0.85e0) / nn.n + 0.85e0 * (coalesce(c1.c, 0.0e0) + d1.dm / nn.n) AS rank
        |       FROM nodes LEFT JOIN c1 ON c1.node = nodes.node
        |       CROSS JOIN nn CROSS JOIN d1),
        |d2 AS (SELECT coalesce(sum(rank), 0.0e0) AS dm FROM r1
        |       WHERE node NOT IN (SELECT u FROM deg)),
        |c2 AS (SELECT e.v AS node, sum(r1.rank / deg.d) AS c
        |       FROM e JOIN r1 ON r1.node = e.u JOIN deg ON deg.u = e.u GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |         (1.0e0 - 0.85e0) / nn.n + 0.85e0 * (coalesce(c2.c, 0.0e0) + d2.dm / nn.n) AS rank
        |       FROM nodes LEFT JOIN c2 ON c2.node = nodes.node
        |       CROSS JOIN nn CROSS JOIN d2),
        |d3 AS (SELECT coalesce(sum(rank), 0.0e0) AS dm FROM r2
        |       WHERE node NOT IN (SELECT u FROM deg)),
        |c3 AS (SELECT e.v AS node, sum(r2.rank / deg.d) AS c
        |       FROM e JOIN r2 ON r2.node = e.u JOIN deg ON deg.u = e.u GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |         (1.0e0 - 0.85e0) / nn.n + 0.85e0 * (coalesce(c3.c, 0.0e0) + d3.dm / nn.n) AS rank
        |       FROM nodes LEFT JOIN c3 ON c3.node = nodes.node
        |       CROSS JOIN nn CROSS JOIN d3)
        |SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node""".stripMargin,

    // 3 unrolled synchronous LPA rounds: symmetrized simple edges, each
    // round = neighbor-label count + (count DESC, label ASC) pick.
    "graph_label_prop" ->
      """WITH e0 AS (
        |  SELECT DISTINCT user_id % 40 AS u,
        |    (user_id % 40 + 1 + event_id % 11) % 40 AS v
        |  FROM events WHERE event_id < 3000),
        |e AS (SELECT u, v FROM e0 WHERE u != v
        |      UNION SELECT v, u FROM e0 WHERE u != v),
        |nodes AS (SELECT DISTINCT u AS node FROM e),
        |l0 AS (SELECT node, node AS label FROM nodes),
        |n1 AS (SELECT e.v AS node, l.label, count(*) AS c
        |       FROM e JOIN l0 l ON l.node = e.u GROUP BY 1, 2),
        |l1 AS (SELECT node, label FROM (
        |         SELECT *, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label ASC) AS rk FROM n1) WHERE rk = 1),
        |n2 AS (SELECT e.v AS node, l.label, count(*) AS c
        |       FROM e JOIN l1 l ON l.node = e.u GROUP BY 1, 2),
        |l2 AS (SELECT node, label FROM (
        |         SELECT *, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label ASC) AS rk FROM n2) WHERE rk = 1),
        |n3 AS (SELECT e.v AS node, l.label, count(*) AS c
        |       FROM e JOIN l2 l ON l.node = e.u GROUP BY 1, 2),
        |l3 AS (SELECT node, label FROM (
        |         SELECT *, row_number() OVER (PARTITION BY node
        |           ORDER BY c DESC, label ASC) AS rk FROM n3) WHERE rk = 1)
        |SELECT node, label FROM l3 ORDER BY node""".stripMargin,

    "graph_triangles" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
        |e AS (
        |  SELECT a.name AS a, b.name AS b FROM n a JOIN n b ON a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 3)
        |SELECT e1.a, e1.b, e2.b AS c
        |FROM e e1 JOIN e e2 ON e1.b = e2.a
        |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY 1, 2, 3""".stripMargin,

    "dedup_entity_resolution" ->
      """WITH RECURSIVE n AS (
        |  SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
        |p AS (
        |  SELECT a.name AS na, b.name AS nb FROM n a JOIN n b ON a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 2),
        |edges AS (SELECT na AS u, nb AS v FROM p UNION ALL SELECT nb, na FROM p),
        |reach(x, comp) AS (
        |  SELECT name, name FROM n
        |  UNION
        |  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.x),
        |c AS (SELECT x AS name, min(comp) AS component FROM reach GROUP BY x)
        |SELECT component, count(*) AS n_members,
        |  string_agg(name, ',' ORDER BY name) AS members
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_lm_score" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(list_filter($toks, x -> x <> '')) AS token
         |  FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) + count(*) AS denom FROM c),
         |lp AS (SELECT token, ln((cnt + 1.0) / denom) AS logp
         |       FROM c CROSS JOIN tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  round(avg(logp), 6) AS avg_logp,
         |  round(exp(-avg(logp)), 4) AS ppl
         |FROM t JOIN lp USING (token)
         |WHERE doc_id < 100 GROUP BY 1 ORDER BY 1""".stripMargin,

    "dsir_weights" -> {
      val h = graft.ops.IntHash.stringHashSql("u.g")
      s"""WITH tok AS (
         |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |g AS (
         |  SELECT t.doc_id, t.lang, ($h) % 1024 AS b
         |  FROM (SELECT doc_id, lang,
         |          list_transform(range(1, len(toks)),
         |            i -> toks[i] || ' ' || toks[i + 1]) AS gs
         |        FROM tok) t,
         |       UNNEST(t.gs) AS u(g)),
         |dist AS (
         |  SELECT b, sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc,
         |         sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS rc
         |  FROM g GROUP BY b),
         |lr AS (
         |  SELECT b, ln((tc + 1.0) / (tt + 1024.0)) - ln((rc + 1.0) / (rt + 1024.0)) AS lr
         |  FROM dist CROSS JOIN
         |       (SELECT sum(tc) AS tt, sum(rc) AS rt FROM dist) tot)
         |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(sum(lr.lr), 4) AS weight
         |FROM g JOIN lr USING (b)
         |WHERE g.doc_id < 200 GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
