package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Stats, TextOps}

/** Scale-measurement probe: times one operator on synthetic data far
  * beyond the sf testdata (the SCALE.md numbers). Synthetic inputs are
  * deterministic hash soup, generated DISTRIBUTED (`spark.range`, no
  * driver-side collections).
  *
  * Usage: sbt 'runMain graft.ScaleProbe <op> [n]'
  *   ops: ewma | spans | substr | bm25 | wsample | lm | vocab |
  *        editpairs | corr | fuzzyjoin | sessionize | ttd | entityres |
  *        editskew | pagerank | cc | packsplit | spanremove | semdedup |
  *        dsir | paradedup | tokenbudget | groupjac | ndinc |
  *        qclassifier | zorder | maxsim | linkage | corpusdiff |
  *        bootstrap | … (see the match below — every round adds cases;
  *        round-10 third wave: ranktests | trend | rfm | markov |
  *        graphstruct | rmst)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("ewma")
    val n = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // NOTE: driver heap cannot be set here — in local mode the JVM is
      // already running, so spark.driver.memory would be a silent no-op.
      // Launch with the heap instead:
      //   SBT_OPTS="-Xmx24g" sbt 'runMain graft.ScaleProbe <op> <n>'
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~30-token deterministic word-soup docs, generated in parallel
    def docs(nDocs: Long): DataFrame = {
      val words = typedLit((1 to 50).map(i => s"w$i"))
      spark.range(nDocs).select(col("id"),
        array_join(transform(sequence(lit(0), pmod(xxhash64(col("id")), lit(20)) + lit(20)),
          i => element_at(words, pmod(xxhash64(col("id"), i), lit(50)).cast("int") + 1)), " ")
          .as("text"))
    }

    def series(nRows: Long, nKeys: Int): DataFrame =
      spark.range(nRows).select(
        pmod(xxhash64(col("id")), lit(nKeys)).as("k"),
        col("id").as("t"),
        (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 10.0).as("x"))

    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    op match {
      case "ewma" =>
        val df = series(n, 1000)
        df.count() // materialize input cost separately
        time(s"ewma n=$n keys=1000")(
          Stats.ewma(df, "k", Seq("t"), "x", 0.3)
            .agg(sum("ewma")).collect())
      case "spans" =>
        val d = docs(n)
        d.count()
        time(s"duplicateSpans n=$n w=8")(
          Dedup.duplicateSpans(d, "id", "text", w = 8, minDocs = 2)
            .agg(sum("n_dup_tiles")).collect())
      case "substr" =>
        // stride-1 window volume is ~tokens-per-doc × docs (vs ~1/w of
        // that for tiles); grain (argv[2], default 4) content-samples it
        // back down — the documented scale recipe for substringDuplicates
        val grain = args.lift(2).map(_.toInt).getOrElse(4)
        val d = docs(n)
        d.count()
        time(s"substringDuplicates n=$n w=8 grain=$grain")(
          Dedup.substringDuplicates(d, "id", "text", w = 8, minDocs = 2,
              grain = grain)
            .agg(count(lit(1)), sum(col("span_end") - col("span_start"))).collect())
      case "bm25" =>
        // 3 queries over hash-soup docs; every term is in the 50-word
        // vocabulary, so the matched-postings shuffle is the corpus's
        // full token stream — the WORST case for the isin prefilter
        // (real queries match a tiny fraction; this bounds it from above)
        val d = docs(n)
        d.count()
        time(s"bm25TopK n=$n queries=3 k=10")(
          graft.ops.Retrieval.bm25TopK(d, "id", col("text"),
              Seq("q1" -> "w1 w7 w13", "q2" -> "w2 w25", "q3" -> "w3 w30 w44 w49"),
              k = 10)
            .agg(count(lit(1)), sum("score")).collect())
      case "wsample" =>
        val df = spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id")), lit(100)) + 1).cast("double").as("w"))
        df.count()
        time(s"weightedSample n=$n k=10000")(
          Stats.weightedSample(df, col("id"), col("w"), 10000, 7L).count())
      case "lm" =>
        val d = docs(n)
        d.count()
        time(s"lmScore n=$n")(
          TextOps.lmScore(d, "id", col("text")).agg(sum("avg_logp")).collect())
      case "vocab" =>
        val d = docs(n)
        d.count()
        time(s"vocabulary n=$n")(
          TextOps.vocabulary(d, col("id"), col("text"), 100L, 1000).count())
      case "semdedup" =>
        // n/2 base vectors (hash-soup, dim from argv[2], default 16) +
        // n/2 planted near-copies (cos ≈ 0.999); nCells ≈ n/10k per the
        // published recipe, so the within-cell pairwise stage stays
        // bounded as n grows. At 10M/dim-64 this is 1000 cells × 64 dims
        // — well past maxLiteralTerms, exercising the broadcast-join
        // assignment path.
        val dim = args.lift(2).map(_.toInt).getOrElse(16)
        val half = n / 2
        val dims = sequence(lit(0), lit(dim - 1))
        val base = spark.range(half).select(col("id"),
          transform(dims, i =>
            pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 1000.0 + 0.001)
            .as("v"))
        val recs = base.unionByName(
          base.select((col("id") + half).as("id"),
            transform(col("v"), x => x * 1.001 + 0.0003).as("v")))
        recs.count()
        val nCells = math.max(4, (n / 10000).toInt)
        time(s"semanticDedup n=$n nCells=$nCells dim=$dim") {
          val out = graft.ops.Similarity.semanticDedup(recs, "id", "v",
            nCells = nCells, iters = 1, simThreshold = 0.999)
          if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) out.explain("formatted")
          println("dups=" + out.where(col("is_dup")).count())
        }
      case "annivf" =>
        // phase timing of the ann_ivf bench line on the REAL sf0.1 table
        val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        val e = graft.queries.Q.table(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        e.count() // warm the scan
        val queries = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        time("ann_ivf warm full")(
          graft.ops.Similarity.ivfTopK(e, queries, "vec_id", "v", "qid", "qv",
            k = 3, nCells = 16, nProbe = 4, centroidsByHash = false).count())
        time("ann_ivf second run")(
          graft.ops.Similarity.ivfTopK(e, queries, "vec_id", "v", "qid", "qv",
            k = 3, nCells = 16, nProbe = 4, centroidsByHash = false).count())
      case "dsir" =>
        // ~30-token docs, 1/3 "target": both passes scan the corpus, the
        // model stays ≤ numBuckets rows however large n grows
        val d = docs(n)
        d.count()
        time(s"dsirWeights n=$n buckets=8192")(
          TextOps.dsirWeights(d, "id", col("text"),
              pmod(xxhash64(col("id"), lit(7)), lit(3)) === 0)
            .agg(sum("weight"), sum("n_grams")).collect())
      case "corr" =>
        // one-pass pairwise correlations over 4 columns (6 pairs)
        val df = spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id")), lit(1000)) / 10.0).as("a"),
          (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 10.0).as("b"),
          (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 10.0).as("c"),
          (pmod(xxhash64(col("id"), lit(3)), lit(1000)) / 10.0).as("d"))
        df.count()
        time(s"corrMatrix n=$n cols=4")(
          Stats.corrMatrix(df, Seq("a", "b", "c", "d")).collect())
      case "spanremove" =>
        val d = docs(n)
        d.count()
        time(s"removeDuplicateSpans n=$n w=8")(
          Dedup.removeDuplicateSpans(d, "id", "text", w = 8, minDocs = 2)
            .agg(sum("n_tiles_removed"), sum(length(col("text_clean")))).collect())
      case "packsplit" =>
        val d = docs(n)
        d.count()
        time(s"packSequencesSplit n=$n budget=2048")(
          TextOps.packSequencesSplit(d, col("text"), Seq(col("id")), 2048)
            .agg(sum("piece_len")).collect())
      case "cc" =>
        // worst case for label propagation: ONE path of n nodes
        // (diameter n−1) — pointer jumping must finish in O(log n) rounds
        val nodes = spark.range(n).select(col("id"))
        val chain = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
        nodes.count(); chain.count()
        time(s"connectedComponents chain n=$n (diameter ${n - 1})")(
          Dedup.connectedComponents(nodes, chain, "id", "a", "b")
            .select(countDistinct("component")).collect())
      case "pagerank" =>
        // n edges over n/10 nodes, hash-soup topology; 5 iterations
        val nNodes = math.max(n / 10, 10L)
        val edges = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("s"),
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("d"))
        edges.count()
        time(s"pageRank edges=$n nodes=$nNodes iters=5")(
          graft.ops.Graph.pageRank(edges, "s", "d", iterations = 5)
            .agg(sum("rank")).collect())
      case "fuzzyjoin" =>
        val l = docs(n); val r = docs(n) // same generator -> every doc matches
        l.count(); r.count()
        time(s"fuzzyJoin n=$n x n=$n")(
          Dedup.fuzzyJoin(l, "id", "text", r.withColumnRenamed("id", "rid"),
            "rid", "text", threshold = 0.9).count())
      case "sessionize" =>
        // G12 episode sessionization: ~5% attack rows in ~1000-row episodes
        val df = spark.range(n).select(col("id").as("idx"),
          (pmod(xxhash64(col("id") / 1000), lit(20)) === 0).cast("int").as("yt"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) === 0).cast("int").as("yp"),
          (col("id") / 1000).cast("string").as("ep"))
        df.count()
        time(s"sessionize n=$n")(
          graft.ops.Sessionize.episodes(df, col("idx"), col("yt"), col("yp"), col("ep"))
            .agg(count(lit(1))).collect())
      case "ttd" =>
        // the full g12_ttd shape: episodes + detection flag + avg TTD
        // over a single global order (boundary-chained partials)
        val df = spark.range(n).select(col("id").as("idx"),
          (pmod(xxhash64(col("id") / 1000), lit(20)) === 0).cast("int").as("yt"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) === 0).cast("int").as("yp"),
          (col("id") / 1000).cast("string").as("ep"))
        df.count()
        time(s"ttdStats n=$n")(
          graft.ops.Sessionize.ttdStats(df, col("idx"), col("yt"), col("yp"),
            col("ep"), hopSeconds = 1.0).collect())
      case "entityres" =>
        // the dedup_entity_resolution capstone at scale: segment-prefiltered
        // edit-distance edges over varied names (+1% twins, as editpairs)
        // -> pointer-jumping CC -> canonical entity per cluster
        def nm(idc: org.apache.spark.sql.Column) =
          concat(conv(xxhash64(idc), 10, 36), conv(xxhash64(idc, lit(1)), 10, 36))
            .substr(lit(1), (lit(8) + pmod(xxhash64(idc, lit(2)), lit(9))).cast("int"))
        val base = spark.range(n).select(nm(col("id")).as("nm"))
        val twins = spark.range(n / 100).select(concat(nm(col("id")), lit("x")).as("nm"))
        val recs = base.unionByName(twins)
        recs.count()
        time(s"entityResolution records<=${n + n / 100} maxDist=2") {
          val names = recs.select(col("nm").as("name")).where(col("name").isNotNull).distinct()
          val pairs = Dedup.editDistancePairs(recs, col("nm"), maxDist = 2)
          val out = Dedup.connectedComponents(names, pairs, "name", "name_a", "name_b")
            .groupBy("component")
            .agg(count(lit(1)).as("n_members"))
            .agg(count(lit(1)), sum("n_members")).collect()
          println("clusters/members=" + out.mkString)
        }
      case "editpairs" =>
        // Varied random names (8-16 base36 chars) + a 1% injected twin set
        // at edit distance 1, so the TRUE answer is ~n/100 pairs (linear)
        // and the timing measures the blocking, not output size. A
        // constant-prefix uniform-length generator would instead make the
        // true pair count itself quadratic-ish — no blocking can beat the
        // size of its own answer.
        def nm(idc: org.apache.spark.sql.Column) =
          concat(conv(xxhash64(idc), 10, 36), conv(xxhash64(idc, lit(1)), 10, 36))
            .substr(lit(1), (lit(8) + pmod(xxhash64(idc, lit(2)), lit(9))).cast("int"))
        val base = spark.range(n).select(nm(col("id")).as("nm"))
        val twins = spark.range(n / 100).select(concat(nm(col("id")), lit("x")).as("nm"))
        val names = base.unionByName(twins)
        names.count()
        time(s"editDistancePairs distinct<=${n + n / 100} maxDist=2")(
          println("pairs=" + Dedup.editDistancePairs(names, col("nm"), 2).count()))
      case "editskew" =>
        // LOW-ENTROPY vocabulary stress: TPC-H-style names are a few words
        // drawn from a ~100-word vocabulary, so fixed-position PassJoin
        // segments collide across many names and the near-singleton-bucket
        // argument from random names does NOT apply. Reports the blocking's
        // candidate (pre-verify) pair count, the true pair count, and the
        // candidate count plain length-banding would have produced (from
        // the length histogram) — the safe-regime numbers for SCALE.md.
        val vocab = (0 until 100).map { i =>
          val s = java.lang.Long.toString((i * 2654435761L + 11) & 0xFFFFFFFFFL, 36)
          s"${"aeioubcdfg".charAt(i % 10)}$s".take(4 + i % 6)
        }
        val words = typedLit(vocab)
        def pick(idc: org.apache.spark.sql.Column, j: Int) =
          element_at(words, pmod(xxhash64(idc, lit(j)), lit(100)).cast("int") + 1)
        def lowNm(idc: org.apache.spark.sql.Column) =
          concat_ws(" ", (0 until 5).map(j => pick(idc, j)): _*)
        val base = spark.range(n).select(lowNm(col("id")).as("nm"))
        val twins = spark.range(n / 100).select(
          concat(lowNm(col("id")), lit("x")).as("nm"))
        val names = base.unionByName(twins)
        names.count()
        val lenHist = names.distinct()
          .groupBy(length(col("nm")).as("l")).count()
          .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
        val banding = (for ((la, ca) <- lenHist; (lb, cb) <- lenHist
            if la <= lb && lb - la <= 2)
          yield if (la == lb) ca * (ca - 1) / 2 else ca * cb).sum
        println(s"[probe] length-banding candidates = $banding")
        time(s"editskew candidates distinct<=${n + n / 100} maxDist=2")(
          println("candidates=" +
            Dedup.editDistanceCandidates(names, col("nm"), 2).count()))
        time(s"editskew verified pairs")(
          println("pairs=" + Dedup.editDistancePairs(names, col("nm"), 2).count()))
      case "paradedup" =>
        // multi-paragraph docs drawing 3 paragraphs each from a pool of
        // n/2 distinct paragraph strings (~6x duplication) — the
        // boilerplate-heavy shape dedupParagraphs exists for
        val words = typedLit((1 to 50).map(i => s"w$i"))
        def para(seed: org.apache.spark.sql.Column) =
          array_join(transform(sequence(lit(0), lit(9)),
            i => element_at(words, pmod(xxhash64(seed, i), lit(50)).cast("int") + 1)), " ")
        val pool = lit((n / 2).max(1L))
        val d = spark.range(n).select(col("id"),
          concat_ws("\n\n",
            para(pmod(xxhash64(col("id"), lit(1)), pool)),
            para(pmod(xxhash64(col("id"), lit(2)), pool)),
            para(pmod(xxhash64(col("id"), lit(3)), pool))).as("text"))
        d.count()
        time(s"dedupParagraphs n=$n pool=${n / 2}")(
          Dedup.dedupParagraphs(d, "id", "text")
            .agg(sum("n_paras"), sum("n_kept")).collect())
      case "tokenbudget" =>
        val d = docs(n).select(col("id"),
          pmod(xxhash64(col("id"), lit(9)), lit(100)).as("g"),
          pmod(xxhash64(col("id"), lit(8)), lit(100000)).cast("double").as("s"),
          col("text"))
        d.count()
        time(s"selectByTokenBudget n=$n groups=100")(
          TextOps.selectByTokenBudget(d, "g", col("s"), col("id"), col("text"),
              budgetTokens = n / 50)
            .agg(count(lit(1)), sum("cum_tokens")).collect())
      case "groupjac" =>
        val d = docs(n).select(
          pmod(xxhash64(col("id"), lit(5)), lit(20)).as("g"), col("text"))
        d.count()
        time(s"groupJaccard n=$n groups=20 bigrams")(
          TextOps.groupJaccard(d, col("g"), col("text"), n = 2)
            .agg(count(lit(1)), sum("n_inter")).collect())
      case "ndinc" =>
        // batch 1: n distinct docs; batch 2: n/2 docs of which ~10% are
        // near-copies of batch-1 docs (one word appended)
        val store = java.nio.file.Files.createTempDirectory("ndinc_probe")
          .toString + "/store"
        val b1 = docs(n)
        // batch-2 fresh docs come from a DISJOINT id range (the generator
        // derives text from the id, so same-range ids are exact copies)
        val words = typedLit((1 to 50).map(i => s"w$i"))
        val b2raw = spark.range(2 * n, 2 * n + n / 2).select(col("id"),
          array_join(transform(
            sequence(lit(0), pmod(xxhash64(col("id")), lit(20)) + lit(20)),
            i => element_at(words, pmod(xxhash64(col("id"), i), lit(50)).cast("int") + 1)), " ")
            .as("text"))
        val copies = docs(n / 10).select((col("id") + 4 * n).as("id"),
          concat(col("text"), lit(" zz")).as("text"))
        val b2 = b2raw.unionByName(copies)
        b1.count(); b2.count()
        time(s"nearDupIncremental batch1 n=$n")(
          println("kept1=" + Dedup.nearDupIncremental(b1, "id", "text",
            store, 0.8, 3, 8, 4).count()))
        time(s"nearDupIncremental batch2 n=${n / 2 + n / 10} (10% near-dups)")(
          println("kept2=" + Dedup.nearDupIncremental(b2, "id", "text",
            store, 0.8, 3, 8, 4).count()))
      case "qclassifier" =>
        val d = docs(n).select(col("id"), col("text"),
          (pmod(xxhash64(col("id"), lit(3)), lit(2)) === 0).cast("int").as("y"))
        d.count()
        time(s"trainTextClassifier n=$n buckets=4096 epochs=3")(
          println("nnz=" + graft.ops.LinearModel.trainTextClassifier(
            d, "id", col("text"), col("y"),
            numBuckets = 4096, epochs = 3, lr = 1.0).weights.size))
      case "zorder" =>
        val d = spark.range(n).select(col("id"),
          pmod(xxhash64(col("id")), lit(65536)).as("x"),
          pmod(xxhash64(col("id"), lit(2)), lit(65536)).as("y"))
        d.count()
        time(s"zorder repartition+sort n=$n bits=16")(
          println("rows=" + d.withColumn("z",
              graft.ops.Skew.zorderKey(Seq(col("x"), col("y")), 16))
            .repartitionByRange(64, col("z"))
            .sortWithinPartitions(col("z"))
            .count()))
      case "bootstrap" =>
        // the native-weights Poisson bootstrap at scale: b=100 replicate
        // sums over n rows in ONE map-side-combined aggregation
        val df = spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id")), lit(1000)) / 10.0).as("x"))
        df.count()
        time(s"bootstrapMeanCI n=$n b=100")(
          println(Stats.bootstrapMeanCI(df, col("x"), col("id"), b = 100)
            .collect().mkString))
      case "maxsim" =>
        // late-interaction brute scan: n docs × 3 queries × 8×8-dim
        // token vectors = n·3·64 native dot products + the per-query
        // k-row window; corpus never shuffled
        def toks(seed: Int) = transform(sequence(lit(0), lit(7)), t =>
          transform(sequence(lit(0), lit(7)), j =>
            pmod(xxhash64(col("id"), t * 8 + j, lit(seed)), lit(1000))
              .cast("double") / 500.0 - 1.0))
        val d = spark.range(n).select(col("id"), toks(0).as("dt"))
        val q = spark.range(3).select(col("id").as("qid"), toks(1).as("qt"))
        d.count()
        time(s"maxSimTopK n=$n q=3 tokens=8x8 k=10")(
          graft.ops.Similarity.maxSimTopK(d, q, "id", "dt", "qid", "qt", k = 10)
            .agg(sum("score")).collect())
      case "linkage" =>
        // Fellegi–Sunter fit: the corpus pass is ONE map-side-combined
        // groupBy over k=4 booleans (16 patterns); EM is driver-side
        val pairs = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(10)) < 3).as("g1"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) < 5).as("g2"),
          (pmod(xxhash64(col("id"), lit(2)), lit(10)) < 2).as("g3"),
          (pmod(xxhash64(col("id"), lit(3)), lit(10)) < 6).as("g4"))
        pairs.count()
        time(s"fellegiSunter fit+score n=$n k=4 iters=5") {
          val m = graft.ops.RecordLinkage.fellegiSunterFit(
            pairs, Seq("g1", "g2", "g3", "g4"), iters = 5)
          graft.ops.RecordLinkage.fellegiSunterScore(pairs, m)
            .agg(sum("match_weight")).collect()
        }
      case "kll" =>
        // quantile fences at n rows: exact value-buffering percentile vs
        // the mergeable KLL(200) sketch path (Stats.fitQuantiles) —
        // identical call shape, one aggregation pass each
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(1000000)) / 1000000.0).as("x"))
        df.count()
        var exact: Seq[Double] = Nil
        var sk: Seq[Double] = Nil
        time(s"winsorize-fit KLL(200) n=$n") {
          sk = graft.ops.Stats.fitQuantiles(df, col("x"), Seq(0.01, 0.5, 0.99), 6, 200)
        }
        println(s"  sketch=$sk")
        // the exact path BUFFERS every value per partition — expected to
        // OOM well before 100M rows on this heap; that failure is the row
        try {
          time(s"winsorize-fit exact n=$n") {
            exact = graft.ops.Stats.fitQuantiles(df, col("x"), Seq(0.01, 0.5, 0.99), 6, 0)
          }
          println(s"  exact=$exact maxAbsErr=" +
            exact.zip(sk).map { case (e, s) => math.abs(e - s) }.max)
        } catch { case e: Throwable =>
          println(s"  exact path FAILED (expected at this n): ${e.getClass.getSimpleName}")
        }
      case "pcamoments" =>
        // centered moment pass at n rows × dim 256: the zero-fan-out
        // TypedImperativeAggregate vs the posexplode parity baseline
        // (1 + d + d(d+1)/2 = 33 153 generated rows per input row)
        val d = 256
        val df = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(d - 1)),
            i => (pmod(xxhash64(col("id"), i), lit(2000)) - 1000) / 500.0).as("v"))
          .persist()
        df.count()
        val (cnt, mean) = graft.ops.Pca.meanPass(df, col("v"), d)
        println(s"  meanPass n=$cnt")
        time(s"centered moments AGGREGATE n=$n d=$d")(
          graft.ops.Pca.centeredMoments(df, col("v"), d, mean))
        time(s"centered moments EXPLODED n=$n d=$d")(
          graft.ops.Pca.centeredMomentsExploded(df, col("v"), d, mean))
        df.unpersist()
      case "kneserney" =>
        // KN bigram LM at n docs: distinct-bigram table + three bounded
        // re-aggregations + one scoring join back
        val df = docs(n).persist(); df.count()
        time(s"bigramKneserNeyScore n=$n")(
          graft.ops.TextOps.bigramKneserNeyScore(df, "id", col("text"))
            .agg(sum("n_bigrams"), avg("ppl")).collect())
        df.unpersist()
      case "novelty" =>
        // n-gram novelty at n docs: one df count + one join back
        val df = docs(n).persist(); df.count()
        time(s"ngramNovelty n=$n")(
          graft.ops.TextOps.ngramNovelty(df, "id", col("text"), 3)
            .agg(avg("novel_ratio")).collect())
        df.unpersist()
      case "packwhole" =>
        // whole-doc greedy packing at n docs: ONE distributed prefix sum
        // -> chunk-parallel exact greedy (flatMapGroups) -> rank join
        val df = docs(n).persist()
        df.count()
        time(s"packSequencesWhole n=$n budget=2048") {
          val out = graft.ops.TextOps.packSequencesWhole(
            df, "id", col("text"), Seq(col("id")), budgetTokens = 2048)
          val stats = out.agg(count(lit(1)), countDistinct(col("bin")),
            sum("n_tokens")).head()
          println(s"  docs=${stats.getLong(0)} bins=${stats.getLong(1)} " +
            s"tokens=${stats.getLong(2)} (fill=" +
            f"${stats.getLong(2).toDouble / (stats.getLong(1) * 2048L)}%.3f)")
        }
        df.unpersist()
      case "containment" =>
        // prefix-filter containment join at n base docs + n/10 planted
        // prefix excerpts. Token ids are POWER-LAW skewed (u^3 over a
        // 50k vocab) like real text — the rarest-prefix filter depends
        // on rare shingles existing; a flat synthetic vocab would be the
        // adversarial worst case, not the representative one.
        val words = transform(
          sequence(lit(0), pmod(xxhash64(col("id")), lit(20)) + lit(20)),
          i => concat(lit("w"), floor(
            pow(pmod(xxhash64(col("id"), i), lit(1000000)) / 1e6, 3.0)
              * 50000).cast("long")))
        val base = spark.range(n).select(col("id"), array_join(words, " ").as("text"))
        val corpus = base.unionByName(
          base.where(col("id") < n / 10).select((col("id") + n).as("id"),
            array_join(slice(split(col("text"), " "), 1, 8), " ").as("text")))
          .persist()
        corpus.count()
        var found = 0L
        time(s"containmentJoin n=$n (+${n / 10} excerpts) t=0.9") {
          found = graft.ops.Dedup.containmentJoin(corpus, "id", "text",
            n = 3, threshold = 0.9).count()
        }
        println(s"  pairs found: $found (planted: ${n / 10} excerpt→base)")
        corpus.unpersist()
      case "curate" =>
        // END-TO-END batch curation funnel at scale: exact dedup →
        // MinHash-LSH near-dup clustering (keep best quality) →
        // benchmark decontamination → quality/repetition filters →
        // stratified sample → packing, ONE lazy plan driven by the
        // final count. Input: hash-soup docs with ~10% planted exact
        // dups and ~5% near dups (the curatestream generator), a
        // 200-doc benchmark for the decontamination join.
        val w5k = typedLit((0 until 5000).map(i => s"w$i"))
        def soupCol(seed: org.apache.spark.sql.Column) =
          array_join(transform(
            sequence(lit(0), pmod(xxhash64(seed), lit(20)) + lit(20)),
            t => element_at(w5k, pmod(xxhash64(seed, t), lit(5000)).cast("int") + 1)), " ")
        val m = pmod(xxhash64(col("id"), lit(99)), lit(100))
        val curDocs = spark.range(n).select(col("id"),
          when(m < 10 && col("id") > 0, soupCol(col("id") - 1))
            .when(m < 15 && col("id") > 1,
              concat(soupCol(col("id") - 2), lit(" w1 w2")))
            .otherwise(soupCol(col("id"))).as("text"),
          pmod(col("id"), lit(10)).cast("string").as("grp"))
        val bench = spark.range(200).select(soupCol(col("id") * 31 + 7).as("btext"))
        curDocs.count(); bench.count()
        time(s"curate end-to-end n=$n (dedup→cluster→decontam→filter→sample→pack)")(
          println("  packed=" + graft.pipelines.CorpusPipeline.curate(
            curDocs, "id", "text", col("grp"), bench, "btext").count()))
      case "curatestream" =>
        // end-to-end ingest admission: curateAdmitStream (exact dedup →
        // near-dup LSH → quality filters → per-group quota) over a
        // MemoryStream, n docs in 4 micro-batches — ~10% exact dups and
        // ~5% near-dups, 5-minute near-dup retention so bucket state
        // reaches steady state instead of growing with n
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx = spark.sqlContext
        import spark.implicits._
        def rnd(i: Long, j: Long): Long = { // splitmix64-style driver hash
          var z = i * 0x9E3779B97F4A7C15L + (j + 1) * 0xC2B2AE3D27D4EB4FL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        def soup(seedId: Long): String = {
          val len = 20 + math.floorMod(rnd(seedId, 0), 20).toInt
          (0 until len).map(t => "w" + math.floorMod(rnd(seedId, t + 1), 5000))
            .mkString(" ")
        }
        def text(i: Long): String = {
          val m = math.floorMod(rnd(i, 99), 100)
          if (m < 10 && i > 0) soup(i - 1) // exact dup of a neighbor's base
          else if (m < 15 && i > 1) soup(i - 2) + " w1 w2" // near dup
          else soup(i)
        }
        // the default HDFSBackedStateStoreProvider keeps every loaded
        // version ON HEAP — at 1M docs the ~2M-row LSH bucket state OOMs
        // a 24g driver. RocksDB is the production provider at this state
        // size (off-heap + spill-to-disk, incremental checkpoints).
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val t0 = 1700000000000L
        val input = MemoryStream[(Long, java.sql.Timestamp, String)]
        val admitted = graft.pipelines.CorpusPipeline.curateAdmitStream(
          input.toDF().toDF("doc_id", "ts", "text"), "ts", "doc_id", "text",
          group = pmod(col("doc_id"), lit(100)).cast("string"),
          budgetTokens = Long.MaxValue / 4,
          watermark = "10 seconds", nearDupRetentionMs = 300000L)
        var survivors = 0L
        val q = admitted.toDF().writeStream
          .foreachBatch { (b: DataFrame, _: Long) => survivors += b.count(); () }
          .start()
        val nBatches = 4
        val per = n / nBatches
        val tStart = System.nanoTime()
        (0 until nBatches).foreach { b =>
          val lo = b * per
          input.addData((lo until lo + per).map(i =>
            (i, new java.sql.Timestamp(t0 + i), text(i))))
          time(s"micro-batch ${b + 1}/$nBatches ($per docs)")(
            q.processAllAvailable())
        }
        val secs = (System.nanoTime() - tStart) / 1e9
        println(f"[probe] curatestream n=$n total=$secs%.1f s " +
          f"(${n / secs}%.0f docs/s), survivors=$survivors")
        val so = q.lastProgress.stateOperators
        so.foreach(s => println(s"  state op ${s.operatorName}: " +
          s"rows=${s.numRowsTotal} mem=${s.memoryUsedBytes / (1 << 20)} MiB"))
        q.stop()
      case "curaterecover" =>
        // crash-recovery of the 4-operator ingest admission at state
        // SCALE (StreamRecoverySpec pins semantics on 7 docs; this
        // measures the operational number a 100 TB ingest cares about:
        // restart-to-caught-up latency with millions of state rows).
        // n docs over 3 committed batches → hard stop → one more batch
        // (10% dups of pre-crash docs) → restart from the checkpoint:
        // time = RocksDB restore + replay of the uncommitted batch;
        // exactly-once checked on the file sink's committed output.
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        implicit val sqlCtx = spark.sqlContext
        import spark.implicits._
        def rnd2(i: Long, j: Long): Long = {
          var z = i * 0x9E3779B97F4A7C15L + (j + 1) * 0xC2B2AE3D27D4EB4FL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        def soup2(seedId: Long): String = {
          val len = 20 + math.floorMod(rnd2(seedId, 0), 20).toInt
          (0 until len).map(t => "w" + math.floorMod(rnd2(seedId, t + 1), 5000))
            .mkString(" ")
        }
        def text2(i: Long): String = {
          val m = math.floorMod(rnd2(i, 99), 100)
          if (m < 10 && i > 0) soup2(i - 1) else soup2(i)
        }
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val recRoot = java.nio.file.Files.createTempDirectory("curaterec")
        val recOut = recRoot.resolve("out").toString
        val recCp = recRoot.resolve("cp").toString
        val t0r = 1700000000000L
        val recIn = MemoryStream[(Long, java.sql.Timestamp, String)]
        def startRec() = graft.pipelines.CorpusPipeline.curateAdmitStream(
            recIn.toDF().toDF("doc_id", "ts", "text"), "ts", "doc_id", "text",
            group = pmod(col("doc_id"), lit(100)).cast("string"),
            budgetTokens = Long.MaxValue / 4,
            watermark = "10 seconds", nearDupRetentionMs = 600000L)
          .toDF().writeStream.format("parquet")
          .option("path", recOut).option("checkpointLocation", recCp)
          .start()
        val per3 = n / 4
        val q1r = startRec()
        (0 until 3).foreach { b =>
          val lo = b * per3
          recIn.addData((lo until lo + per3).map(i =>
            (i, new java.sql.Timestamp(t0r + i), text2(i))))
          time(s"pre-crash batch ${b + 1}/3 ($per3 docs)")(
            q1r.processAllAvailable())
        }
        q1r.stop() // hard stop: state survives only via the checkpoint
        // the post-crash batch: 10% exact dups of committed docs — these
        // must be dropped by RESTORED dedup state, not fresh state
        val lo4 = 3 * per3
        recIn.addData((lo4 until lo4 + per3).map { i =>
          val dup = math.floorMod(rnd2(i, 7), 10) == 0
          val txt = if (dup) text2(math.floorMod(rnd2(i, 8), lo4)) else text2(i)
          (i, new java.sql.Timestamp(t0r + i), txt)
        })
        val tRec = System.nanoTime()
        val q2r = startRec()
        q2r.processAllAvailable()
        println(f"[probe] curaterecover n=$n restart+catchup=" +
          f"${(System.nanoTime() - tRec) / 1e9}%.1f s " +
          s"(restore ${q2r.lastProgress.stateOperators.map(_.numRowsTotal).sum} state rows + replay $per3 docs)")
        q2r.stop()
        val outDf = spark.read.parquet(recOut)
        val nAdm = outDf.count()
        val nDistinct = outDf.select("id").distinct().count()
        println(s"  admitted=$nAdm distinct=$nDistinct exactly_once=${nAdm == nDistinct}")
        require(nAdm == nDistinct, "duplicate admissions after restart")
      case "corpusdiff" =>
        // two n-row snapshots: 10% of ids edited, 5% only in prev, 5%
        // only in next — hash-keyed full-outer join over (id, md5) only
        val prev = docs(n).where(pmod(xxhash64(col("id"), lit(9)), lit(20)) =!= 0)
        val next = docs(n).where(pmod(xxhash64(col("id"), lit(9)), lit(20)) =!= 1)
          .withColumn("text", when(pmod(xxhash64(col("id"), lit(8)), lit(10)) === 0,
            concat(col("text"), lit(" edit"))).otherwise(col("text")))
        prev.count(); next.count()
        time(s"corpusDiff n=$n (10% changed, 5% add/remove)")(
          Dedup.corpusDiff(prev, next, "id", "text")
            .groupBy("status").count().collect().foreach(r => println("  " + r)))
      case "bitext" =>
        // two corpora of n vectors each with 512 PLANTED shared topic
        // clusters (cluster centroid from the hash, ±10% per-row jitter)
        // — uniform hash-soup is the wrong fixture here: all-positive
        // uniform vectors sit at cosine ≈ 0.75 from EVERYTHING, k-means
        // collapses to one mega-cell, and the cell-keyed join degenerates
        // to near-all-pairs (measured: the 300k probe died in one
        // mega-cell shuffle). Real embeddings cluster; so does this.
        // dim argv[2] (default 16); nCells = n/100 (~100-row cells),
        // nProbe = 5 — the production recall regime (exact nProbe =
        // nCells is the oracle's job). Candidate volume = 2 legs × n ×
        // nProbe × ~100 scalar-only rows through the WindowGroupLimit
        // partial top-k (knnJoin drops the vectors before the sort).
        val dim = args.lift(2).map(_.toInt).getOrElse(16)
        val dims = sequence(lit(0), lit(dim - 1))
        def evecs(seed: Int) = spark.range(n).select(col("id"),
          transform(dims, i => {
            val cluster = pmod(xxhash64(pmod(col("id"), lit(512)), i), lit(1000))
              .cast("double") / 1000.0
            val jitter = pmod(xxhash64(col("id"), i, lit(seed)), lit(200))
              .cast("double") / 1000.0
            cluster + jitter + 0.001
          }).as("v"))
        val l = evecs(1).withColumnRenamed("id", "src_id")
        val r = evecs(2)
        l.count(); r.count()
        val nCells = math.max(4, (n / 100).toInt)
        time(s"bitextMarginMine n=${n}x$n dim=$dim nCells=$nCells k=4 nProbe=5")(
          graft.ops.Similarity.bitextMarginMine(l, "src_id", "v", r, "id", "v",
              k = 4, threshold = 0.0, nCells = nCells, nProbe = 5, iters = 1)
            .agg(count(lit(1)), sum("margin")).collect()
            .foreach(row => println("  " + row)))
      case "heaps" =>
        // Heaps'-law fit over n hash-soup docs: min/max probe + one
        // vocabulary first-appearance agg + one conditional-sum agg
        val d = docs(n)
        d.count()
        time(s"heapsFit n=$n checkpoints=10")(
          TextOps.heapsFit(d, col("id"), col("text"), nCheckpoints = 10)
            .collect().foreach(row => println("  " + row)))
      case "pmi" =>
        // PMI collocations over n hash-soup docs: one bigram + one
        // unigram count, vocab-sized joins, TakeOrdered top-k
        val d = docs(n)
        d.count()
        time(s"pmiPairs n=$n minCount=1000 topK=20")(
          TextOps.pmiPairs(d, col("text"), minCount = 1000L, topK = 20)
            .agg(count(lit(1)), sum("pmi")).collect()
            .foreach(row => println("  " + row)))
      case "distinctn" =>
        // lexical-diversity stats over n hash-soup docs: one scan + one
        // gram-keyed two-phase distinct per requested n
        val d = docs(n)
        d.count()
        time(s"distinctNgramStats n=$n ns=1,2,3")(
          TextOps.distinctNgramStats(d, col("text"), Seq(1, 2, 3))
            .collect().foreach(row => println("  " + row)))
      case "kcore" =>
        // n edges over n/10 nodes, hash-soup topology, k tuned so the
        // peel actually iterates; distributed regime forced
        val nNodes = math.max(n / 10, 10L)
        val edges = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("s"),
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("d"))
        edges.count()
        val k = args.lift(2).map(_.toInt).getOrElse(18)
        time(s"kCore edges=$n nodes=$nNodes k=$k (distributed)")(
          graft.ops.Graph.kCore(edges, "s", "d", k = k,
              localEdgeThreshold = 0)
            .agg(count(lit(1)), sum("deg")).collect()
            .foreach(row => println("  " + row)))
      case "hits" =>
        val nNodes = math.max(n / 10, 10L)
        val edges = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("s"),
          pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("d"))
        edges.count()
        time(s"hits edges=$n nodes=$nNodes iters=3 (distributed)")(
          graft.ops.Graph.hits(edges, "s", "d", iterations = 3,
              localEdgeThreshold = 0)
            .agg(sum("hub"), sum("auth")).collect())
      case "chi2" =>
        // 100 groups x 50 categories over n rows: collapses to 5000
        // cells in one map-side-combined pass
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(100)).as("g"),
          pmod(xxhash64(col("id"), lit(1)), lit(50)).as("c"))
        df.count()
        time(s"chi2Drift n=$n grid=100x50")(
          Stats.chi2Drift(df, col("g"), col("c")).collect()
            .foreach(row => println("  " + row)))
      case "mannwhitney" =>
        // heavy ties: values quantized to 10k distinct levels, so the
        // rank window runs over 10k rows regardless of n
        val df = spark.range(n).select(
          when(pmod(xxhash64(col("id")), lit(2)) === 0, "a").otherwise("b").as("g"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 7.0).as("v"))
        df.count()
        time(s"mannWhitneyU n=$n distinct=10000")(
          Stats.mannWhitneyU(df, col("v"), col("g"), "a", "b").collect()
            .foreach(row => println("  " + row)))
      case "tcloseness" =>
        // 1000 QI groups x 50 sensitive values over n rows: the grid is
        // 50k rows, everything upstream map-side combined
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(1000)).as("q"),
          concat(lit("s"), pmod(xxhash64(col("id"), lit(1)), lit(50))).as("sv"))
        df.count()
        time(s"tCloseness n=$n groups=1000 domain=50")(
          Stats.tCloseness(df, Seq("q"), "sv", t = 0.1, ordered = true)
            .agg(count(lit(1)), sum(col("at_risk").cast("long")),
              sum("emd")).collect()
            .foreach(row => println("  " + row)))
      case "matryoshka" =>
        // n corpus vectors x dim 64, 16 query vectors, 4 prefix budgets:
        // 5 broadcast brute passes over the corpus
        val dim = 64
        def vecs(rows: Long) = spark.range(rows).select(col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0)
            .as("v"))
        val corpus = vecs(n).persist()
        corpus.count()
        val queries = vecs(16).select(col("id").as("qid"), col("v").as("qv"))
        time(s"matryoshkaRecall n=$n dim=$dim k=10 dims=8,16,32,64")(
          graft.ops.Similarity.matryoshkaRecall(corpus, queries, "id", "v",
              "qid", "qv", k = 10, dims = Seq(8, 16, 32, 64))
            .collect().foreach(row => println("  " + row)))
      case "bradleyterry" =>
        // n comparisons over 64 items, planted BT ground truth
        // P(a beats b) = (a+1)/(a+b+2); the log collapses to <= 64^2
        // matchup rows in one map-side-combined pass
        val df = spark.range(n).select(col("id"),
          pmod(xxhash64(col("id")), lit(64)).as("a"),
          (pmod(xxhash64(col("id")), lit(64)) + 1 +
            pmod(xxhash64(col("id"), lit(1)), lit(63))) % 64 as "b")
          .withColumn("aw", pmod(xxhash64(col("id"), lit(2)),
            col("a") + col("b") + 2) < col("a") + 1)
          .select(
            concat(lit("m"), when(col("aw"), col("a")).otherwise(col("b"))).as("w"),
            concat(lit("m"), when(col("aw"), col("b")).otherwise(col("a"))).as("l"))
        df.count()
        time(s"bradleyTerry n=$n items=64 iters=20")(
          graft.ops.Eval.bradleyTerry(df, col("w"), col("l"), iterations = 20)
            .agg(count(lit(1)), sum("n_games")).collect()
            .foreach(row => println("  " + row)))
      case "conformal" =>
        // n calibration residuals; exact rank-k via percentile_disc vs
        // the KLL path (argv[2] = sketchK, default both)
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(100000)) / 7.0).as("y"),
          lit(0.0).as("yhat"))
        df.count()
        time(s"conformalFit n=$n exact percentile_disc") {
          val q = Stats.conformalFit(df, col("y"), col("yhat"), alpha = 0.125)
          println(s"  qhat=$q")
        }
        time(s"conformalFit n=$n sketchK=200") {
          val q = Stats.conformalFit(df, col("y"), col("yhat"), alpha = 0.125,
            sketchK = 200)
          println(s"  qhat=$q")
        }
      case "clustereval" =>
        // n rows, 10k pred x 2-per-pred truth clusters: the pair counts
        // are cell-size algebra — no pair is ever materialized
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(10000)).as("p"),
          (pmod(xxhash64(col("id")), lit(10000)) * 2 +
            pmod(xxhash64(col("id"), lit(1)), lit(2))).as("t"))
        df.count()
        time(s"clusterAgreement n=$n cells<=20k")(
          Stats.clusterAgreement(df, col("p"), col("t")).collect()
            .foreach(row => println("  " + row)))
      case "mondrian" =>
        // n rows x 2 QI dims, k = n/2000 -> ~1000 leaves; distributed
        // BFS regime forced (per round: two leaf-collected aggregations)
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(100000)) / 7.0).as("v1"),
          pmod(xxhash64(col("id"), lit(1)), lit(9973)).cast("double").as("v2"))
        df.count()
        val k = math.max((n / 2000).toInt, 2)
        time(s"mondrianFit n=$n dims=2 k=$k (distributed)") {
          val m = graft.ops.Mondrian.fit(df, Seq("v1", "v2"), k = k,
            localRowThreshold = 0)
          println(s"  leaves=${m.nLeaves} rounds=${m.rounds.size} " +
            s"minLeaf=${if (m.leaves.isEmpty) 0 else m.leaves.map(_._2).min}")
        }
      case "survival" =>
        // n subjects (100k distinct durations, 30% censored) through
        // Kaplan-Meier, and n events / n/200 entities / 8 weekly periods
        // through the cohort matrix — both collapse to bounded tables
        val subj = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(100000)).cast("double").as("dur"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) >= 3).as("ev"))
        subj.count()
        time(s"kaplanMeier n=$n distinct_t<=100k")(
          println("  rows=" + Stats.kaplanMeier(subj, col("dur"),
            col("ev")).count()))
        val ev = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n / 200)).as("u"),
          pmod(xxhash64(col("id"), lit(2)), lit(8L * 604800000000L))
            .as("ts"))
        ev.count()
        time(s"cohortRetention n=$n entities=${n / 200} periods=8")(
          println("  cells=" + Stats.cohortRetention(ev, col("u"),
            col("ts"), periodUs = 604800000000L, maxOffset = 7).count()))
        val xy = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(100000)).cast("double").as("x"),
          (pmod(xxhash64(col("id")), lit(100000)) * 3
            + pmod(xxhash64(col("id"), lit(3)), lit(1000))).cast("double")
            .as("y"))
        xy.count()
        time(s"spearman n=$n distinct<=100k per side")(
          Stats.spearman(xy, col("x"), col("y")).collect()
            .foreach(r => println("  " + r)))
      case "unigram" =>
        // n docs × 20 words drawn from a ~200k-word synthetic vocabulary
        // (base-26 hash strings, len 4-8 — Heaps-realistic, unlike the
        // 50-word soup): the corpus collapses to its distinct word table
        // once; seeding + every EM iteration run over that bounded table
        val w = transform(sequence(lit(0), lit(19)), i => {
          val wid = pmod(xxhash64(col("id"), i), lit(200000L))
          array_join(transform(sequence(lit(0),
            pmod(wid, lit(5)).cast("int") + lit(3)), j =>
            char(pmod(xxhash64(wid, j), lit(26)) + lit(97))), "")
        })
        val d = spark.range(n).select(col("id"),
          array_join(w, " ").as("text"))
        d.count()
        time(s"unigramTrain n=$n docs, vocab 2000, 2 EM iters") {
          val m = graft.ops.UnigramLm.unigramTrain(d, col("text"),
            vocabSize = 2000, maxPieceLen = 4, iters = 2, seedSize = 8000)
          println(s"  pieces=${m.pieces.size}")
          time(s"unigramScore n=$n docs")(
            println("  scored=" + graft.ops.UnigramLm
              .unigramScore(d, "id", col("text"), m)
              .agg(sum("n_pieces")).head().get(0)))
        }
      case "dq" =>
        // n-row table, 6 fused row-local rules + 1 FK anti-join against
        // an n/10-key dimension: rules add COLUMNS to one aggregation,
        // not scans
        import graft.ops.DataQuality.Rule._
        val t = spark.range(n).select(col("id"),
          pmod(xxhash64(col("id")), lit(n / 10)).as("fk"),
          (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 10.0).as("v"),
          when(pmod(xxhash64(col("id"), lit(2)), lit(100)) === 0,
            lit(null).cast("string")).otherwise(lit("ok")).as("s"))
        val dim = spark.range(n / 10).select(col("id").as("k"))
        t.count(); dim.count()
        time(s"dataQuality n=$n rules=7 (+FK vs ${n / 10}-key dim)")(
          graft.ops.DataQuality.check(t, Seq(
            NotNull("id"), NotNull("s", minFrac = 0.95),
            Unique(Seq("id")), InRange("v", 0.0, 99.0, minFrac = 0.95),
            MatchesRegex("s", "^ok$", minFrac = 0.95),
            RowCountBetween(1L, Long.MaxValue),
            RefIntegrity("fk", dim, "k")))
            .collect().foreach(r => println("  " + r)))
      case "sft" =>
        // n turns over n/8 conversations (8-turn dialogues): flatten +
        // spans ride ONE conversation-keyed shuffle each; then n
        // responses over n/16 prompts through the pref-pair aggregation
        val t = docs(n).select(
          pmod(col("id"), lit(n / 8)).as("conv"),
          floor(col("id") / (n / 8)).cast("long").as("idx"),
          when(floor(col("id") / (n / 8)).cast("long") % 2 === 0, "user")
            .otherwise("assistant").as("role"),
          col("text"))
        t.count()
        time(s"sft flatten+spans n=$n convs=${n / 8}") {
          val f = graft.ops.Sft.flattenDialogues(t, "conv", "idx",
            "role", "text").agg(sum("n_tokens")).collect()
          val sp = graft.ops.Sft.lossSpans(t, "conv", "idx", "role",
            "text").where(col("mask")).count()
          println(s"  tokens=${f.head.get(0)} masked_turns=$sp")
        }
        val scored = spark.range(n).select(
          pmod(col("id"), lit(n / 16)).as("p"), col("id").as("r"),
          (pmod(xxhash64(col("id")), lit(1000000)) / 1000000.0).as("s"))
        scored.count()
        time(s"sft prefPairs n=$n prompts=${n / 16}")(
          println("  pairs=" + graft.ops.Sft.preferencePairs(scored,
            "p", "r", col("s"), minMargin = 0.1).count()))
      case "rm3" =>
        // n word-soup docs, 3 queries: feedback stage is queries×fbDocs,
        // the two corpus passes are the matched-postings scans
        val d = docs(n)
        d.count()
        time(s"rm3TopK n=$n queries=3 fbDocs=5 fbTerms=8")(
          graft.ops.Retrieval.rm3TopK(d, "id", col("text"),
            Seq("q1" -> "w1 w2 w3", "q2" -> "w10 w20", "q3" -> "w5 w25 w45"),
            k = 10).count())
      case "ql" =>
        // Dirichlet QL over the same worst-case soup as the bm25 probe
        // (every term in-vocabulary — the postings shuffle is the whole
        // token stream, bounding the isin prefilter from above)
        val d = docs(n)
        d.count()
        time(s"qlTopK n=$n queries=3 k=10")(
          graft.ops.Retrieval.qlTopK(d, "id", col("text"),
            Seq("q1" -> "w1 w7 w13", "q2" -> "w2 w25", "q3" -> "w3 w30 w44 w49"),
            k = 10).agg(count(lit(1)), sum("score")).collect())
      case "entropy" =>
        // per-doc token entropy: the shuffle carries distinct (doc, term)
        // pairs (≤ 50 per doc here), never the raw token stream
        val d = docs(n)
        d.count()
        time(s"tokenEntropy n=$n")(
          graft.ops.TextOps.tokenEntropy(d, "id", col("text"))
            .agg(sum("entropy"), sum("n_distinct")).collect())
      case "lenbatch" =>
        // length-sorted batching: 64 shards, windows within shard only —
        // wall-time tracks the largest shard (n/64), not n
        val d = docs(n).withColumn("shard",
          pmod(xxhash64(col("id"), lit(5)), lit(64)).cast("string"))
        d.count()
        time(s"lengthSortedBatches n=$n shards=64 batch=1024")(
          graft.ops.TextOps.lengthSortedBatches(d, "id", col("text"),
              col("shard"), batchSize = 1024)
            .agg(sum("pad_tokens"), max("batch_id")).collect())
      case "scd2" =>
        // n-row change log over n/10 keys (~10 versions each), attrs
        // flip on ~1/3 of rows — two windows over ONE key shuffle
        val log = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n / 10)).as("k"),
          col("id").as("ts"),
          pmod(xxhash64(col("id"), lit(1)), lit(3)).cast("string").as("attr"))
        log.count()
        time(s"scd2 n=$n keys=${n / 10}")(
          println("  versions=" + graft.ops.Changelog
            .scd2(log, "k", "ts", Seq("attr")).count()))
      case "cdc" =>
        // n-row log (10% tombstones) onto an n/2-row base snapshot:
        // one window collapse + one full-outer join
        val base = spark.range(n / 2).select(col("id").as("k"),
          lit("base").as("attr"), lit(0.0).as("v"))
        val log = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n)).as("k"),
          col("id").as("ts"),
          when(pmod(xxhash64(col("id"), lit(2)), lit(10)) === 0, "D")
            .otherwise("U").as("op"),
          lit("upd").as("attr"),
          (pmod(xxhash64(col("id"), lit(3)), lit(1000)) / 10.0).as("v"))
        base.count(); log.count()
        time(s"cdcMerge log=$n base=${n / 2} (10% deletes)")(
          println("  snapshot=" + graft.ops.Changelog
            .cdcMerge(base, log, "k", "ts", "op", Seq("attr", "v")).count()))
      case "funnel" =>
        // n events over n/100 entities, 5 event types: k−1 id-keyed
        // joins of per-step min aggregates, no window over raw events
        val types = typedLit(Seq("s", "a", "b", "c", "d"))
        val ev = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n / 100)).as("u"),
          col("id").as("ts"),
          element_at(types,
            pmod(xxhash64(col("id"), lit(1)), lit(5)).cast("int") + 1)
            .as("et"))
        ev.count()
        time(s"funnel n=$n entities=${n / 100} steps=3")(
          Stats.funnel(ev, col("u"), col("ts"), col("et"),
            Seq("s", "a", "b"), maxSpan = n.toDouble)
            .collect().foreach(r => println("  " + r)))
      case "purgedsplit" =>
        // n rows; KLL-sketch fold bounds (the 100 TB path — exact
        // percentile would buffer every value), role assignment pure
        // projection
        val df = spark.range(n).select(col("id"),
          (col("id") * 13 % 1000000007L).cast("double").as("ts"))
        df.count()
        time(s"purgedTimeSplit n=$n folds=5 (KLL bounds)")(
          graft.ops.ChronoSplit.purgedTimeSplit(df, col("ts"), nFolds = 5,
            evalFold = 2, embargo = 1e6, sketchK = 200)
            .groupBy("role").count().collect()
            .foreach(r => println("  " + r)))
      case "chronoskew" =>
        // G1 monster-group shape (reference func_preproc.py:154-203 run
        // against a dominant (Attack,State) pair): ONE group holds 90%
        // of n rows, the rest spread over 50 tail groups, ts duplicated
        // 4-ways so ties are real. AQE splits skewed JOINS, not window
        // partitions — the plain form funnels 0.9n rows through one
        // task; the salted form range-buckets the order key first. A
        // listener records the longest task of each run (the number the
        // SCALE.md row needs: wall-time can hide a straggler behind the
        // tail groups' parallelism).
        val g = when(pmod(xxhash64(col("id")), lit(10)) < 9, lit("monster"))
          .otherwise(concat(lit("g"),
            pmod(xxhash64(col("id"), lit(1)), lit(50))))
        val df = spark.range(n).select(g.as("g"),
          (col("id") / 4).cast("long").as("t"), col("id"))
        df.count()
        val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              if (t.taskInfo != null)
                maxTask.getAndAccumulate(t.taskInfo.duration, math.max)
          })
        maxTask.set(0)
        time(s"withSplit (plain window) n=$n monster=90%")(
          graft.ops.ChronoSplit.withSplit(df, Seq("g"),
              Seq(col("t"), col("id")))
            .groupBy("split").count().collect()
            .foreach(r => println("  " + r)))
        println(f"  max task: ${maxTask.get / 1000.0}%.1f s")
        maxTask.set(0)
        time(s"withSplitSalted n=$n buckets=32")(
          graft.ops.ChronoSplit.withSplitSalted(df, Seq("g"), col("t"),
              Seq(col("id")), buckets = 32)
            .groupBy("split").count().collect()
            .foreach(r => println("  " + r)))
        println(f"  max task: ${maxTask.get / 1000.0}%.1f s")
      case "widehost" =>
        // F6/F7 at the reference's REAL frame width — ~900 numeric
        // columns (func_preproc.py:554-560) — to pin the chunk size the
        // 200-col WideHostFrameSpec can't see. constantColumns is the
        // hard one: k countDistinct aggs rewrite into an Expand(k) row
        // fan-out, so one-pass at 900 cols pushes 900n rows through the
        // aggregate; chunking trades that for #chunks scans. nearEmpty
        // (avg-of-isNull) has no Expand and should stay one-pass.
        val nCols = args.lift(2).map(_.toInt).getOrElse(900)
        val exprs = (0 until nCols).map { j =>
          val v: org.apache.spark.sql.Column =
            if (j % 31 == 0) lit(1.0) // truly constant cols to find
            else if (j % 31 == 1) lit(null).cast("double") // all-null constants
            else when(
              pmod(xxhash64(col("id"), lit(j + 100000)), lit(100)) === 0,
              lit(null).cast("double"))
              .otherwise(pmod(xxhash64(col("id"), lit(j)), lit(500)) / 10.0)
          v.as(s"c$j")
        }
        // materialize to parquet and re-scan (the real host frame is a
        // file scan; a memory-cached 900-field frame at 2M+ rows starves
        // the execution pool and fails UNABLE_TO_ACQUIRE_MEMORY)
        val wideDir = java.nio.file.Files
          .createTempDirectory("graft_widehost").toString
        spark.range(n).select(col("id") +: exprs: _*)
          .write.mode("overwrite").parquet(wideDir)
        val df = spark.read.parquet(wideDir)
        val names = (0 until nCols).map(j => s"c$j")
        // the k-countDistinct Expand is quadratic in chunk width (k rows
        // out per input × k-wide projections) — one-pass at 900 cols
        // OOMs a 48g heap at 200k rows, so the exact form is only probed
        // chunked; the min/max fast path is the one-pass answer
        // cell budget: each chunk costs n × chunk² projected cells, the
        // whole sweep n × nCols × chunk — past ~2e10 cells the exact
        // form stops being a probe and becomes the finding itself
        if (n * nCols.toLong * 40L <= 2e10)
          for (chunk <- Seq(100, 40).filter(_ <= nCols)) {
            time(s"constantColumns(exact distinct) n=$n cols=$nCols chunk=$chunk")(
              println("  constants=" + names.grouped(chunk)
                .flatMap(b => Stats.constantColumns(df, b)).size))
          }
        else println(s"  [skip] exact-distinct chunk sweep at n=$n cols=$nCols " +
          "(quadratic Expand: measured 70.8 s at n=50k cols=300 chunk=40)")
        time(s"constantColumnsFast n=$n cols=$nCols ONE pass")(
          println("  constants=" + Stats.constantColumnsFast(df, names).size))
        // chunked fast path: ≤ ~33 cols keeps the 3-agg buffer under the
        // 100-field codegen fallback AND prunes the parquet scan to the
        // chunk's columns — same column-bytes total, codegen'd folds
        for (chunk <- Seq(100, 30)) {
          time(s"constantColumnsFast n=$n cols=$nCols chunk=$chunk")(
            println("  constants=" + names.grouped(chunk)
              .flatMap(b => Stats.constantColumnsFast(df, b)).size))
        }
        time(s"nearEmptyColumns n=$n cols=$nCols one-pass")(
          println("  nearEmpty=" + Stats.nearEmptyColumns(df, names, 0.5).size))
      case "pcasweep" =>
        // Jacobi/eigensolver partitioning sweep at 10M+ rows (VERDICT r9
        // #10): fit the d=64 PCA under 4 vs 32 input partitions. The
        // 9-dp covariance snap must make axes/eigenvalues BIT-identical;
        // the stored (unsnapped) mean may wobble at ~1e-15, which the
        // 4-dp projection face can't see — both claims checked here.
        val dim = 64
        val dims = sequence(lit(0), lit(dim - 1))
        val vecs = spark.range(n).select(col("id"),
          transform(dims, i => pmod(xxhash64(col("id"), i), lit(2000))
            .cast("double") / 1000.0 - 1.0).as("v"))
        def fit(parts: Int): graft.ops.Pca.PcaModel = {
          val in = vecs.repartition(parts).localCheckpoint()
          var m: graft.ops.Pca.PcaModel = null
          time(s"pcaFit n=$n d=$dim k=8 parts=$parts") {
            m = graft.ops.Pca.pcaFit(in, col("v"), dim, 8)
          }
          m
        }
        val m4 = fit(4)
        val m32 = fit(32)
        val axesBitEqual =
          m4.eigenvalues.sameElements(m32.eigenvalues) &&
          m4.components.zip(m32.components).forall {
            case (a, b) => a.sameElements(b) }
        val meanWobble = m4.mean.zip(m32.mean)
          .map { case (a, b) => math.abs(a - b) }.max
        println(s"  axes+eigenvalues bit-identical: $axesBitEqual; " +
          f"max |mean wobble| = $meanWobble%.3e")
        require(axesBitEqual, "partitioning moved the snapped axes")
        require(meanWobble < 1e-9, s"mean wobble $meanWobble above the 4-dp-invisible bound")
      case "experiment" =>
        // The round-10 experimentation family at scale: n raw events,
        // n/10 units, arms by unit parity, 35 covariate cells. Every op
        // is one keyed aggregation (+ a bounded-frame epilogue), so the
        // cost must track the plain groupBy baseline, not exceed it.
        val ev = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n / 10)).as("user_id"),
          pmod(xxhash64(col("id"), lit(1)), lit(5)).as("etype"),
          (pmod(xxhash64(col("id"), lit(2)), lit(100000)) / 100.0).as("value"),
          (pmod(xxhash64(col("id"), lit(3)), lit(2)) === 0).as("post"))
        ev.count()
        time(s"srmCheck n=$n arms=3")(
          graft.ops.Experiment.srmCheck(ev,
            concat(lit("arm_"), pmod(col("user_id"), lit(3))),
            Seq("arm_0" -> 1.0, "arm_1" -> 1.0, "arm_2" -> 1.0)).collect())
        time(s"ipwAte n=$n cells=35")(
          graft.ops.Experiment.ipwAte(ev, pmod(col("user_id"), lit(2)) === 1,
            col("value"),
            Seq(col("etype"), pmod(col("user_id"), lit(7)))).collect())
        time(s"diffInDiff n=$n")(
          graft.ops.Experiment.diffInDiff(ev,
            pmod(col("user_id"), lit(2)) === 1, col("post"),
            col("value")).collect())
        time(s"cuped n=$n units=${n / 10}") {
          val per = ev.groupBy("user_id").agg(
            coalesce(sum(when(col("post"), col("value"))), lit(0.0)).as("y"),
            coalesce(sum(when(!col("post"), col("value"))), lit(0.0)).as("x"))
            .withColumn("arm", pmod(col("user_id"), lit(2)))
          graft.ops.Experiment.cuped(per, col("arm"), col("x"), col("y"))
            .collect()
        }
        time(s"olsPerGroup n=$n groups=5")(
          graft.ops.Experiment.olsPerGroup(ev, col("etype"),
            col("value"), col("user_id").cast("double")).collect())
      case "negsample" =>
        // Negative sampling's two phases measured apart: the bounded
        // vocab/CDF fit over 1M docs (4096-word vocabulary so the
        // binary-search depth is real), then the pure per-row map
        // (hash → mod → log V CdfIndex lookup) over n anchors — the
        // phase that runs at corpus scale and must stay shuffle-free.
        val corpus = spark.range(1000000L).select(col("id"),
          array_join(transform(sequence(lit(0), lit(29)), i =>
            concat(lit("w"), pmod(xxhash64(col("id"), i), lit(4096)))), " ")
            .as("text"))
        corpus.count()
        val anchors = spark.range(n).select(col("id"))
        anchors.count()
        time(s"negativeSample fit+draws anchors=$n V=4096 k=5")(
          Stats.negativeSample(corpus, col("text"), anchors, col("id"),
              vocabSize = 4096, k = 5, seed = 7L, grid = 64L)
            .agg(count(lit(1)), countDistinct(col("neg_token"))).collect())
      case "moorelewis" =>
        // Moore–Lewis at n docs: one tokenize pass, conditional count
        // table, one token join back. in-domain = 10% of docs.
        val d = docs(n)
        d.count()
        time(s"crossEntropyDiff n=$n")(
          graft.ops.TextOps.crossEntropyDiff(d, "id", col("text"),
              pmod(col("id"), lit(10)) === 0)
            .agg(avg("ml_score"), count(lit(1))).collect())
      case "linkpred" =>
        // Wedge-join link prediction on an n-edge bounded-degree graph
        // (ring + hash chords over n/10 nodes, degree ~20) plus one
        // 50k-degree hub, with and without the hub cut — the cut must
        // remove the quadratic wedge blow-up, not just relabel it.
        val nodes = n / 10
        val base = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nodes)).as("s"),
          pmod(xxhash64(col("id"), lit(1)), lit(nodes)).as("d"))
        val hub = spark.range(50000).select(lit(nodes).as("s"),
          pmod(xxhash64(col("id"), lit(2)), lit(nodes)).as("d"))
        val edges = base.unionAll(hub).where(col("s") =!= col("d"))
        edges.count()
        time(s"linkPrediction edges=$n+hub maxDegree=1000")(
          graft.ops.Graph.linkPrediction(edges, "s", "d", maxDegree = 1000)
            .agg(count(lit(1)), max("common_neighbors")).collect())
      case "wordpiece" =>
        // WordPiece encode at n docs: closure-shipped vocab, pure map.
        val d = docs(n)
        d.count()
        val vocab = graft.ops.TextOps.wordpieceVocabFit(
          d.limit(100000), col("text"), topWords = 4096, minCharCount = 5L)
        time(s"wordpieceEncode n=$n V=${vocab.size}")(
          graft.ops.TextOps.wordpieceEncode(d, col("text"), vocab)
            .agg(sum("wp_n_tokens"), sum("wp_n_unk_words")).collect())
      case "msprt" =>
        // mSPRT at n events / 365 daily looks: one period aggregation,
        // windows over the bounded period table.
        val ev = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(365)).as("day"),
          when(pmod(xxhash64(col("id"), lit(1)), lit(2)) === 0, "a")
            .otherwise("b").as("arm"),
          (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 10.0
            + when(pmod(xxhash64(col("id"), lit(1)), lit(2)) === 0, 0.0)
              .otherwise(0.5)).as("y"))
        ev.count()
        time(s"msprt n=$n periods=365")(
          graft.ops.Experiment.msprt(ev, col("arm"), col("day"), col("y"),
            "a", "b", tau2 = 1.0).collect())
      case "walks" =>
        // DeepWalk corpus generation: n-edge bounded-degree graph
        // (n/10 nodes, deg≈20), 2 walks × 10 steps per node — walkLen
        // joins against the checkpointed rank-indexed adjacency.
        val nodes = n / 10
        val edges = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nodes)).as("s"),
          pmod(xxhash64(col("id"), lit(1)), lit(nodes)).as("d"))
        edges.count()
        time(s"randomWalks edges=$n walkLen=10 walksPerNode=2")(
          graft.ops.Graph.randomWalks(edges, "s", "d", walkLen = 10,
              walksPerNode = 2, seed = 3L)
            .agg(count(lit(1)), max("step")).collect())
        time(s"node2vecWalks edges=$n walkLen=10 walksPerNode=2")(
          graft.ops.Graph.node2vecWalks(edges, "s", "d", walkLen = 10,
              walksPerNode = 2, p = 0.5, q = 2.0, seed = 3L)
            .agg(count(lit(1)), max("step")).collect())
      case "attribution" =>
        // Last-touch attribution over n events / n/10 users, 5% of
        // events conversions: one entity-partitioned window + one
        // entity-keyed join — no global sort anywhere.
        val ev = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(n / 10)).as("u"),
          pmod(xxhash64(col("id"), lit(1)), lit(2592000000L)).as("t"),
          pmod(col("id"), lit(1L << 20)).as("tie"),
          (pmod(xxhash64(col("id"), lit(2)), lit(20)) === 0).as("conv"),
          concat(lit("ch"), pmod(xxhash64(col("id"), lit(3)), lit(5)))
            .as("label"),
          (pmod(xxhash64(col("id"), lit(4)), lit(1000)) / 10.0).as("v"))
        ev.count()
        time(s"lastTouchAttribution n=$n users=${n / 10}")(
          graft.ops.Sessionize.lastTouchAttribution(ev, col("u"), col("t"),
              col("tie"), col("conv"), col("label"), col("v"),
              lookback = 86400000L)
            .groupBy("touch_label").agg(count(lit(1)), sum("value"))
            .collect())
      case "quantileci" =>
        // Order-statistic quantile bracket at n rows: the value column
        // collapses to ≤100k distinct (ROC-collapse) before any window.
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("v"))
        df.count()
        time(s"quantileCI n=$n distinct=100k")(
          Stats.quantileCI(df, col("v"), q = 0.99).collect())
      case "ranktests" =>
        // k-sample tests at n rows: value collapses to ≤100k distinct
        // cells (the mannWhitneyU/ROC shape) before any window; the
        // post-hoc pair join runs on the 5-row group table.
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(100000)) / 100.0).as("v"),
          concat(lit("g"), pmod(xxhash64(col("id"), lit(1)), lit(5)))
            .as("g"))
        df.count()
        time(s"kruskalWallis n=$n k=5 distinct=100k")(
          graft.ops.RankTests.kruskalWallis(df, col("v"), col("g")).collect())
        time(s"brownForsythe n=$n k=5")(
          graft.ops.RankTests.brownForsythe(df, col("v"), col("g")).collect())
        time(s"posthocPairs n=$n k=5")(
          graft.ops.RankTests.posthocPairs(df, col("v"), col("g")).collect())
      case "trend" =>
        // Full trend path at n raw rows: ONE downsample collapse to 4096
        // bins, then the pairwise ops on the bounded series (8.4M pair
        // rows of 3 scalars) + the window changepoint.
        val df = spark.range(n).select(
          pmod(col("id"), lit(4096)).as("b"),
          (pmod(xxhash64(col("id")), lit(1000)) / 10.0
            + pmod(col("id"), lit(4096)) / 500.0).as("v"))
        df.count()
        val binned = df.groupBy("b").agg(round(avg("v"), 6).as("mv"))
          .localCheckpoint()
        time(s"mannKendall n=$n bins=4096")(
          graft.ops.Trend.mannKendall(binned, col("b"), col("mv")).collect())
        time(s"theilSen n=$n bins=4096")(
          graft.ops.Trend.theilSen(binned, col("b"), col("mv")).collect())
        time(s"changepoint n=$n bins=4096")(
          graft.ops.Trend.changepointMeanShift(binned, col("b"), col("mv"))
            .collect())
        time(s"seasonalIndex n=$n raw (24 seasons)")(
          graft.ops.Trend.seasonalIndex(df,
            pmod(col("b"), lit(24)), col("v")).collect())
      case "rfm" =>
        // n events over 1M entities: the per-entity aggregation is the
        // only event-sized pass; the three ntile sorts run on the
        // 1M-entity table (the documented exact-bucket cost).
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(1000000)).as("u"),
          (pmod(xxhash64(col("id"), lit(1)), lit(720)) * 3600000000L).as("t"),
          (pmod(xxhash64(col("id"), lit(2)), lit(1000)) / 10.0).as("v"))
        df.count()
        time(s"rfm n=$n entities=1M q=5")(
          println(s"[probe] rfm rows: " + Stats.rfm(df, col("u"), col("t"),
            col("v"), q = 5).count()))
      case "markov" =>
        // n events, 1M entities, 10 states: entity-partitioned lead +
        // the bounded 10x10 transition grid.
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(1000000)).as("u"),
          col("id").as("t"), col("id").as("tie"),
          concat(lit("s"), pmod(xxhash64(col("id"), lit(3)), lit(10)))
            .as("st"))
        df.count()
        time(s"markovTransitions n=$n entities=1M states=10")(
          graft.ops.Sessionize.markovTransitions(df, col("u"), col("t"),
            col("tie"), col("st")).collect())
      case "driftdist" =>
        // r11 drift pair at scale: values quantized to 1 dp over a
        // [0, 1000) range → ≤ 10k distinct cells from n rows; both ops
        // are the ksStatistic collapse with different reduces (W1 adds
        // the lead window over the bounded collapsed table).
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(10000)) / 10.0
            + when(pmod(col("id"), lit(2)) === 0, 25.0).otherwise(0.0)).as("v"),
          when(pmod(col("id"), lit(2)) === 0, "a").otherwise("b").as("g"))
        df.count()
        time(s"wasserstein1 n=$n distinct<=12k")(
          println("[probe] w1 = " + Stats.wasserstein1(df, col("v"),
            col("g"), "a", "b", maxDistinct = 20000).head()))
        time(s"cramerVonMises n=$n distinct<=12k")(
          println("[probe] cvm = " + Stats.cramerVonMises(df, col("v"),
            col("g"), "a", "b").head()))
      case "prefeval" =>
        // round-11 fifth wave at scale: Bradley-Terry over n judgments
        // across a 64-item arena (one groupBy to the 2016-cell grid,
        // driver MM); McNemar (one fused 4-counter pass); Kendall
        // tau-b over n rows collapsing to <= 900 cells; token F1 over
        // n/20 doc pairs (explode + two keyed counts + outer join).
        val ev = spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id")), lit(1000)) / 10.0).as("v"),
          pmod(xxhash64(col("id"), lit(1)), lit(64)).as("i"),
          pmod(xxhash64(col("id"), lit(2)), lit(64)).as("j"))
        ev.count()
        val bt = ev.where(col("i") =!= col("j")).select(
          concat(lit("m"), when(pmod(col("id"), col("i") + col("j") + 2)
            <= col("i"), col("i")).otherwise(col("j"))).as("w"),
          concat(lit("m"), col("i") + col("j")
            - when(pmod(col("id"), col("i") + col("j") + 2) <= col("i"),
              col("i")).otherwise(col("j"))).as("l"))
        time(s"bradleyTerry n=$n items=64 iters=20")(
          graft.ops.Eval.bradleyTerry(bt, col("w"), col("l")).count())
        time(s"mcnemar n=$n")(
          graft.ops.Eval.mcnemar(ev, col("v") > 50.0,
            col("v") + pmod(col("id"), lit(20)) > 55.0,
            col("v") + pmod(col("id"), lit(30)) > 60.0).count())
        time(s"kendallTau n=$n cells<=900")(
          graft.ops.RankTests.kendallTau(ev,
            floor(col("v") / 5.0), floor(col("v") / 7.0)).count())
        val docPairs = docs(n / 20).select(col("id"),
          col("text").as("p"), translate(col("text"), "w", "x").as("r"))
        time(s"tokenF1 nDocs=${n / 20} ~30 tokens/doc (native overlap)")(
          graft.ops.Eval.tokenF1(docPairs, col("id"), col("p"), col("r"))
            .agg(avg("f1")).collect())
        time(s"tokenF1Exploded nDocs=${n / 20} (count-join baseline)")(
          graft.ops.Eval.tokenF1Exploded(docPairs, col("id"), col("p"),
            col("r")).agg(avg("f1")).collect())
      case "markovcollapse" =>
        // VERDICT r10 #7: does a partition-local consecutive-duplicate
        // pre-collapse beat the plain entity window when the event
        // stream compresses? Fixture: n events, 1M entities, 10 states
        // in ~8-event runs per entity (st keyed on floor(id/8M) — an
        // entity sees ~1 event per 1M ids, so its state persists ~8 of
        // its events). The collapse keeps a last-state map per
        // partition and DROPS in-run duplicates before the shuffle,
        // counting them locally; run heads flow to the normal window
        // (a run split across partitions yields adjacent equal-state
        // heads — the window counts the boundary self-loop, so totals
        // stay exact). PRECONDITION: rows within each partition are
        // per-entity time-ordered (true of append-log ingest and of
        // this spark.range fixture — t = id).
        import spark.implicits._
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(1000000)).as("u"),
          col("id").as("t"), col("id").as("tie"),
          concat(lit("s"), pmod(xxhash64(
            pmod(xxhash64(col("id")), lit(1000000)),
            floor(col("id") / 8000000L)), lit(10))).as("st"))
        df.count()
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
          r
        }
        val base = timed(s"markovTransitions n=$n run-structured window form")(
          graft.ops.Sessionize.markovTransitions(df, col("u"), col("t"),
              col("tie"), col("st"))
            .collect().map(r => (r.getString(0), r.getString(1)) ->
              (r.getLong(2), r.getDouble(3))).toMap)
        val coll = timed(s"markovTransitions n=$n run-structured pre-collapsed")({
          val collapsed = df.as[(Long, Long, Long, String)]
            .mapPartitions { it =>
              val last = new java.util.HashMap[Long, String]()
              val selfN = new java.util.HashMap[String, Long]()
              val kept = it.flatMap { case r @ (u, _, _, st) =>
                if (last.put(u, st) == st) {
                  selfN.merge(st, 1L, (a, b) => a + b); None
                } else Some(r)
              }
              def tailRows: Iterator[(Long, Long, Long, String)] = {
                val e = selfN.entrySet().iterator()
                new Iterator[(Long, Long, Long, String)] {
                  def hasNext = e.hasNext
                  def next() = { val x = e.next(); (-1L, x.getValue, 0L, x.getKey) }
                }
              }
              kept ++ tailRows
            }.toDF("u", "t", "tie", "st").persist()
          val heads = collapsed.where(col("u") >= 0)
          val selfCells = collapsed.where(col("u") === -1L)
            .groupBy(col("st").as("cur"))
            .agg(sum("t").as("n"))
            .select(col("cur"), col("cur").as("nxt"), col("n"))
          val headTrans = graft.ops.Sessionize.markovTransitions(heads,
            col("u"), col("t"), col("tie"), col("st"))
          val wc = org.apache.spark.sql.expressions.Window.partitionBy("cur")
          val rows = headTrans.select(col("cur"), col("nxt"), col("n"))
            .unionAll(selfCells)
            .groupBy("cur", "nxt").agg(sum("n").as("n"))
            .withColumn("p", col("n").cast("double") / sum("n").over(wc))
            .collect().map(r => (r.getString(0), r.getString(1)) ->
              (r.getLong(2), r.getDouble(3))).toMap
          collapsed.unpersist(blocking = false)
          rows
        })
        require(base == coll,
          s"pre-collapsed markov diverged: ${base.size} vs ${coll.size} cells")
        println(s"[probe] markovcollapse: ${base.size} cells, forms agree")
      case "graphstruct" =>
        // modularity + clustering coefficient on an n-edge bounded-degree
        // graph (nodes = n/8, ~16 neighbors each): two node-keyed tag
        // joins for modularity; the ordered two-join triangle enumeration
        // for the coefficient.
        val nodes = math.max(n / 8, 1000L)
        val e = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(nodes)).as("u"),
          pmod(xxhash64(col("id"), lit(1)), lit(nodes)).as("v"))
        e.count()
        val comm = spark.range(nodes).select(col("id").as("node"),
          pmod(col("id"), lit(100)).as("c"))
        time(s"modularity edges=$n nodes=$nodes comms=100")(
          println("[probe] modularity Q = " + graft.ops.Graph
            .modularity(e, "u", "v", comm, "node", "c")
            .agg(sum("q_contrib")).head().getDouble(0)))
        time(s"clusteringCoefficient edges=$n nodes=$nodes")(
          println("[probe] cc nodes: " + graft.ops.Graph
            .clusteringCoefficient(e, "u", "v").count()))
      case "rmst" =>
        // n subjects collapsing to 10k distinct durations — the KM
        // distinct-time shape; everything after is a lag + scalar.
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(10000)).cast("double").as("d"),
          (pmod(xxhash64(col("id"), lit(1)), lit(4)) > 0).as("e"))
        df.count()
        time(s"rmst n=$n distinct_t=10k")(
          Stats.rmst(df, col("d"), col("e"), tau = 8000.0).collect())
      case "platt" =>
        // 8 Newton steps × one fused 5-sum aggregation over n rows +
        // the target-count pass: iterations+1 full scans by design.
        val df = spark.range(n).select(
          (pmod(xxhash64(col("id")), lit(10000)) / 10000.0).as("s"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 10000.0
            < (pmod(xxhash64(col("id")), lit(10000)) / 10000.0)).as("y"))
        df.count()
        time(s"plattFit n=$n iters=8 cached")(
          println("[probe] platt model: " + graft.ops.Calibration
            .plattFit(df, col("y"), col("s"))))
        time(s"plattFit n=$n iters=8 uncached")(
          println("[probe] platt model: " + graft.ops.Calibration
            .plattFit(df, col("y"), col("s"), cache = false)))
      case "temperature" =>
        // 6 damped-Newton steps × one fused 2-sum aggregation over
        // row-local k=8 array expressions — no explode, no join.
        val k = 8
        val zArr = array((0 until k).map(j =>
          (pmod(xxhash64(col("id"), lit(j)), lit(97)) / 97.0 +
            when(pmod(xxhash64(col("id")), lit(k)) === j, 0.75)
              .otherwise(0.0)).cast("double")): _*)
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(k)).cast("int").as("y"),
          zArr.as("z"))
        df.count()
        // both cache regimes: the flat-column persist vs recomputing
        // the (here synthetic, nearly-free) upstream every pass — on
        // real parquet scans the cache side is the production default
        time(s"temperatureFit n=$n k=$k iters=6 cached")(
          println("[probe] temperature: " + graft.ops.Calibration
            .temperatureFit(df, col("y"), col("z"))))
        time(s"temperatureFit n=$n k=$k iters=6 uncached")(
          println("[probe] temperature: " + graft.ops.Calibration
            .temperatureFit(df, col("y"), col("z"), cache = false)))
      case "evalops" =>
        // pass@k over 1M problems × ~100 samples; fleiss over 1M items
        // with a FIXED 64 ratings each (id-sliced, not hashed — the
        // equal-n contract).
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(1000000)).as("p"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) < 3).as("ok"))
        df.count()
        time(s"passAtK n=$n problems=1M k=10")(
          println("[probe] passAtK rows: " + graft.ops.Eval
            .passAtK(df, col("p"), col("ok"), k = 10).count()))
        val ratings = spark.range(n).select(
          (col("id") / 64L).cast("long").as("i"),
          concat(lit("c"), pmod(xxhash64(col("id")), lit(5))).as("c"))
        ratings.count()
        time(s"fleissKappa n=$n items=n/64 raters=64")(
          graft.ops.Eval.fleissKappa(ratings, col("i"), col("c")).collect())
      case "cif" =>
        // competing risks at n subjects / 10k distinct times / 3 causes
        val df = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(10000)).cast("double").as("d"),
          when(pmod(xxhash64(col("id"), lit(1)), lit(4)) === 0, lit(null))
            .otherwise(concat(lit("cause"),
              pmod(xxhash64(col("id"), lit(2)), lit(3)))).as("c"))
        df.count()
        time(s"cumulativeIncidence n=$n distinct_t=10k causes=3")(
          println("[probe] cif rows: " + Stats
            .cumulativeIncidence(df, col("d"), col("c")).count()))
      case "profilecmp" =>
        // two n-row snapshots, 3 columns: one fused profile aggregation
        // per side (exact countDistinct Expand = the documented cost;
        // exact=false is the 100 TB form)
        def snap(seed: Int) = spark.range(n).select(
          (pmod(xxhash64(col("id"), lit(seed)), lit(1000000)) / 100.0)
            .as("v"),
          pmod(xxhash64(col("id"), lit(seed + 1)), lit(500000)).as("u"),
          concat(lit("t"), pmod(xxhash64(col("id")), lit(20))).as("ty"))
        val (a, b) = (snap(1), snap(2))
        a.count(); b.count()
        time(s"profileCompare n=$n x2 cols=3 exact")(
          graft.ops.DataQuality.profileCompare(a, b,
            Seq("v", "u", "ty"), exact = true).collect())
        time(s"profileCompare n=$n x2 cols=3 approx")(
          graft.ops.DataQuality.profileCompare(a, b,
            Seq("v", "u", "ty"), exact = false).collect())
      case other => sys.error(s"unknown probe op: $other")
    }
    spark.stop()
  }
}
