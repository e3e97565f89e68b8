package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Stats, TextOps}

/** Laws for the round-3 curation/stats additions: EWMA linear recurrence,
  * weighted sampling, quantile binning, outlier fences, vocabulary,
  * duplicate spans, and edit-distance blocking.
  */
class CurationStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- incremental corpus stats ----

  test("corpusStatsSnapshot/Report: exact metrics equal whole-corpus corpusReport; estimates bounded; parquet roundtrip") {
    val docs = (1L to 300L).map { i =>
      val g = if (i % 3 == 0) "en" else "de"
      val text =
        if (i % 17 == 0) "" // empties
        else if (i % 5 == 0) s"dup doc body ${i % 4}" // cross-batch exact dups
        else (0 until (3 + (i % 7)).toInt).map(t => s"w${(i * 31 + t * 7) % 40}").mkString(" ")
      (i, text, g)
    }.toDF("id", "text", "g")
    val whole = TextOps.corpusReport(docs, col("id"), col("text"), col("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // three ingest batches, snapshots through a parquet store (the real flow)
    val store = java.nio.file.Files.createTempDirectory("graft_snap").toString
    (0 until 3).foreach(b => TextOps.corpusStatsSnapshot(
        docs.where(col("id") % 3 === b), col("text"), col("g"), b)
      .write.mode("append").parquet(store))
    val report = TextOps.corpusStatsReport(spark.read.parquet(store))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact metrics: bit-equal to the whole-corpus card
    for (m <- Seq("n_docs", "n_tokens", "avg_tokens", "avg_chars",
        "empty_rate", "group_entropy"))
      assert(report(m) == whole(m), s"$m: ${report(m)} vs ${whole(m)}")
    // sketch-backed estimates: within HLL lgK=12 error (~2.5%) / KLL rank error
    assert(math.abs(report("exact_dup_rate_est") - whole("exact_dup_rate"))
      <= 0.03, s"dup ${report("exact_dup_rate_est")} vs ${whole("exact_dup_rate")}")
    assert(math.abs(report("vocab_size_est") / whole("vocab_size") - 1.0)
      <= 0.03, s"vocab ${report("vocab_size_est")} vs ${whole("vocab_size")}")
    assert(math.abs(report("p50_tokens_est") - whole("p50_tokens")) <= 1.0,
      s"p50 ${report("p50_tokens_est")} vs ${whole("p50_tokens")}")
  }

  // ---- mixture materialization ----

  test("materializeMixture: integer weights exact, fractional stochastic-rounded, zero dropped, deterministic") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b" else if (i <= 300) "c" else "d"))
      .toDF("id", "g")
    val out = Stats.materializeMixture(df, col("id"), col("g"),
      Map("a" -> 3.0, "b" -> 0.5, "c" -> 0.0), seed = 7L)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG("a") == 300L) // exactly 3 copies each
    assert(byG.get("c").isEmpty && byG.get("d").isEmpty) // 0-weight + absent dropped
    // Bernoulli(0.5) over 100 docs: deterministic per seed, near half
    assert(byG("b") > 25L && byG("b") < 75L, byG("b"))
    val again = Stats.materializeMixture(df, col("id"), col("g"),
      Map("a" -> 3.0, "b" -> 0.5, "c" -> 0.0), seed = 7L)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == byG)
    // copy indices are dense 0..n-1 per doc
    val copies = out.where(col("g") === "a" && col("id") === 1L)
      .select("copy").collect().map(_.getLong(0)).sorted.toSeq
    assert(copies == Seq(0L, 1L, 2L))
  }

  // ---- ewma ----

  test("ewma: matches the hand-computed recurrence per group, ordered") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 1L, 4.0), ("b", 2L, 8.0)).toDF("k", "t", "x")
    val got = Stats.ewma(df, "k", Seq("t"), "x", alpha = 0.5)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(got === Array(
      ("a", 1L, 10.0), ("a", 2L, 15.0), ("a", 3L, 22.5),
      ("b", 1L, 4.0), ("b", 2L, 6.0)))
  }

  test("ewma: result is independent of input row order and partitioning") {
    val rows = (1 to 500).map(i => (s"g${i % 7}", i.toLong, math.sin(i) * 10))
    val df1 = rows.toDF("k", "t", "x").repartition(13)
    val df2 = scala.util.Random.shuffle(rows).toDF("k", "t", "x").repartition(3)
    val a = Stats.ewma(df1, "k", Seq("t"), "x", 0.3).orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    val b = Stats.ewma(df2, "k", Seq("t"), "x", 0.3).orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(a == b)
  }

  test("ewma: alpha = 1 reproduces the input; constant series is fixpoint") {
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 7.0), ("a", 3L, 5.0)).toDF("k", "t", "x")
    val idty = Stats.ewma(df, "k", Seq("t"), "x", 1.0).orderBy("t")
      .collect().map(_.getDouble(3))
    assert(idty.toSeq == Seq(3.0, 7.0, 5.0))
    val const = Seq(("a", 1L, 2.5), ("a", 2L, 2.5), ("a", 3L, 2.5)).toDF("k", "t", "x")
    val fix = Stats.ewma(const, "k", Seq("t"), "x", 0.2).collect().map(_.getDouble(3))
    assert(fix.forall(_ == 2.5))
  }

  // ---- weightedSample ----

  test("weightedSample: deterministic, size-capped, excludes weight <= 0") {
    val df = (1 to 200).map(i => (i.toLong, if (i <= 5) 0.0 else i.toDouble))
      .toDF("id", "w")
    val s1 = Stats.weightedSample(df, col("id"), col("w"), k = 20, seed = 3L)
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Stats.weightedSample(df.repartition(7), col("id"), col("w"), 20, 3L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 == s2 && s1.size == 20)
    assert(s1.forall(_ > 5)) // zero-weight rows never selected
  }

  test("weightedSample: k >= population returns every positive-weight row") {
    val df = (1 to 30).map(i => (i.toLong, 1.0)).toDF("id", "w")
    val got = Stats.weightedSample(df, col("id"), col("w"), 100, 1L).count()
    assert(got == 30)
  }

  test("weightedSample: heavier rows are selected more often across seeds") {
    // ids 1..100 weight 1, ids 101..110 weight 50: over 40 seeds the heavy
    // decile must dominate its population share in the k=10 sample.
    val df = ((1 to 100).map(i => (i.toLong, 1.0)) ++
      (101 to 110).map(i => (i.toLong, 50.0))).toDF("id", "w")
    val heavyRate = (1 to 40).map { seed =>
      val ids = Stats.weightedSample(df, col("id"), col("w"), 10, seed.toLong)
        .select("id").as[Long].collect()
      ids.count(_ > 100)
    }.sum / 40.0
    assert(heavyRate > 4.0, s"heavy picks/seed = $heavyRate") // ~8 expected, 1 if unweighted
  }

  // ---- quantile bins ----

  test("fitQuantileBins/applyQuantileBins: sorted cuts, near-equal buckets") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("v")
    val bounds = Stats.fitQuantileBins(df, col("v"), k = 4)
    assert(bounds == bounds.sorted && bounds.size == 3)
    val counts = df.withColumn("bin", Stats.applyQuantileBins(col("v"), bounds))
      .groupBy("bin").count().orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(counts.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(counts.forall { case (_, n) => n >= 240 && n <= 260 })
  }

  test("applyQuantileBins: boundary value goes to the LOWER bin (x > b rule)") {
    val bin = Seq(5.0).toDF("v")
      .select(Stats.applyQuantileBins(col("v"), Seq(5.0, 10.0)).as("b"))
      .head().getInt(0)
    assert(bin == 0)
  }

  // ---- outlierStats ----

  test("outlierStats: plants z and IQR outliers where expected") {
    // group "g": 100 values at 0 +- 1-ish, plus one extreme spike
    val base = (1 to 100).map(i => ("g", (i % 10 - 4.5) / 3.0))
    val df = (base :+ (("g", 1000.0))).toDF("k", "v")
    val row = Stats.outlierStats(df, col("k"), col("v")).head()
    assert(row.getAs[Long]("n") == 101)
    assert(row.getAs[Long]("n_z_outliers") == 1)   // the spike
    assert(row.getAs[Long]("n_iqr_outliers") == 1) // the spike again
    assert(row.getAs[Double]("iqr_lo") < row.getAs[Double]("iqr_hi"))
  }

  test("outlierStats: clean uniform group has no z outliers") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val row = Stats.outlierStats(df, col("k"), col("v")).head()
    assert(row.getAs[Long]("n_z_outliers") == 0)
    assert(row.getAs[Long]("n_iqr_outliers") == 0)
  }

  // ---- vocabulary ----

  test("vocabulary: tf/df counts, minCount cut, deterministic tie order") {
    val df = Seq(
      (1L, "apple apple pear"),
      (2L, "apple pear  pear"),
      (3L, "  plum ")).toDF("id", "text")
    val got = TextOps.vocabulary(df, col("id"), col("text"), minCount = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // apple tf=3 df=2; pear tf=3 df=2 (tie broken by token); plum cut by minCount
    assert(got == Seq(("apple", 3L, 2L), ("pear", 3L, 2L)))
  }

  test("vocabulary: topN cuts after ordering by tf desc") {
    val df = Seq((1L, "a a a b b c")).toDF("id", "text")
    val got = TextOps.vocabulary(df, col("id"), col("text"), 1L, 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "b"))
  }

  // ---- duplicateSpans ----

  test("duplicateSpans: shared tiles flagged, unique tails not, short docs zero") {
    val eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    val df = Seq(
      (1L, s"$eight u1 u2 u3 u4 u5 u6 u7 u8"), // tile1 shared, tile2 unique
      (2L, s"$eight x1 x2 x3 x4 x5 x6 x7 x8"), // tile1 shared, tile2 unique
      (3L, "short doc")).toDF("id", "text")    // 0 tiles
    val got = Dedup.duplicateSpans(df, "id", "text", w = 8, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got(0) == ((1L, 2, 2L, 1L, 0.5)))
    assert(got(1) == ((2L, 2, 2L, 1L, 0.5)))
    assert(got(2) == ((3L, 0, 0L, 0L, 0.0)))
  }

  test("duplicateSpans: within-doc repeats count once for doc frequency") {
    val tile = "t1 t2 t3 t4"
    val df = Seq((1L, s"$tile $tile"), (2L, "z1 z2 z3 z4")).toDF("id", "text")
    val got = Dedup.duplicateSpans(df, "id", "text", w = 4, minDocs = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // doc 1 has 2 tiles but 1 distinct; no tile reaches 2 DOCS -> no dups
    assert(got(0) == ((1L, 2, 1L, 0L)))
    assert(got(1) == ((2L, 1, 1L, 0L)))
  }

  // ---- corrMatrix / timeWeightedAvg / foldAssign ----

  test("corrMatrix: perfect positive/negative correlation and pair coverage") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i + 3, -1.0 * i)).toDF("a", "b", "c")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 3)
    assert(approx(got(("a", "b")), 1.0, 1e-12))
    assert(approx(got(("a", "c")), -1.0, 1e-12))
    assert(approx(got(("b", "c")), -1.0, 1e-12))
  }

  test("timeWeightedAvg: hand-computed step integral; last event open-ended") {
    // key g: value 10 holds [0,4), 2 holds [4,10); twa = (10*4 + 2*6)/10 = 5.2
    val df = Seq(("g", 0L, 10.0), ("g", 4L, 2.0), ("g", 10L, 99.0)).toDF("k", "t", "v")
    val row = Stats.timeWeightedAvg(df, col("k"), col("t"), col("v")).head()
    assert(approx(row.getAs[Double]("twa"), 5.2, 1e-12))
    assert(row.getAs[Long]("n_intervals") == 2 && row.getAs[Long]("span") == 10)
  }

  test("timeWeightedAvg: single-event keys drop out (no closing interval)") {
    val df = Seq(("a", 1L, 5.0), ("b", 1L, 7.0), ("b", 3L, 9.0)).toDF("k", "t", "v")
    val got = Stats.timeWeightedAvg(df, col("k"), col("t"), col("v"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("b"))
  }

  test("foldAssign: partitions ids, deterministic, roughly balanced") {
    val df = (1L to 5000L).toDF("id")
    val folds = df.withColumn("f", Stats.foldAssign(col("id"), k = 5, seed = 17L))
    val counts = folds.groupBy("f").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    assert(counts.values.sum == 5000L)
    assert(counts.values.forall(n => n > 800 && n < 1200))
    // repartition-invariant
    val again = df.repartition(7)
      .withColumn("f", Stats.foldAssign(col("id"), 5, 17L))
      .groupBy("f").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  // ---- categoricalDivergence ----

  test("categoricalDivergence: zero for identical slices, positive for drifted") {
    val same = (1 to 200).map(i => (if (i <= 100) "A" else "B", s"c${i % 4}"))
      .toDF("side", "cat")
    val zero = Stats.categoricalDivergence(same, col("cat"),
      col("side") === "A", col("side") === "B").head()
    assert(approx(zero.getAs[Double]("kl_pq"), 0.0, 1e-12))
    assert(approx(zero.getAs[Double]("js"), 0.0, 1e-12))
    // drifted: side A all c0, side B all c1
    val drifted = ((1 to 100).map(_ => ("A", "c0")) ++ (1 to 100).map(_ => ("B", "c1")))
      .toDF("side", "cat")
    val row = Stats.categoricalDivergence(drifted, col("cat"),
      col("side") === "A", col("side") === "B").head()
    assert(row.getAs[Double]("kl_pq") > 1.0 && row.getAs[Double]("js") > 0.3)
    assert(row.getAs[Long]("n_categories") == 2)
  }

  test("categoricalDivergence: JS is symmetric, KL is not") {
    val df = ((1 to 90).map(_ => ("A", "x")) ++ (1 to 10).map(_ => ("A", "y")) ++
      (1 to 50).map(_ => ("B", "x")) ++ (1 to 50).map(_ => ("B", "y"))).toDF("side", "cat")
    val ab = Stats.categoricalDivergence(df, col("cat"),
      col("side") === "A", col("side") === "B").head()
    val ba = Stats.categoricalDivergence(df, col("cat"),
      col("side") === "B", col("side") === "A").head()
    assert(approx(ab.getAs[Double]("js"), ba.getAs[Double]("js"), 1e-12))
    assert(approx(ab.getAs[Double]("kl_pq"), ba.getAs[Double]("kl_qp"), 1e-12))
    assert(math.abs(ab.getAs[Double]("kl_pq") - ab.getAs[Double]("kl_qp")) > 1e-3)
  }

  // ---- dedupExactIncremental ----

  test("dedupExactIncremental: cross-batch dedup via the fingerprint store") {
    val store = java.nio.file.Files.createTempDirectory("graft_dedup_store")
      .resolve("hashes").toString
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("id", "text")
    val k1 = Dedup.dedupExactIncremental(b1, "id", "text", store)
      .select("id").as[Long].collect().sorted.toSeq
    assert(k1 == Seq(1L, 2L)) // in-batch dup 3 dropped (lowest id wins)
    val b2 = Seq((10L, "alpha"), (11L, "gamma"), (12L, "beta"), (13L, "gamma"))
      .toDF("id", "text")
    val k2 = Dedup.dedupExactIncremental(b2, "id", "text", store)
      .select("id").as[Long].collect().sorted.toSeq
    assert(k2 == Seq(11L)) // alpha/beta already ingested; gamma once
    val b3 = Seq((20L, "gamma")).toDF("id", "text")
    assert(Dedup.dedupExactIncremental(b3, "id", "text", store).count() == 0)
  }

  // ---- temperatureMixture ----

  test("temperatureMixture: T=1 is identity (weight 1); T=inf-ish flattens") {
    val df = ((1 to 90).map(_ => "en") ++ (1 to 10).map(_ => "fr")).toDF("lang")
    val t1 = Stats.temperatureMixture(df, col("lang"), 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(approx(t1("en"), 1.0, 1e-12) && approx(t1("fr"), 1.0, 1e-12))
    val hot = Stats.temperatureMixture(df, col("lang"), 1000.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("target_frac")).toMap
    assert(math.abs(hot("en") - 0.5) < 0.01 && math.abs(hot("fr") - 0.5) < 0.01)
    // upweights the minority class at any T > 1
    val t2 = Stats.temperatureMixture(df, col("lang"), 2.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(t2("fr") > 1.0 && t2("en") < 1.0)
  }

  // ---- edge cases across the round-3 ops ----

  test("edge: ewma/corrMatrix/fuzzyJoin/outlierStats on empty or degenerate input") {
    val emptyTs = spark.emptyDataset[(String, Long, Double)].toDF("k", "t", "x")
    assert(Stats.ewma(emptyTs, "k", Seq("t"), "x", 0.5).count() == 0)

    // constant column: Pearson r is undefined -> null/NaN row, not a crash
    val const = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("a", "b")
    val r = Stats.corrMatrix(const, Seq("a", "b")).head()
    assert(r.isNullAt(2) || r.getDouble(2).isNaN)

    val docs = Seq((1L, "alpha beta gamma delta")).toDF("id", "text")
    val noDocs = spark.emptyDataset[(Long, String)].toDF("rid", "text")
    assert(graft.ops.Dedup.fuzzyJoin(docs, "id", "text", noDocs, "rid", "text",
      0.5, numShingleWords = 2).count() == 0)

    val one = Seq(("g", 1.0)).toDF("k", "v")
    val row = Stats.outlierStats(one, col("k"), col("v")).head()
    assert(row.getAs[Long]("n") == 1 && row.getAs[Long]("n_iqr_outliers") == 0)
  }

  test("edge: normalizeText on null/blank/punct-only text") {
    val df = Seq((1L, null), (2L, "   "), (3L, "!!!..."), (4L, "A  b\tC"))
      .toDF("id", "t")
    val got = df.select(col("id"), graft.ops.TextOps.normalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).isEmpty)          // null propagates
    assert(got(2L).contains(""))     // blank collapses to empty
    assert(got(3L).contains(""))     // punct-only collapses to empty
    assert(got(4L).contains("a b c"))
  }

  // ---- JaroWinkler ----

  test("JaroWinkler: textbook values, empty/zero-match edges, boost gating") {
    val jw = (a: String, b: String) =>
      Seq((a, b)).toDF("x", "y")
        .select(org.apache.spark.sql.graft.MinHashShim
          .jaroWinklerCol(col("x"), col("y")))
        .head().getDouble(0)
    // values pinned against DuckDB's jaro_winkler_similarity
    assert(approx(jw("martha", "marhta"), 0.9611111111, 1e-9))
    assert(approx(jw("dixon", "dicksonx"), 0.8133333333, 1e-9))
    assert(approx(jw("dwayne", "duane"), 0.84, 1e-9))
    assert(approx(jw("abcd", "abdc"), 0.9333333333, 1e-9))
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0) // DuckDB: empty -> 0
    assert(jw("ab", "ba") == 0.0)                     // window 0, no matches
    assert(jw("abc", "abc") == 1.0)
    // boost gated at jaro > 0.7: shared prefix but low jaro stays unboosted
    assert(approx(jw("abcdef", "abzzzz"), 0.5555555556, 1e-9))
    // NON-ASCII: the alphabet is UTF-8 BYTES, like DuckDB's
    // jaro_winkler_similarity (values below measured from DuckDB
    // directly) — a UTF-16 loop gives 0.8333/0.6667/0.0 here instead
    assert(approx(jw("über", "uber"), 0.7833333333333333, 1e-12))
    assert(approx(jw("数据", "数扰"), 0.8666666666666666, 1e-12))
    assert(approx(jw("😀a", "a😀"), 0.8666666666666667, 1e-12))
    assert(jw("üa", "aü") == 0.0)
  }

  test("edit-distance alphabet: Spark levenshtein is code-point-based (≠ DuckDB bytes off-ASCII)") {
    // editDistancePairs' blocking AND verify both use code points, so
    // the lossless guarantee holds for any string; DuckDB's levenshtein
    // counts BYTES (über→uber = 2 there, 1 here). This pin documents the
    // deliberate divergence: oracles for edit-distance ops are exact on
    // ASCII corpora; a non-ASCII oracle needs a code-point distance on
    // the DuckDB side.
    val d = (a: String, b: String) =>
      Seq((a, b)).toDF("x", "y")
        .select(levenshtein(col("x"), col("y"))).head().getInt(0)
    assert(d("über", "uber") == 1)    // DuckDB: 2 (byte-based)
    assert(d("数据", "数扰") == 1)     // DuckDB: 2
    assert(d("kitten", "sitting") == 3) // ASCII: engines agree
  }

  test("jaroWinklerPairs: length-ratio prefilter is lossless") {
    val names = Seq("johnson", "johnsen", "jon", "smith", "smyth", "x")
      .map(Tuple1(_)).toDF("name")
    val got = Dedup.jaroWinklerPairs(names, col("name"), minSim = 0.87)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force without the prefilter
    val jwCol = org.apache.spark.sql.graft.MinHashShim
      .jaroWinklerCol(col("name_a"), col("name_b"))
    val n = names.select(col("name").as("name_a")).distinct()
    val brute = n.crossJoin(n.select(col("name_a").as("name_b")))
      .where(col("name_a") < col("name_b"))
      .where(jwCol >= 0.87)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
    assert(got.contains(("johnsen", "johnson")) && got.contains(("smith", "smyth")))
  }

  // ---- JaccardSizeGuardRule ----

  test("jaccard size-guard rule: injected, result-preserving, idempotent, scoped") {
    graft.functions.GraftExtensions.installOptimizations(spark)
    org.apache.spark.sql.graft.VectorShim.register(spark)
    // parquet-backed (a pure LocalRelation would be constant-folded away
    // before the filter could be observed in the optimized plan)
    val tmp = java.nio.file.Files.createTempDirectory("graft_jg").toString
    Seq(
      (1L, "a b c d e f", "a b c d e f"),      // identical -> J = 1
      (2L, "a b c d e f", "a b"),              // size-mismatched -> guard prunes
      (3L, "a b c d e f", "a b c d e g")).toDF("id", "x", "y")
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    df.createOrReplaceTempView("jg")
    val q = "SELECT id FROM jg WHERE graft_jaccard(graft_shingles(x, 1), " +
      "graft_shingles(y, 1)) >= 0.8"
    val res = spark.sql(q)
    // the guard is in the optimized plan exactly once (idempotent under
    // the optimizer's fixpoint loop)
    val opt = res.queryExecution.optimizedPlan.toString
    assert("least\\(size\\(".r.findAllIn(opt).size == 1, opt)
    // and the result is the unguarded truth
    assert(res.as[Long].collect().sorted.toSeq == Seq(1L))
    // scope: MATERIALIZED shingle columns (plain array references whose
    // distinctness can't be proven — and no projection to collapse) are
    // NOT rewritten. (An aliased-projection view IS rewritten: Catalyst
    // collapses the projection into the filter first, re-exposing the
    // WordShingles expression — the rule composes with CollapseProject.)
    val pre = java.nio.file.Files.createTempDirectory("graft_jg_pre").toString
    df.selectExpr("id", "graft_shingles(x, 1) AS sx", "graft_shingles(y, 1) AS sy")
      .write.mode("overwrite").parquet(pre)
    spark.read.parquet(pre).createOrReplaceTempView("jg_pre")
    val refq = spark.sql("SELECT id FROM jg_pre WHERE graft_jaccard(sx, sy) >= 0.8")
    assert(!refq.queryExecution.optimizedPlan.toString.contains("least(size("))
    assert(refq.as[Long].collect().sorted.toSeq == Seq(1L)) // same answer, unguarded
  }

  test("jaccard size-guard rule: non-distinct shingles are NOT guarded (size bound unsound on multisets)") {
    graft.functions.GraftExtensions.installOptimizations(spark)
    import org.apache.spark.sql.graft.MinHashShim
    val tmp = java.nio.file.Files.createTempDirectory("graft_jg_nd").toString
    // JaccardSim computes SET Jaccard, so ["x","x","x","x"] vs ["x"] has
    // J = 1.0 — but their sizes (4 vs 1) fail the least>=t*greatest guard.
    // A rule firing on the distinct=false form would silently prune it.
    Seq((1L, "x x x x", "x")).toDF("id", "x", "y")
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val res = df.where(
      MinHashShim.jaccardCol(
        MinHashShim.shinglesAllCol(col("x"), 1),
        MinHashShim.shinglesAllCol(col("y"), 1)) >= 0.8)
      .select("id")
    assert(!res.queryExecution.optimizedPlan.toString.contains("least(size("))
    assert(res.as[Long].collect().toSeq == Seq(1L))
  }

  // ---- editDistancePairs ----

  test("editDistancePairs: equals the brute-force all-pairs filter") {
    val names = Seq("kitten", "sitting", "mitten", "bolt", "bolts", "volt",
      "widget", "gadget", "a", "ab", "abc").map(Tuple1(_)).toDF("name")
    val got = Dedup.editDistancePairs(names, col("name"), maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val vals = names.as[String].collect().distinct
    val brute = (for {
      a <- vals; b <- vals if a < b
      d = {
        // classic DP levenshtein
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      } if d <= 2
    } yield (a, b, d)).toSet
    assert(got == brute)
    assert(got.contains(("kitten", "mitten", 1)))
    assert(got.contains(("bolt", "bolts", 1)))
  }
}
