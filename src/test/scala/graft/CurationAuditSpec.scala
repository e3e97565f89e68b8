package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, RecordLinkage, Stats, TextOps}

/** Session additions to the curation-audit family: readability features,
  * the LSH banding parameter sweep, blocking-quality metrics, DP clipped
  * means, keep-best-per-cluster dedup, and tokenizer fertility. */
class CurationAuditSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- readability

  test("readability: hand-computed counts and scores") {
    // "The cat sat on the mat." — 6 words, 1 sentence.
    // Syllables (vowel-group − silent-e, floor 1): the→1 (e group, −1
    // silent e → floor 1), cat→1, sat→1, on→1, the→1, mat.→1 ⇒ 6.
    val df = Seq((1L, "The cat sat on the mat.")).toDF("doc_id", "text")
    val r = df.select(TextOps.readability(col("text")).as("r"))
      .select("r.*").head()
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    // FRE = 206.835 − 1.015·6 − 84.6·1 = 116.145; FK = 0.39·6 + 11.8·1 − 15.59
    assert(approx(r.getAs[Double]("fre"), 206.835 - 1.015 * 6 - 84.6, 1e-4))
    assert(approx(r.getAs[Double]("fk_grade"), 0.39 * 6 + 11.8 - 15.59, 1e-4))
  }

  test("readability: multi-sentence, silent-e, vowel-free, blank edge cases") {
    val df = Seq(
      (1L, "Remote athlete! Where? Respite here."), // silent-e exercises
      (2L, "xyz zz"),                               // vowel-free → 1 syl each
      (3L, "   "),                                  // blank → zero row
      (4L, "no terminal punctuation")               // sentences floor at 1
    ).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), TextOps.readability(col("text")).as("r"))
      .select(col("doc_id"), col("r.*")).orderBy("doc_id").collect()
    // tokens keep their punctuation, so the silent-e rule only fires on
    // words ENDING in consonant+e: remote → 3 groups − 1 = 2;
    // "athlete!" ends '!' → 3; "Where?" → 2; Respite → 3 − 1 = 2;
    // "here." ends '.' → 2. Total 11.
    assert(rows(0).getAs[Long]("n_sentences") == 3L)
    assert(rows(0).getAs[Long]("n_syllables") == (2 + 3 + 2 + 2 + 2).toLong)
    assert(rows(1).getAs[Long]("n_syllables") == 2L) // floor 1 per word
    assert(rows(2).getAs[Long]("n_words") == 0L)
    assert(rows(2).isNullAt(rows(2).fieldIndex("fre")))
    assert(rows(3).getAs[Long]("n_sentences") == 1L)
  }

  // ------------------------------------------------------------- lshTune

  test("lshTune: divisor grid, probability laws, and the deployed 8x4 row") {
    val out = Dedup.lshTune(spark, numHashes = 32, threshold = 0.7)
      .orderBy("bands").collect()
    // divisors of 32: 1,2,4,8,16,32
    assert(out.map(_.getAs[Int]("bands")).toSeq == Seq(1, 2, 4, 8, 16, 32))
    out.foreach { r =>
      assert(r.getAs[Int]("bands") * r.getAs[Int]("rows_per_band") == 32)
      val fp = r.getAs[Double]("fp_area"); val fn = r.getAs[Double]("fn_area")
      assert(fp >= 0 && fp <= 0.7 + 1e-9, s"fp=$fp")
      assert(fn >= 0 && fn <= 0.3 + 1e-9, s"fn=$fn")
      val infl = r.getAs[Double]("inflection")
      assert(infl > 0 && infl < 1 || r.getAs[Int]("bands") == 1)
    }
    // more bands (same hash budget) = more permissive: FP grows
    // monotonically with b, FN shrinks
    val byB = out.sortBy(_.getAs[Int]("bands"))
    assert(byB.map(_.getAs[Double]("fp_area")).sliding(2)
      .forall(w => w(0) <= w(1) + 1e-12))
    assert(byB.map(_.getAs[Double]("fn_area")).sliding(2)
      .forall(w => w(0) >= w(1) - 1e-12))
    // b=1, r=32: collision needs the FULL signature equal — essentially
    // zero FP; b=32, r=1: any of 32 single hashes — essentially zero FN
    assert(byB.head.getAs[Double]("fp_area") < 1e-6)
    assert(byB.last.getAs[Double]("fn_area") < 1e-3)
    // the deployed 8x4 banding sits near the sweep's minimal error
    val err = out.map(r => r.getAs[Int]("bands") -> r.getAs[Double]("error")).toMap
    assert(err(8) <= err.values.min + 0.05)
  }

  test("lshTune: guards refuse bad budgets and thresholds") {
    intercept[IllegalArgumentException](Dedup.lshTune(spark, 0, 0.5))
    intercept[IllegalArgumentException](Dedup.lshTune(spark, 32, 1.0))
    intercept[IllegalArgumentException](Dedup.lshTune(spark, 32, 0.5, steps = 10))
  }

  // ----------------------------------------------------- blockingQuality

  test("blockingQuality: hand-computed RR/PC/PQ on a fixed fixture") {
    // blocks: A={1,2,3}, B={4,5}, C={6} → candidates 3+1+0 = 4 of 15
    val recs = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "C")).toDF("id", "bk")
    // truth: (1,2) co-blocked, (1,4) split, (4,5) co-blocked, (3,6) split
    val truth = Seq((1L, 2L), (1L, 4L), (4L, 5L), (3L, 6L))
      .toDF("id_a", "id_b")
    val r = RecordLinkage.blockingQuality(recs, "id", col("bk"), truth).head()
    assert(r.getAs[Long]("n_records") == 6L)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("max_block") == 3L)
    assert(r.getAs[Long]("n_candidates") == 4L)
    assert(approx(r.getAs[Double]("reduction_ratio"), 1.0 - 4.0 / 15.0, 1e-6))
    assert(r.getAs[Long]("n_truth") == 4L)
    assert(r.getAs[Long]("n_truth_covered") == 2L)
    assert(approx(r.getAs[Double]("pairs_completeness"), 0.5, 1e-9))
    assert(approx(r.getAs[Double]("pairs_quality"), 0.5, 1e-9))
  }

  test("blockingQuality: the everyone-in-one-block scheme has RR 0, PC 1") {
    val recs = (1L to 5L).map(i => (i, "X")).toDF("id", "bk")
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = RecordLinkage.blockingQuality(recs, "id", col("bk"), truth).head()
    assert(r.getAs[Long]("n_candidates") == 10L)
    assert(approx(r.getAs[Double]("reduction_ratio"), 0.0, 1e-9))
    assert(approx(r.getAs[Double]("pairs_completeness"), 1.0, 1e-9))
  }

  // ----------------------------------------------------------- dpGroupMean

  test("dpGroupMean: deterministic per seed, exact clipped sums, bounded use") {
    val df = Seq(("a", 5.0), ("a", 500.0), ("a", -3.0), ("b", 10.0),
      ("b", 20.0)).toDF("g", "v")
    val run = () => Stats.dpGroupMean(df, col("g"), col("v"),
      lo = 0.0, hi = 100.0, epsilon = 1.0, seed = 7L)
      .orderBy("grp").collect()
    val r1 = run(); val r2 = run()
    // determinism: same seed → bit-equal release
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    // clipping: a's true sum is 5 + 100 (clipped from 500) + 0 (from −3)
    val a = r1(0)
    assert(a.getAs[java.math.BigDecimal]("sum_true").doubleValue() == 105.0)
    assert(a.getAs[Long]("n_true") == 3L)
    // noise is real (a zero-noise draw has ~0 probability) but bounded
    // in distribution: scale 2/ε = 2 for the count stream
    assert(math.abs(a.getAs[Double]("n_noisy") - 3.0) > 1e-9)
    assert(math.abs(a.getAs[Double]("n_noisy") - 3.0) < 60.0)
    // the release is the noisy ratio
    assert(approx(a.getAs[Double]("mean_dp"),
      a.getAs[Double]("sum_noisy") / math.max(1.0, a.getAs[Double]("n_noisy")),
      1e-12))
    // a different seed draws different noise
    val other = Stats.dpGroupMean(df, col("g"), col("v"), 0.0, 100.0, 1.0, 8L)
      .orderBy("grp").collect()
    assert(other(0).getAs[Double]("n_noisy") != a.getAs[Double]("n_noisy"))
  }

  test("dpGroupMean: guards") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException](
      Stats.dpGroupMean(df, col("g"), col("v"), 0.0, 100.0, 0.0, 1L))
    intercept[IllegalArgumentException](
      Stats.dpGroupMean(df, col("g"), col("v"), 5.0, 5.0, 1.0, 1L))
  }

  // ------------------------------------------------- keepBestPerCluster

  test("keepBestPerCluster: max score wins, ties to the lowest id") {
    val df = Seq(
      (1L, 10L, 0.5), (2L, 10L, 0.9), (3L, 10L, 0.9), // tie at 0.9 → id 2
      (4L, 20L, 0.1),                                  // singleton survives
      (5L, 30L, 0.0), (6L, 30L, 0.0)                   // all-zero tie → id 5
    ).toDF("id", "cluster", "q")
    val kept = Dedup.keepBestPerCluster(df, "id", col("cluster"), col("q"))
      .orderBy("id").collect()
    assert(kept.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L, 5L))
    // schema passes through unchanged (no helper columns leak)
    assert(kept.head.schema.fieldNames.toSeq == Seq("id", "cluster", "q"))
  }

  // ---------------------------------------------------- tokenizerFertility

  test("tokenizerFertility: hand-computed counts under a tiny merge list") {
    // bpeInitSyms appends the </w> end-of-word marker: "low" =
    // [l,o,w,</w>] → (l,o) → [lo,w,</w>] → (lo,w) → [low,</w>]: 2 pieces.
    val df = Seq((1L, "en", "low low"), (2L, "de", "wol")).toDF(
      "doc_id", "lang", "text")
    val out = TextOps.tokenizerFertility(df, col("text"),
      Seq(("l", "o"), ("lo", "w")), "lang").orderBy("lang").collect()
    val de = out(0); val en = out(1)
    assert(en.getAs[String]("lang") == "en")
    assert(en.getAs[Long]("n_words") == 2L)
    assert(en.getAs[Long]("n_subwords") == 4L) // 2 pieces per "low"
    assert(approx(en.getAs[Double]("fertility"), 2.0, 1e-9))
    assert(en.getAs[Long]("n_bytes") == 7L)
    assert(approx(en.getAs[Double]("bytes_per_subword"), 1.75, 1e-9))
    // "wol" shares letters but not merge adjacency: [w,o,l,</w>] has no
    // (l,o) pair → stays 4 pieces
    assert(de.getAs[Long]("n_subwords") == 4L)
    assert(approx(de.getAs[Double]("fertility"), 4.0, 1e-9))
  }

  // ---------------------------------------------------------- kaplanMeier

  test("kaplanMeier: textbook fixture — censoring thins risk without events") {
    val df = Seq((1.0, true), (2.0, false), (3.0, true), (3.0, true),
      (4.0, false), (5.0, true)).toDF("dur", "ev")
    val out = Stats.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    // event times only: 1 (n=6,d=1), 3 (n=4,d=2), 5 (n=1,d=1 → S=0)
    assert(out.map(r => (r.getAs[Double]("t"), r.getAs[Long]("n_risk"),
      r.getAs[Long]("n_events"))).toSeq ==
      Seq((1.0, 6L, 1L), (3.0, 4L, 2L), (5.0, 1L, 1L)))
    val s = out.map(_.getAs[Double]("survival"))
    assert(approx(s(0), 5.0 / 6, 1e-6))
    assert(approx(s(1), 5.0 / 6 * 2.0 / 4, 1e-6))
    assert(s(2) == 0.0) // exhaustion row, no ln(0) anywhere
    // survival is non-increasing
    assert(s.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("kaplanMeier: Greenwood band brackets S and clamps to [0, 1]") {
    val df = Seq((1.0, true), (2.0, false), (3.0, true), (3.0, true),
      (4.0, false), (5.0, true)).toDF("dur", "ev")
    val out = Stats.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    out.foreach { r =>
      val (s, se, lo, hi) = (r.getAs[Double]("survival"),
        r.getAs[Double]("se"), r.getAs[Double]("ci_lo"),
        r.getAs[Double]("ci_hi"))
      assert(lo <= s && s <= hi)
      assert(lo >= 0.0 && hi <= 1.0)
      assert(se >= 0.0)
    }
    // first event time: v = 1/(6·5), se = S·√v hand-checked
    val r0 = out.head
    assert(approx(r0.getAs[Double]("se"),
      (5.0 / 6) * math.sqrt(1.0 / 30), 1e-5))
    // exhaustion row: S = 0 ⇒ se = 0, band collapses to [0, 0]
    assert(out.last.getAs[Double]("se") == 0.0)
    assert(out.last.getAs[Double]("ci_hi") == 0.0)
  }

  // --------------------------------------------------- giniConcentration

  test("giniConcentration: uniform weights → 0; single-owner → (n−1)/n; Lorenz ordered") {
    import graft.ops.Stats
    val uni = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("g", "w")
    val u = Stats.giniConcentration(uni, col("g"), col("w")).collect()
    assert(u.forall(r => approx(r.getAs[Double]("gini"), 0.0, 1e-9)))
    val solo = Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L))
      .toDF("g", "w")
    val s = Stats.giniConcentration(solo, col("g"), col("w")).collect()
    assert(s.forall(r => approx(r.getAs[Double]("gini"), 0.75, 1e-9)))
    // Lorenz: cumulative share non-decreasing, ends at 1
    val mixed = Seq(("a", 1L), ("b", 5L), ("c", 3L), ("d", 11L))
      .toDF("g", "w")
    val m = Stats.giniConcentration(mixed, col("g"), col("w"))
      .orderBy("rank").collect()
    val cs = m.map(_.getAs[Double]("cum_share"))
    assert(cs.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
    assert(approx(cs.last, 1.0, 1e-9))
    assert(m.map(_.getAs[String]("grp")).toSeq == Seq("a", "c", "b", "d"))
  }

  test("kaplanMeier: all censored → empty curve; no censoring matches the ecdf") {
    val cens = Seq((1.0, false), (2.0, false)).toDF("dur", "ev")
    assert(Stats.kaplanMeier(cens, col("dur"), col("ev")).count() == 0L)
    val full = Seq((1.0, true), (2.0, true), (2.0, true), (4.0, true))
      .toDF("dur", "ev")
    val s = Stats.kaplanMeier(full, col("dur"), col("ev"))
      .orderBy("t").collect().map(_.getAs[Double]("survival"))
    // without censoring KM is the empirical survivor function
    assert(approx(s(0), 0.75, 1e-6) && approx(s(1), 0.25, 1e-6)
      && s(2) == 0.0)
  }

  // ------------------------------------------------------------- spearman

  test("spearman: 1 on a nonlinear monotone map (where Pearson < 1); ties via midranks") {
    val mono = (1 to 30).map(i => (i.toDouble, math.exp(i / 5.0)))
      .toDF("x", "y")
    val r = Stats.spearman(mono, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 30L)
    assert(approx(r.getAs[Double]("spearman"), 1.0, 1e-9))
    val anti = (1 to 20).map(i => (i.toDouble, -i * 3.0)).toDF("x", "y")
    assert(approx(Stats.spearman(anti, col("x"), col("y"))
      .head().getAs[Double]("spearman"), -1.0, 1e-9))
    // constant column → null (no division by zero under ANSI)
    val const = (1 to 5).map(i => (i.toDouble, 7.0)).toDF("x", "y")
    assert(Stats.spearman(const, col("x"), col("y")).head()
      .isNullAt(1))
    // tied data uses midranks: x=(1,2,2,3) → rx=(1,2.5,2.5,4),
    // y=(1,3,2,4) → ry as-is; cov=1.5, sd=√1.5·√(5/3) ⇒ ρ=0.948683
    val tied = Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0))
      .toDF("x", "y")
    assert(approx(Stats.spearman(tied, col("x"), col("y"))
      .head().getAs[Double]("spearman"), 1.5 / math.sqrt(1.5 * 5.0 / 3.0),
      1e-6))
  }

  test("spearman: pairwise-complete — nulls in either variable drop the ROW before ranking") {
    // (1,1) (2,2) (3,3) complete; (100, null) and (null, 100) must not
    // inflate the rank tables: ρ over the 3 complete pairs is exactly 1
    val withNulls = Seq(
      (Option(1.0), Option(1.0)), (Option(2.0), Option(2.0)),
      (Option(3.0), Option(3.0)), (Option(100.0), None),
      (None: Option[Double], Option(100.0))).toDF("x", "y")
    val r = Stats.spearman(withNulls, col("x"), col("y")).head()
    assert(r.getAs[Long]("n") == 3L)
    assert(approx(r.getAs[Double]("spearman"), 1.0, 1e-9),
      s"got ${r.getAs[Double]("spearman")}")
    // anti-monotone over the complete pairs, null rows interleaved:
    // would be != -1 if the null rows biased the midranks
    val anti = Seq((Option(1.0), Option(5.0)), (Option(2.0), Option(4.0)),
      (None: Option[Double], Option(0.5)), (Option(3.0), Option(3.0)),
      (Option(0.5), None: Option[Double])).toDF("x", "y")
    assert(approx(Stats.spearman(anti, col("x"), col("y"))
      .head().getAs[Double]("spearman"), -1.0, 1e-9))
  }

  // ------------------------------------------------------ cohortRetention

  test("cohortRetention: hand fixture — cohorts, offsets, distinct-active counts") {
    import graft.ops.Stats
    // period = 10: u1 first at 0 (cohort 0), active periods 0,1,3;
    // u2 cohort 0, active 0 only; u3 cohort 1, active 1,2
    val ev = Seq((1L, 1.0), (1L, 12.0), (1L, 33.0), (1L, 5.0),
      (2L, 7.0), (3L, 15.0), (3L, 25.0)).toDF("u", "ts")
    val out = Stats.cohortRetention(ev, col("u"), col("ts"),
      periodUs = 10L, maxOffset = 6).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Int]("offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Double]("retention"))).toMap
    assert(out((0L, 0)) == ((2L, 2L, 1.0)))
    assert(out((0L, 1)) == ((1L, 2L, 0.5)))
    assert(out((0L, 3)) == ((1L, 2L, 0.5)))
    assert(!out.contains((0L, 2))) // nobody from cohort 0 active at 2
    assert(out((1L, 0)) == ((1L, 1L, 1.0)))
    assert(out((1L, 1)) == ((1L, 1L, 1.0)))
    // offset-0 retention is 1.0 by construction for every cohort
    out.collect { case ((_, 0), (_, _, r)) => r }.foreach(r =>
      assert(r == 1.0))
  }

  // --------------------------------------------------------- extractLinks

  test("extractLinks: ordered href values; unquoted attributes ignored") {
    val df = Seq(
      (1L, """<a href="https://a.com/x">1</a> text <a href="/rel">2</a>"""),
      (2L, """no links here"""),
      (3L, """<a href=bare>skip</a> <a href="kept">ok</a>""")
    ).toDF("id", "text")
    val got = df.select(col("id"),
        graft.ops.TextOps.extractLinks(col("text")).as("ls"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("https://a.com/x", "/rel"))
    assert(got(2L).isEmpty)
    assert(got(3L) == List("kept"))
  }

  // ------------------------------------------------------------ scriptMix

  test("scriptMix: per-range counts, dominant, mixed-script doc") {
    val df = Seq(
      (1L, "abc Привет 你好 12 !"), // 3 latin, 6 cyr, 2 cjk, 2 digit
      (2L, "½½½"),                  // no script chars at all
      (3L, "ααα bb")                // greek 3 vs latin 2 → greek wins
    ).toDF("id", "text")
    val rows = df.select(col("id"), graft.ops.TextOps.scriptMix(col("text"))
      .as("m")).select(col("id"), col("m.*")).orderBy("id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("latin") == 3L)
    assert(r1.getAs[Long]("cyrillic") == 6L)
    assert(r1.getAs[Long]("cjk") == 2L)
    assert(r1.getAs[Long]("digit") == 2L)
    assert(r1.getAs[Long]("space") == 4L)
    assert(r1.getAs[Long]("other") == 1L) // the '!'
    assert(r1.getAs[String]("dominant") == "cyrillic")
    assert(rows(1).getAs[String]("dominant") == "none")
    assert(rows(1).getAs[Long]("other") == 3L) // ½ is no script class
    assert(rows(2).getAs[String]("dominant") == "greek")
  }

  // ------------------------------------------------------------ stripHtml

  test("stripHtml: tags dropped, entities decoded once, whitespace collapsed") {
    val df = Seq(
      (1L, "<p>Hello <b>world</b></p> &amp;amp; &lt;kept&gt;"),
      (2L, "plain   text,  no  tags")
    ).toDF("id", "text")
    val rows = df.select(col("id"), graft.ops.TextOps.stripHtml(col("text"))
      .as("h")).select(col("id"), col("h.*")).orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_tags") == 4L)
    // &amp;amp; decodes ONE level: "&amp;"; &lt;/&gt; become literal <>
    assert(rows(0).getAs[String]("text_clean") == "Hello world &amp; <kept>")
    assert(rows(1).getAs[Long]("n_tags") == 0L)
    assert(rows(1).getAs[String]("text_clean") == "plain text, no tags")
  }

  // -------------------------------------------------------- codeFenceStats

  test("codeFenceStats: blocks counted non-greedily, dangling fence flagged") {
    val two = "a\n```x\ncode1\n```\nb\n```\ncode2\n```\nc"
    val df = Seq((1L, two), (2L, "text ``` open"), (3L, "no fences"))
      .toDF("id", "text")
    val rows = df.select(col("id"),
      graft.ops.TextOps.codeFenceStats(col("text")).as("c"))
      .select(col("id"), col("c.*")).orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_blocks") == 2L) // non-greedy: 2, not 1
    assert(!rows(0).getAs[Boolean]("dangling_fence"))
    val blockChars = "```x\ncode1\n```".length + "```\ncode2\n```".length
    assert(rows(0).getAs[Long]("code_chars") == blockChars.toLong)
    assert(approx(rows(0).getAs[Double]("code_frac"),
      blockChars.toDouble / two.length, 1e-6))
    assert(rows(1).getAs[Long]("n_blocks") == 0L)
    assert(rows(1).getAs[Boolean]("dangling_fence"))
    assert(rows(2).getAs[Long]("n_blocks") == 0L)
    assert(!rows(2).getAs[Boolean]("dangling_fence"))
  }
}
