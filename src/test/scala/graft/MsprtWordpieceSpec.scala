package graft

import org.apache.spark.sql.functions._
import graft.ops.{Experiment, TextOps}

/** Hand fixtures for the mSPRT sequential test and the WordPiece
  * tokenizer. */
class MsprtWordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("msprt: null effect keeps p at 1; real effect drives p down monotonically") {
    // periods 1..8: arm a ~ N(0-ish): values 0/1 alternating; arm b
    // identical under null, +10 under effect.
    def rows(effect: Double) = (1 to 8).flatMap { p =>
      (1 to 20).map(i => ("a", p, (i % 2).toDouble)) ++
        (1 to 20).map(i => ("b", p, (i % 2).toDouble + effect))
    }
    val nul = Experiment.msprt(rows(0.0).toDF("arm", "p", "y"),
      col("arm"), col("p"), col("y"), "a", "b", tau2 = 4.0)
      .orderBy("p").collect()
    assert(nul.forall(_.getAs[Double]("p_always_valid") == 1.0),
      "identical arms must never reject")
    val eff = Experiment.msprt(rows(10.0).toDF("arm", "p", "y"),
      col("arm"), col("p"), col("y"), "a", "b", tau2 = 4.0)
      .orderBy("p").collect()
    val ps = eff.map(_.getAs[Double]("p_always_valid"))
    assert(ps.sliding(2).forall(a => a(1) <= a(0)),
      s"always-valid p must be nonincreasing: ${ps.mkString(",")}")
    assert(ps.last < 0.01, s"strong effect must reject, got ${ps.last}")
    assert(eff.forall(r => approx(r.getAs[Double]("delta"), 10.0, 1e-9)))
  }

  test("msprt: lambda formula matches a by-hand computation at one look") {
    // one period: a = {0, 2}, b = {10, 12}: means 1, 11; pooled var =
    // (2 + 2)/2 = 2; se2 = 2*(1/2+1/2) = 2; delta = 10; tau2 = 2.
    val rows = Seq(("a", 1, 0.0), ("a", 1, 2.0), ("b", 1, 10.0), ("b", 1, 12.0))
    val r = Experiment.msprt(rows.toDF("arm", "p", "y"),
      col("arm"), col("p"), col("y"), "a", "b", tau2 = 2.0)
      .collect().head
    val expected = 0.5 * math.log(2.0 / 4.0) + 100.0 * 2.0 / (2.0 * 2.0 * 4.0)
    assert(approx(r.getAs[Double]("log_lambda"), expected, 1e-6))
    assert(approx(r.getAs[Double]("p_always_valid"),
      math.exp(-math.rint(expected * 1e6) / 1e6), 1e-9))
  }

  test("wordpieceEncode: greedy longest-match, continuation, and UNK") {
    // vocab: "un" "##able" "##a" "##b" "##l" "##e" "x" — "unable" must
    // take un + ##able (longest), not un + ##a + ##b + ...
    val vocab = Seq("un", "##able", "##a", "##b", "##l", "##e", "x")
    val df = Seq((1L, "unable x unq")).toDF("id", "text")
    val r = TextOps.wordpieceEncode(df, col("text"), vocab).collect().head
    assert(r.getAs[scala.collection.Seq[String]]("wp_tokens").toSeq ==
      Seq("un", "##able", "x", "[UNK]"))
    // "unq": 'q' matches nothing -> whole word UNK (not partial pieces)
    assert(r.getAs[Long]("wp_n_unk_words") == 1L)
    assert(r.getAs[Long]("wp_n_words") == 3L)
    assert(r.getAs[Long]("wp_n_tokens") == 4L)
  }

  test("wordpieceVocabFit: top words, char floor, and ## forms") {
    val df = Seq.fill(6)("hello world").mkString(" ")
      .split(" ").toSeq.toDF("text") // hello x6, world x6
    val v = TextOps.wordpieceVocabFit(df, col("text"), topWords = 1,
      minCharCount = 6L)
    assert(v.contains("hello")) // top-1 word: hello < world lexicographic tie
    assert(v.contains("l") && v.contains("##l")) // l appears 12+6 times
    assert(!v.contains("hello world"))
    // every char in both forms
    assert(v.count(_.startsWith("##")) == (v.count(!_.startsWith("##")) - 1))
  }

  test("logRank: identical groups score ~0; separated groups reject") {
    import graft.ops.Stats
    // identical lifetimes in both groups -> O == E, chi2 == 0
    val same = (1 to 30).flatMap(i =>
      Seq(("a", i % 5 + 1, true), ("b", i % 5 + 1, true)))
    val r0 = Stats.logRank(same.toDF("g", "t", "e"), col("t"), col("e"),
      col("g"), "a", "b").collect().head
    assert(approx(r0.getAs[Double]("chi2"), 0.0, 1e-9))
    // group a dies at 1, group b at 10 -> maximal separation
    val sep = (1 to 20).map(i => ("a", 1, true)) ++
      (1 to 20).map(i => ("b", 10, true))
    val r1 = Stats.logRank(sep.toDF("g", "t", "e"), col("t"), col("e"),
      col("g"), "a", "b").collect().head
    assert(r1.getAs[Double]("chi2") > 20.0)
    assert(r1.getAs[Long]("observed_a") == 20L)
  }

  test("logRank: hand-computed single event time") {
    import graft.ops.Stats
    // t=1: n_a=2, n_b=2, d_a=1, d_b=0; E = 1*2/4 = .5
    // V = 1*2*2*(4-1)/(16*3) = .25; chi2 = .25/.25 = 1
    val rows = Seq(("a", 1, true), ("a", 2, false),
      ("b", 2, false), ("b", 3, false))
    val r = Stats.logRank(rows.toDF("g", "t", "e"), col("t"), col("e"),
      col("g"), "a", "b").collect().head
    assert(approx(r.getAs[Double]("expected_a"), 0.5, 1e-12))
    assert(approx(r.getAs[Double]("variance"), 0.25, 1e-12))
    assert(approx(r.getAs[Double]("chi2"), 1.0, 1e-12))
  }

  test("cmh: Simpson's paradox — stratified test sees no effect where pooled does") {
    import graft.ops.Experiment
    // classic: within each stratum rates are EQUAL across arms, but
    // strata sizes differ by arm -> pooled rates differ, CMH chi2 ~ 0.
    val rows =
      (1 to 80).map(i => ("s1", "a", if (i <= 8) 1 else 0)) ++   // 10%
      (1 to 20).map(i => ("s1", "b", if (i <= 2) 1 else 0)) ++   // 10%
      (1 to 20).map(i => ("s2", "a", if (i <= 10) 1 else 0)) ++  // 50%
      (1 to 80).map(i => ("s2", "b", if (i <= 40) 1 else 0))     // 50%
    val r = Experiment.cmh(rows.toDF("s", "arm", "c"), col("s"),
      col("arm"), col("c"), "a", "b").collect().head
    assert(approx(r.getAs[Double]("chi2"), 0.0, 1e-9),
      s"chi2 ${r.getAs[Double]("chi2")}")
    assert(approx(r.getAs[Double]("or_mh"), 1.0, 1e-9))
    // pooled rates for contrast: a = 18/100, b = 42/100 — wildly unequal
  }

  test("cmh: zero-margin strata are excluded and counted") {
    import graft.ops.Experiment
    val rows = Seq(("s1", "a", 1), ("s1", "a", 0), ("s1", "b", 1),
      ("s2", "a", 0), ("s2", "a", 0), ("s2", "b", 0)) // s2: m1 = 0
    val r = Experiment.cmh(rows.toDF("s", "arm", "c"), col("s"),
      col("arm"), col("c"), "a", "b").collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_informative") == 1L)
  }

  test("anovaF: textbook 3-group fixture and null when groups are flat") {
    import graft.ops.Stats
    // groups: {1,2,3}, {2,3,4}, {3,4,5}: grand = 3, group means 2,3,4
    // ssb = 3*(1+0+1) = 6; ssw = 3 groups * 2 = 6; F = (6/2)/(6/6) = 3
    val rows = Seq(("a",1.0),("a",2.0),("a",3.0),("b",2.0),("b",3.0),
      ("b",4.0),("c",3.0),("c",4.0),("c",5.0))
    val r = Stats.anovaF(rows.toDF("g","y"), col("g"), col("y"))
      .collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(approx(r.getAs[Double]("ss_between"), 6.0, 1e-9))
    assert(approx(r.getAs[Double]("ss_within"), 6.0, 1e-9))
    assert(approx(r.getAs[Double]("f_stat"), 3.0, 1e-9))
    // constant groups -> ssw = 0 -> null F (guarded, no division blowup)
    val flat = Seq(("a",1.0),("a",1.0),("b",2.0),("b",2.0))
    val rf = Stats.anovaF(flat.toDF("g","y"), col("g"), col("y"))
      .collect().head
    assert(rf.isNullAt(rf.fieldIndex("f_stat")))
  }

  test("cochranArmitage: positive trend detected, flat rate z ~ 0") {
    import graft.ops.Stats
    // doses 0,1,2 with rates .1, .5, .9 over 20 each -> strong + trend
    def mk(rates: Seq[Double]) = rates.zipWithIndex.flatMap { case (r, d) =>
      (1 to 20).map(i => (d.toDouble, if (i <= (r * 20).round) 1 else 0)) }
    val up = Stats.cochranArmitage(mk(Seq(.1,.5,.9)).toDF("s","y"),
      col("s"), col("y")).collect().head
    assert(up.getAs[Double]("z") > 4.0)
    val flat = Stats.cochranArmitage(mk(Seq(.5,.5,.5)).toDF("s","y"),
      col("s"), col("y")).collect().head
    assert(approx(flat.getAs[Double]("z"), 0.0, 1e-9))
  }

  test("brierDecomposition: identity holds exactly for bin-constant forecasts") {
    import graft.ops.Calibration
    // forecasts constant within bins: p=.25 (obs rate .5), p=.75 (rate .75)
    val rows = Seq((0.25,0),(0.25,1),(0.25,0),(0.25,1),
      (0.75,1),(0.75,1),(0.75,1),(0.75,0))
    val r = Calibration.brierDecomposition(rows.toDF("p","y"),
      col("y"), col("p"), bins = 4).collect().head
    val (rel, res, unc, brier) = (r.getAs[Double]("reliability"),
      r.getAs[Double]("resolution"), r.getAs[Double]("uncertainty"),
      r.getAs[Double]("brier"))
    assert(approx(brier, rel - res + unc, 1e-12),
      s"identity: $brier vs ${rel - res + unc}")
    // rel = (.5*(.25-.5)^2 + .5*(.75-.75)^2) = .03125
    assert(approx(rel, 0.03125, 1e-12))
    assert(approx(unc, 0.625 * 0.375, 1e-12))
  }

  test("liftCurve: perfect ranker gains; uniform scores lift ~ 1") {
    import graft.ops.Curves
    // scores equal labels-ish: top decile catches all responders
    val rows = (1 to 100).map(i => (if (i <= 10) 1 else 0, i / 100.0 +
      (if (i <= 10) 1.0 else 0.0)))
    val r = Curves.liftCurve(rows.toDF("y","s"), col("y"), col("s"), 10)
      .collect()
    val top = r.head
    assert(approx(top.getAs[Double]("cum_gain"), 1.0, 1e-9),
      "top bucket must capture all responders")
    assert(top.getAs[Double]("lift") > 9.0)
    assert(approx(r.last.getAs[Double]("cum_gain"), 1.0, 1e-12))
    assert(approx(r.last.getAs[Double]("cum_pop_share"), 1.0, 1e-12))
  }
}
