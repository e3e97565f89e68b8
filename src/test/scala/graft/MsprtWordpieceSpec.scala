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
}
