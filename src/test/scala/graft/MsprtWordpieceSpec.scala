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
}
