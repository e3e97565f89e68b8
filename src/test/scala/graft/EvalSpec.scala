package graft

import org.apache.spark.sql.functions._
import graft.ops.Eval

/** pass@k estimator + Fleiss' kappa — combinatorial and textbook pins. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("passAtK matches the closed-form C(n-c,k)/C(n,k) and its edges") {
    // p1: n=10, c=3, k=5 → 1 − C(7,5)/C(10,5) = 1 − 21/252 = 11/12
    // p2: c=0 → 0; p3: c > n−k → exact 1 (zero factor); p4: n<k dropped
    val rows =
      (1 to 10).map(i => ("p1", i <= 3)) ++
      (1 to 10).map(_ => ("p2", false)) ++
      (1 to 6).map(i => ("p3", i <= 4)) ++
      (1 to 3).map(_ => ("p4", true))
    val out = Eval.passAtK(rows.toDF("p", "ok"), col("p"), col("ok"), k = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pass_at_k"))
      .toMap
    assert(approx(out("p1"), 11.0 / 12.0, 1e-12))
    assert(approx(out("p2"), 0.0))
    assert(approx(out("p3"), 1.0))
    assert(!out.contains("p4"))
  }

  test("passAtK at k = n reduces to 'any correct'") {
    val rows = (1 to 5).map(i => ("a", i == 3)) ++
      (1 to 5).map(_ => ("b", false))
    val out = Eval.passAtK(rows.toDF("p", "ok"), col("p"), col("ok"), k = 5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pass_at_k"))
      .toMap
    assert(approx(out("a"), 1.0))
    assert(approx(out("b"), 0.0))
  }

  test("fleissKappa matches the hand-computed two-item fixture") {
    // item 1: a,a,a (P=1); item 2: a,b,b (P=1/3) → P̄=2/3, P_e=5/9,
    // κ = (2/3 − 5/9)/(4/9) = 0.25
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b"),
      (2, "b")).toDF("i", "c")
    val r = Eval.fleissKappa(df, col("i"), col("c")).head()
    assert(r.getAs[Long]("n_items") == 2 && r.getAs[Long]("n_raters") == 3)
    assert(approx(r.getAs[Double]("p_bar"), 2.0 / 3.0, 1e-12))
    assert(approx(r.getAs[Double]("p_e"), 5.0 / 9.0, 1e-12))
    assert(approx(r.getAs[Double]("kappa"), 0.25, 1e-12))
  }

  test("fleissKappa: perfect agreement gives kappa = 1; " +
    "unequal rating counts refuse loudly") {
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"))
      .toDF("i", "c")
    assert(approx(Eval.fleissKappa(perfect, col("i"), col("c"))
      .head().getAs[Double]("kappa"), 1.0, 1e-12))
    val ragged = Seq((1, "x"), (1, "x"), (2, "y")).toDF("i", "c")
    val e = intercept[IllegalArgumentException] {
      Eval.fleissKappa(ragged, col("i"), col("c"))
    }
    assert(e.getMessage.contains("unequal rating counts"))
  }

  test("mcnemar matches the hand-computed 2x2 cells and nulls the " +
    "statistic when the models never disagree") {
    // y: 6 rows; A right on 1-4, B right on 1-2 and 5:
    // both=2 (r1, r2), a_only=2 (r3, r4), b_only=1 (r5), both_wrong=1 (r6)
    val rows = Seq(
      (1, 1, 1), (1, 1, 1),          // both correct
      (1, 1, 0), (1, 1, 0),          // only A
      (1, 0, 1),                     // only B
      (1, 0, 0))                     // both wrong
      .toDF("y", "pa", "pb")
    val r = Eval.mcnemar(rows, col("y"), col("pa"), col("pb")).head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_both_correct") == 2L)
    assert(r.getAs[Long]("n_a_only") == 2L)
    assert(r.getAs[Long]("n_b_only") == 1L)
    assert(r.getAs[Long]("n_both_wrong") == 1L)
    assert(approx(r.getAs[Double]("acc_a"), 4.0 / 6))
    assert(approx(r.getAs[Double]("acc_b"), 3.0 / 6))
    // chi2_cc = (|2-1|-1)^2/(2+1) = 0
    assert(approx(r.getAs[Double]("chi2_cc"), 0.0))
    // identical predictions: b = c = 0 → null statistic, not 0/0
    val same = Eval.mcnemar(rows, col("y"), col("pa"), col("pa")).head()
    assert(same.isNullAt(same.fieldIndex("chi2_cc")))
    // NULL predictions drop the row entirely (n shrinks)
    val withNull = Seq((Some(1), Some(1), Some(1)),
      (Some(1), None, Some(1))).toDF("y", "pa", "pb")
    assert(Eval.mcnemar(withNull, col("y"), col("pa"), col("pb"))
      .head().getAs[Long]("n") == 1L)
  }

  test("bradleyTerry recovers the skill ordering, is invariant to the " +
    "judgment log's row order, and refuses an all-win item") {
    // round-robin log with a strict skill gradient: in 10 games per
    // pair, the higher-named item wins 7 (no item is unbeaten)
    val pairs = for {
      a <- Seq("x", "y", "z"); b <- Seq("x", "y", "z") if a < b
      g <- 1 to 10
    } yield if (g <= 7) (b, a) else (a, b)
    val out = Eval.bradleyTerry(pairs.toDF("w", "l"), col("w"), col("l"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("rating"), r.getAs[Long]("rank"))).toMap
    assert(out("z")._1 > out("y")._1 && out("y")._1 > out("x")._1)
    assert(out("z")._2 == 1L && out("x")._2 == 3L)
    // every item played 20 games; z won 14, x won 6
    val full = Eval.bradleyTerry(pairs.toDF("w", "l"), col("w"), col("l"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_wins"), r.getAs[Long]("n_games"))).toMap
    assert(full("z") == ((14L, 20L)) && full("x") == ((6L, 20L)))
    // row order must not move the fit (the grid collapse is order-free
    // and the MM loop runs on snapped values)
    val shuffled = pairs.reverse
    val out2 = Eval.bradleyTerry(shuffled.toDF("w", "l"), col("w"),
        col("l"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rating")).toMap
    assert(out.forall { case (k, (v, _)) => out2(k) == v })
    // an unbeaten item has no finite MLE — loud refusal
    val unbeaten = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("w", "l")
    val e = intercept[IllegalArgumentException] {
      Eval.bradleyTerry(unbeaten, col("w"), col("l"))
    }
    assert(e.getMessage.contains("no finite MLE"))
  }

  test("tokenF1 matches the SQuAD recipe on hand-computed pairs") {
    val rows = Seq(
      // multiset overlap: pred "a a b", ref "a b b" → common = min
      // counts = a:1+... = 1 + 1 = 2; P = 2/3, R = 2/3, F1 = 2/3
      (1L, "a a b", "a b b"),
      // exact match through normalization (case + punctuation)
      (2L, "The cat!", "the CAT"),
      // disjoint → f1 = 0, em = 0
      (3L, "x y", "z w"),
      // both sides normalize to nothing → f1 = em = 1
      (4L, "!!!", "???"),
      // one side empty → f1 = em = 0
      (5L, "x", "!!!"))
      .toDF("id", "p", "r")
    val out = Eval.tokenF1(rows, col("id"), col("p"), col("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("f1"), r.getAs[Long]("exact_match"))).toMap
    assert(approx(out(1L)._1, 2.0 / 3) && out(1L)._2 == 0L)
    assert(approx(out(2L)._1, 1.0) && out(2L)._2 == 1L)
    assert(approx(out(3L)._1, 0.0) && out(3L)._2 == 0L)
    assert(approx(out(4L)._1, 1.0) && out(4L)._2 == 1L)
    assert(approx(out(5L)._1, 0.0) && out(5L)._2 == 0L)
  }

  test("tokenF1: the zero-shuffle native-overlap form is bit-equal to " +
    "the exploded count-join baseline") {
    // deterministic word soup with real multiset structure (repeats,
    // partial overlap, punctuation, empty-normalization rows)
    val rows = (0 until 200).map { i =>
      def words(salt: Int, n: Int) = (0 until n)
        .map(k => s"w${(i * 31 + k * salt) % 17}").mkString(" ")
      val p = if (i % 19 == 0) "!!!" else words(3, 5 + i % 7) + "; extra."
      val r = if (i % 23 == 0) "" else words(5, 4 + i % 6)
      (i.toLong, p, r)
    }.toDF("id", "p", "r")
    def face(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fast = face(Eval.tokenF1(rows, col("id"), col("p"), col("r")))
    val slow = face(Eval.tokenF1Exploded(rows, col("id"), col("p"),
      col("r")))
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, v) => assert(v == slow(k), s"id $k: $v vs ${slow(k)}") }
  }
}
