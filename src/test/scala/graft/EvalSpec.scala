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
}
