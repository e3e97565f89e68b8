package graft

import org.apache.spark.sql.functions._
import graft.ops.{DataQuality, Experiment, Stats}

/** Hand-computed fixtures for the experimentation/causal family —
  * every expected number below is derived in the comment next to it. */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("srmCheck: exact chi-square on a known split") {
    // arms: a=40, b=60 obs; expected 50/50 of 100.
    // chi2 = (40-50)^2/50 + (60-50)^2/50 = 2 + 2 = 4.
    val df = (Seq.fill(40)("a") ++ Seq.fill(60)("b")).toDF("arm")
    val r = Experiment.srmCheck(df, col("arm"), Seq("a" -> 1.0, "b" -> 1.0))
      .orderBy("arm").collect()
    assert(r.map(_.getAs[Long]("n_obs")).toSeq == Seq(40L, 60L))
    assert(r.forall(x => approx(x.getAs[Double]("n_exp"), 50.0)))
    assert(r.forall(x => approx(x.getAs[Double]("chi2"), 4.0)))
    assert(r.forall(_.getAs[Long]("dof") == 1L))
  }

  test("srmCheck: arm missing from data surfaces with n_obs = 0") {
    val df = Seq("a", "a").toDF("arm")
    val r = Experiment.srmCheck(df, col("arm"), Seq("a" -> 1.0, "b" -> 1.0))
      .orderBy("arm").collect()
    assert(r.map(_.getAs[Long]("n_obs")).toSeq == Seq(2L, 0L))
    // chi2 = (2-1)^2/1 + (0-1)^2/1 = 2
    assert(approx(r.head.getAs[Double]("chi2"), 2.0))
  }

  test("srmCheck: unknown arm in data fails loudly") {
    val df = Seq("a", "zzz").toDF("arm")
    val e = intercept[IllegalArgumentException] {
      Experiment.srmCheck(df, col("arm"), Seq("a" -> 1.0))
    }
    assert(e.getMessage.contains("zzz"))
  }

  test("abConversion: pooled z and Wald CI on a textbook 2x2") {
    // A: 100 units, 20 conv (0.2); B: 100 units, 30 conv (0.3).
    // pooled p = 50/200 = .25; z = .1/sqrt(.25*.75*(2/100)) = 1.632993
    // se_wald = sqrt(.2*.8/100 + .3*.7/100) = sqrt(.0037) = .0608276...
    val units = (1 to 100).map(i => ("a", if (i <= 20) 1 else 0)) ++
      (1 to 100).map(i => ("b", if (i <= 30) 1 else 0))
    val r = Experiment.abConversion(units.toDF("arm", "conv"),
      col("arm"), col("conv"), "a", "b").collect().head
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("x_a") == 20L)
    assert(approx(r.getAs[Double]("rate_b"), 0.3))
    assert(approx(r.getAs[Double]("lift"), 0.1))
    assert(approx(r.getAs[Double]("z"),
      0.1 / math.sqrt(0.25 * 0.75 * (1.0 / 100 + 1.0 / 100)), 1e-12))
    val se = math.sqrt(0.2 * 0.8 / 100 + 0.3 * 0.7 / 100)
    assert(approx(r.getAs[Double]("ci_lo"), 0.1 - 1.96 * se, 1e-12))
    assert(approx(r.getAs[Double]("ci_hi"), 0.1 + 1.96 * se, 1e-12))
  }

  test("cuped: perfectly correlated covariate removes all variance") {
    // y = 2x + arm-offset: pooled theta=2; y_adj variance within arm = 0.
    val rows = Seq(("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      ("b", 1.0, 3.0), ("b", 2.0, 5.0), ("b", 3.0, 7.0))
    val r = Experiment.cuped(rows.toDF("arm", "x", "y"),
      col("arm"), col("x"), col("y")).orderBy("arm").collect()
    // pooled theta: x in {1,2,3} twice, y = 2x (+1 for b): cov(x,y)=2*var(x)
    assert(r.forall(x => approx(x.getAs[Double]("theta"), 2.0)))
    assert(r.forall(x => approx(x.getAs[Double]("var_y_adj"), 0.0)))
    assert(r.forall(x => approx(x.getAs[Double]("var_reduction"), 1.0)))
    // adjusted means keep the true arm difference (b - a = 1)
    val m = r.map(x => x.getAs[String]("arm") -> x.getAs[Double]("mean_y_adj")).toMap
    assert(approx(m("b") - m("a"), 1.0))
  }

  test("cuped: zero-variance covariate degrades to theta = 0 (raw means)") {
    val rows = Seq(("a", 5.0, 1.0), ("a", 5.0, 3.0), ("b", 5.0, 2.0), ("b", 5.0, 6.0))
    val r = Experiment.cuped(rows.toDF("arm", "x", "y"),
      col("arm"), col("x"), col("y")).orderBy("arm").collect()
    assert(r.forall(x => approx(x.getAs[Double]("theta"), 0.0)))
    assert(r.forall(x => approx(x.getAs[Double]("mean_y_adj"),
      x.getAs[Double]("mean_y"))))
  }

  test("diffInDiff: exact 2x2 arithmetic") {
    // cells (t,post): c0 mean 10, c1 mean 12, t0 mean 20, t1 mean 25
    // did = (25-20) - (12-10) = 3
    val rows =
      Seq((false, false, 9.0), (false, false, 11.0),
        (false, true, 11.0), (false, true, 13.0),
        (true, false, 19.0), (true, false, 21.0),
        (true, true, 24.0), (true, true, 26.0))
    val r = Experiment.diffInDiff(rows.toDF("tr", "post", "y"),
      col("tr"), col("post"), col("y")).collect().head
    assert(approx(r.getAs[Double]("did"), 3.0))
    // each cell: var_samp = 2, n = 2 -> se = sqrt(4*2/2) = 2
    assert(approx(r.getAs[Double]("se"), 2.0))
    assert(approx(r.getAs[Double]("ci_lo"), 3.0 - 1.96 * 2.0))
  }

  test("olsPerGroup: recovers an exact line and R^2 = 1") {
    // group g: y = 3x + 7 exactly; group h: constant x -> null slope.
    val rows = Seq(("g", 1.0, 10.0), ("g", 2.0, 13.0), ("g", 3.0, 16.0),
      ("h", 4.0, 1.0), ("h", 4.0, 9.0))
    val r = Experiment.olsPerGroup(rows.toDF("grp", "x", "y"),
      col("grp"), col("x"), col("y")).orderBy("grp").collect()
    val g = r.head
    assert(approx(g.getAs[Double]("slope"), 3.0))
    assert(approx(g.getAs[Double]("intercept"), 7.0))
    assert(approx(g.getAs[Double]("r2"), 1.0))
    assert(r(1).isNullAt(r(1).fieldIndex("slope")))
    assert(r(1).isNullAt(r(1).fieldIndex("r2")))
  }

  test("nelsonAalen: hand-computed hazard, variance, and FH survival") {
    // durations: events at t=1 (n=5, d=1), t=3 (n=3, d=2); censored at
    // t=2 (c=1); survivor censored at t=4.
    // H(1) = 1/5 = .2; H(3) = .2 + 2/3 = .866667
    // v(1) = 1/25 = .04 -> se .2; v(3) = .04 + 2/9 -> se .512077
    val rows = Seq((1.0, true), (2.0, false), (3.0, true), (3.0, true),
      (4.0, false))
    val r = Stats.nelsonAalen(rows.toDF("t", "e"), col("t"), col("e"))
      .collect()
    assert(r.map(_.getAs[Double]("t")).toSeq == Seq(1.0, 3.0))
    assert(r.map(_.getAs[Long]("n_risk")).toSeq == Seq(5L, 3L))
    assert(approx(r(0).getAs[Double]("cum_hazard"), 0.2))
    assert(approx(r(1).getAs[Double]("cum_hazard"), 0.866667, 1e-6))
    assert(approx(r(0).getAs[Double]("se"), 0.2))
    assert(approx(r(1).getAs[Double]("se"),
      math.sqrt(0.04 + 2.0 / 9.0), 1e-6))
    assert(approx(r(0).getAs[Double]("survival_fh"), math.exp(-0.2), 1e-6))
    // exhaustion (d = n at the last time) needs no special case
    val all = Seq((1.0, true), (1.0, true))
    val rr = Stats.nelsonAalen(all.toDF("t", "e"), col("t"), col("e")).collect()
    assert(approx(rr(0).getAs[Double]("cum_hazard"), 1.0))
  }

  test("benford: integer-exact digit extraction and fixed 9-row shape") {
    // values: first cents-digits 1,1,2,9; plus a zero/negative dropped.
    val df = Seq(1.23, 0.10, 12.34, 2.00, 9.99, 0.0, -5.0).toDF("v")
    // cents: 123, 10, 1234, 200, 999 -> digits 1,1,1,2,9
    val r = DataQuality.benford(df, col("v"), scale = 2)
      .orderBy("digit").collect()
    assert(r.length == 9)
    val byD = r.map(x => x.getAs[Int]("digit") -> x.getAs[Long]("n_obs")).toMap
    assert(byD(1) == 3L && byD(2) == 1L && byD(9) == 1L && byD(5) == 0L)
    assert(approx(r.map(_.getAs[Double]("share")).sum, 1.0))
    // p_exp sums to 1 (Benford law is a distribution)
    assert(approx(r.map(_.getAs[Double]("p_exp")).sum, 1.0, 1e-12))
    // chi2 equals the sum of contribs
    val chi2 = r.head.getAs[Double]("chi2")
    assert(approx(chi2, r.map(_.getAs[Double]("contrib")).sum, 1e-9))
  }

  test("benford: a Benford-conforming sample scores near-zero chi2") {
    // construct counts proportional to the law itself (scaled x1000)
    val vals = (1 to 9).flatMap { d =>
      val n = math.round(math.log10(1.0 + 1.0 / d) * 1000).toInt
      Seq.fill(n)(d * 1.11)
    }
    val r = DataQuality.benford(vals.toDF("v"), col("v"), scale = 2)
      .select("chi2").collect().head.getDouble(0)
    assert(r < 1.0, s"conforming sample chi2 $r should be tiny")
  }
}
