package graft

import org.apache.spark.sql.functions._
import graft.ops.Calibration

/** Hand-computed fixtures for the calibration / label-quality suite
  * (reliability table, ECE/MCE/Brier, Cohen's kappa, confident-learning
  * label noise). */
class CalibrationSpec extends SparkSpec {

  test("isotonicFit: hand-computed PAVA pools; apply is monotone and total") {
    import graft.ops.Calibration
    import spark.implicits._
    // 4 populated bins of 10 rows with accuracies .1/.3/.2/.4 at bins
    // 1/3/6/8 (gaps exercise carry-forward): PAVA pools bins 3+6 -> .25
    def rows(score: Double, pos: Int): Seq[(Double, Int)] =
      (0 until 10).map(i => (score, if (i < pos) 1 else 0))
    val df = (rows(0.15, 1) ++ rows(0.35, 3) ++ rows(0.65, 2) ++ rows(0.85, 4))
      .toDF("score", "y")
    val m = Calibration.isotonicFit(df, col("y"), col("score"), bins = 10)
    assert(m.calibrated(1) == 0.1 && m.calibrated(3) == 0.25 &&
      m.calibrated(6) == 0.25 && m.calibrated(8) == 0.4, m.calibrated.toSeq)
    // gaps: leading bins take the first observed value; others carry forward
    assert(m.calibrated(0) == 0.1 && m.calibrated(2) == 0.1 &&
      m.calibrated(4) == 0.25 && m.calibrated(7) == 0.25 &&
      m.calibrated(9) == 0.4, m.calibrated.toSeq)
    // the map is monotone non-decreasing — the isotonic contract
    assert(m.calibrated.toSeq == m.calibrated.toSeq.sorted)
    // application: literal projection matches the array at the bin
    val applied = df.select(col("score"),
        Calibration.isotonicApply(col("score"), m).as("c"))
      .distinct().collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(applied(0.15) == 0.1 && applied(0.35) == 0.25 &&
      applied(0.65) == 0.25 && applied(0.85) == 0.4)
  }

  import spark.implicits._

  private lazy val scored = Seq((1, 0.9), (0, 0.8), (1, 0.7), (1, 0.6), (0, 0.4), (0, 0.3))
    .toDF("y", "s")

  test("reliabilityTable bins, counts, confidence, accuracy by hand") {
    val rows = Calibration.reliabilityTable(scored, col("y"), col("s"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // each score lands alone in its own bin: floor(s*10)
    assert(rows.toSeq == Seq(
      (3, 1L, 0.3, 0.0), (4, 1L, 0.4, 0.0), (6, 1L, 0.6, 1.0),
      (7, 1L, 0.7, 1.0), (8, 1L, 0.8, 0.0), (9, 1L, 0.9, 1.0)))
  }

  test("reliabilityTable clamps score = 1.0 into the last bin") {
    val df = Seq((1, 1.0), (0, 0.0)).toDF("y", "s")
    val bins = Calibration.reliabilityTable(df, col("y"), col("s"), bins = 4)
      .select("bin").as[Int].collect().sorted
    assert(bins.toSeq == Seq(0, 3))
  }

  test("ECE / MCE / Brier match hand computation at 2 bins") {
    // bin0: (.4,0) (.3,0) -> conf .35 acc 0, gap .35 ; bin1: (.9,1)(.8,0)(.7,1)(.6,1)
    // -> conf .75 acc .75, gap 0.  ECE = 2/6*.35 ; MCE = .35
    // Brier = (0.01+0.64+0.09+0.16+0.16+0.09)/6 = 1.15/6
    val r = Calibration.calibrationErrors(scored, col("y"), col("s"), bins = 2).head()
    assert(approx(r.getDouble(0), 0.35 / 3, 1e-12), s"ece=${r.getDouble(0)}")
    assert(approx(r.getDouble(1), 0.35, 1e-12))
    assert(approx(r.getDouble(2), 1.15 / 6, 1e-12))
  }

  test("cohensKappa matches the textbook 2x2 example") {
    // cells: (0,0)=20 (0,1)=5 (1,0)=10 (1,1)=15 -> po=.7, pe=.5, kappa=.4
    val rows = Seq.fill(20)((0, 0)) ++ Seq.fill(5)((0, 1)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(15)((1, 1))
    val df = rows.toDF("a", "b")
    val r = Calibration.cohensKappa(df, col("a"), col("b")).head()
    assert(approx(r.getDouble(0), 0.7, 1e-12))
    assert(approx(r.getDouble(1), 0.5, 1e-12))
    assert(approx(r.getDouble(2), 0.4, 1e-12))
  }

  test("cohensKappa is 1 on perfect agreement, 0 at chance") {
    val perfect = Seq((0, 0), (1, 1), (2, 2), (0, 0)).toDF("a", "b")
    assert(approx(Calibration.cohensKappa(perfect, col("a"), col("b"))
      .head().getDouble(2), 1.0, 1e-12))
    // independent uniform marginals: po == pe -> kappa 0
    val chance = (for (i <- 0 until 2; j <- 0 until 2) yield (i, j)).toDF("a", "b")
    assert(approx(Calibration.cohensKappa(chance, col("a"), col("b"))
      .head().getDouble(2), 0.0, 1e-12))
  }

  test("labelNoise flags exactly the threshold-clearing off-class rows") {
    // t0 = (.9+.5)/2 = .7 ; t1 = (.7+.1)/2 = .4 ; t2 = .8
    val df = Seq(
      (1L, 0, Seq(0.9, 0.05, 0.05)),
      (2L, 0, Seq(0.5, 0.45, 0.05)),   // p1 .45 >= t1 -> suggest 1
      (3L, 1, Seq(0.2, 0.7, 0.1)),
      (4L, 1, Seq(0.85, 0.1, 0.05)),   // p0 .85 >= t0 -> suggest 0
      (5L, 2, Seq(0.1, 0.1, 0.8))
    ).toDF("id", "y", "p")
    val out = Calibration.labelNoise(df, col("id"), col("y"), col("p"), k = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq((2L, 0, 1, -0.05), (4L, 1, 0, 0.75)))
  }

  test("labelNoise never suggests a class unseen as a given label") {
    // class 1 has no self-labeled rows -> threshold +inf -> no flags
    val df = Seq(
      (1L, 0, Seq(0.6, 0.4)),
      (2L, 0, Seq(0.3, 0.7))
    ).toDF("id", "y", "p")
    assert(Calibration.labelNoise(df, col("id"), col("y"), col("p"), k = 2).count() == 0)
  }

  test("labelNoise picks the argmax candidate when several classes clear") {
    // single class-0 row, thresholds t1 = .2, t2 = .3 from self-labeled rows
    val df = Seq(
      (1L, 1, Seq(0.5, 0.2, 0.3)),
      (2L, 2, Seq(0.4, 0.3, 0.3)),
      (3L, 0, Seq(0.2, 0.35, 0.45))    // both 1 and 2 clear; argmax = 2
    ).toDF("id", "y", "p")
    val out = Calibration.labelNoise(df, col("id"), col("y"), col("p"), k = 3)
      .where(col("id") === 3L).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq == Seq((0, 2, 0.25)))
  }

  // ---- Platt scaling ----

  test("plattFit learns a decreasing z (A < 0) on positively-correlated " +
    "scores and plattApply is monotone in s") {
    // y more likely at high s, with overlap so Newton stays finite
    val rows = (0 until 400).map { i =>
      val s0 = (i % 100) / 100.0
      (s0, if ((s0 * 100 + i % 7).toInt % 10 < s0 * 10) 1 else 0)
    }
    val df = spark.createDataFrame(rows).toDF("s", "y")
    val m = Calibration.plattFit(df, col("y"), col("s"))
    assert(m.a < 0) // P = sigmoid(-(a*s+b)) increasing in s needs a < 0
    val cal = df.select(round(Calibration.plattApply(col("s"), m), 9)
        .as("p"), col("s")).distinct().orderBy("s").collect()
      .map(_.getAs[Double]("p"))
    assert(cal.zip(cal.tail).forall { case (lo, hi) => lo <= hi })
    assert(cal.forall(p => p > 0.0 && p < 1.0))
  }

  test("plattFit is bit-stable across partitionings (the 9-dp snap)") {
    val rows = (0 until 500).map { i =>
      ((i % 97) / 97.0, if ((i * 31) % 100 < (i % 97)) 1 else 0)
    }
    val df = spark.createDataFrame(rows).toDF("s", "y")
    val m1 = Calibration.plattFit(df.coalesce(1), col("y"), col("s"))
    val m7 = Calibration.plattFit(df.repartition(7), col("y"), col("s"))
    assert(m1.a == m7.a && m1.b == m7.b)
  }

  test("plattFit on label-independent scores calibrates to the base rate") {
    // score carries no signal: the fitted sigmoid should be ~flat at
    // the positive rate (0.25 here)
    val rows = (0 until 400).map(i => ((i % 20) / 20.0, if (i % 4 == 0) 1 else 0))
    val df = spark.createDataFrame(rows).toDF("s", "y")
    val m = Calibration.plattFit(df, col("y"), col("s"))
    val p = df.select(avg(Calibration.plattApply(col("s"), m))).head().getDouble(0)
    assert(math.abs(p - 0.25) < 0.02)
  }

  test("plattFit refuses single-class input loudly") {
    val df = Seq((0.1, 1), (0.9, 1)).toDF("s", "y")
    val e = intercept[IllegalArgumentException] {
      Calibration.plattFit(df, col("y"), col("s"))
    }
    assert(e.getMessage.contains("both classes"))
  }

  // ---- Temperature scaling ----

  test("temperatureFit softens overconfident logits (T > 1) and " +
    "sharpens underconfident ones (T < 1); argmax is invariant") {
    // overconfident: huge margins but labels only 60% right
    val over = (0 until 200).map { i =>
      val y = if (i % 5 < 3) 0 else 1 // argmax says 0; right 60% of rows
      (y, Seq(4.0, 0.0))
    }
    val dfOver = spark.createDataFrame(over).toDF("y", "z")
    val mOver = Calibration.temperatureFit(dfOver, col("y"), col("z"))
    assert(mOver.t > 1.0, s"expected softening, got T=${mOver.t}")
    // underconfident: tiny margins, labels always match argmax
    val under = (0 until 200).map(i =>
      (i % 2, if (i % 2 == 0) Seq(0.1, 0.0) else Seq(0.0, 0.1)))
    val dfUnder = spark.createDataFrame(under).toDF("y", "z")
    val mUnder = Calibration.temperatureFit(dfUnder, col("y"), col("z"))
    assert(mUnder.t < 1.0, s"expected sharpening, got T=${mUnder.t}")
    // argmax invariance + probabilities sum to 1
    val probs = dfUnder.select(
      Calibration.temperatureApply(col("z"), mUnder).as("p")).collect()
      .map(_.getSeq[Double](0))
    probs.foreach(p => assert(approx(p.sum, 1.0, 1e-9)))
    val flips = dfUnder.select(col("z"),
      Calibration.temperatureApply(col("z"), mUnder).as("p")).collect()
      .count { r =>
        val z = r.getSeq[Double](0); val p = r.getSeq[Double](1)
        z.indexOf(z.max) != p.indexOf(p.max)
      }
    assert(flips == 0)
  }

  test("temperatureFit is bit-stable across partitionings") {
    val rows = (0 until 300).map(i =>
      (i % 3, Seq((i % 7) / 7.0, (i % 5) / 5.0, (i % 3) / 3.0)))
    val df = spark.createDataFrame(rows).toDF("y", "z")
    val m1 = Calibration.temperatureFit(df.coalesce(1), col("y"), col("z"))
    val m7 = Calibration.temperatureFit(df.repartition(7), col("y"), col("z"))
    assert(m1.beta == m7.beta)
  }

  // ---- Reliability: Cronbach / ICC / odds ratio ----

  test("cronbachAlpha: parallel items give alpha ~ 1, independent ~ 0, " +
    "and the textbook identity holds") {
    // three near-identical items: total var ~ 9x item var -> alpha -> 1
    val par = (1 to 60).map { i =>
      val base = (i % 10).toDouble
      (base, base + 0.01 * (i % 3), base - 0.01 * (i % 2))
    }
    val a1 = Calibration.cronbachAlpha(par.toDF("a", "b", "c"),
      Seq(col("a"), col("b"), col("c"))).head()
    assert(a1.getAs[Double]("alpha") > 0.99)
    // independent items: total var == sum of item vars -> alpha ~ 0
    val ind = (0 until 512).map(i =>
      ((i & 1).toDouble, ((i >> 1) & 1).toDouble, ((i >> 2) & 1).toDouble))
    val a2 = Calibration.cronbachAlpha(ind.toDF("a", "b", "c"),
      Seq(col("a"), col("b"), col("c"))).head()
    assert(math.abs(a2.getAs[Double]("alpha")) < 0.05)
    // identity: alpha == k/(k-1) * (1 - sum_var/total_var), exactly
    assert(approx(a1.getAs[Double]("alpha"),
      1.5 * (1.0 - a1.getAs[Double]("sum_item_var")
        / a1.getAs[Double]("total_var")), 1e-12))
  }

  test("icc1: strong item effect -> high ICC; pure noise -> ~0; " +
    "k0 equals group size when balanced") {
    // 20 items x 5 ratings; value = item*10 + rater noise
    val strong = for { i <- 0 until 20; r <- 0 until 5 }
      yield (i, i * 10.0 + r * 0.1)
    val r1 = Calibration.icc1(strong.toDF("i", "v"), col("i"), col("v"))
      .head()
    assert(r1.getAs[Double]("icc1") > 0.99)
    assert(approx(r1.getAs[Double]("k0"), 5.0, 1e-9))
    // value independent of item
    val noise = for { i <- 0 until 20; r <- 0 until 5 }
      yield (i, ((i * 7 + r * 13) % 10).toDouble)
    val r2 = Calibration.icc1(noise.toDF("i", "v"), col("i"), col("v"))
      .head()
    assert(math.abs(r2.getAs[Double]("icc1")) < 0.3)
  }

  test("oddsRatio matches the hand-computed 2x2 and nulls on zero cells") {
    import graft.ops.Experiment
    // a=30 b=70 c=10 d=90: OR = 30*90/(70*10) = 27/7, RR = 0.3/0.1 = 3
    val rows = Seq.fill(30)((true, true)) ++ Seq.fill(70)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(90)((false, false))
    val r = Experiment.oddsRatio(rows.toDF("e", "o"), col("e"), col("o"))
      .head()
    assert(approx(r.getAs[Double]("or_"), 27.0 / 7.0, 1e-9))
    assert(approx(r.getAs[Double]("rr"), 3.0, 1e-9))
    assert(r.getAs[Double]("or_lo") < 27.0 / 7.0
      && r.getAs[Double]("or_hi") > 27.0 / 7.0)
    val zero = Seq((true, true), (false, false)).toDF("e", "o")
    val rz = Experiment.oddsRatio(zero, col("e"), col("o")).head()
    assert(rz.isNullAt(rz.fieldIndex("or_")))
    assert(rz.isNullAt(rz.fieldIndex("rr")))
  }
}
