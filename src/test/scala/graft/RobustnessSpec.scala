package graft

import org.apache.spark.sql.functions._
import graft.ops.{PermImportance, Robustness, SlidingWindows}

/** R1–R5 laws: severity-0 identity, mask structure, multiset preservation,
  * and — the scale property — determinism under repartitioning. */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wins = {
    val df = (1 to 60).map(i => (i.toLong, Seq(i.toDouble, i * 10.0))).toDF("t", "row")
    SlidingWindows.slideGlobal(df, Seq(col("t")), col("row"), seqLen = 5, step = 5)
      .select(col("win_id").cast("long").as("win_id"), col("window"))
  }

  private def flat(c: String) = flatten(col(c))

  /** Row accessor for array<array<double>> (inner elems come back as
    * mutable ArraySeq — normalize to immutable lists). */
  private def nested(r: org.apache.spark.sql.Row, i: Int): List[List[Double]] =
    r.getSeq[scala.collection.Seq[Double]](i).toList.map(_.toList)


  test("severity 0 is identity for all four degradations") {
    val out = wins
      .withColumn("r1", Robustness.packetLoss(col("window"), col("win_id"), 0.0, 1L))
      .withColumn("r2", Robustness.missingVariables(col("window"), col("win_id"), 0.0, 1L))
      .withColumn("r3", Robustness.clockOffset(col("window"), col("win_id"), 0.0, 1L))
      .withColumn("r4", Robustness.drift(col("window"), col("win_id"), 0.0, 1L))
    assert(out.where(flat("r1") =!= flat("window") || flat("r2") =!= flat("window") ||
      flat("r3") =!= flat("window") || flat("r4") =!= flat("window")).count() == 0)
  }

  test("packet_loss zeroes entire timesteps; severity 1 zeroes everything") {
    val out = wins.withColumn("d", Robustness.packetLoss(col("window"), col("win_id"), 1.0, 7L))
    val rows = out.select("d").collect().flatMap(r0 => nested(r0, 0))
    assert(rows.forall(_.forall(_ == 0.0)))
    // at severity .5, each timestep is either untouched or fully zero
    val half = wins.withColumn("d", Robustness.packetLoss(col("window"), col("win_id"), 0.5, 7L))
      .select("window", "d").collect()
    half.foreach { r =>
      nested(r, 0).zip(nested(r, 1)).foreach { case (orig, deg) =>
        assert(deg == orig || deg.forall(_ == 0.0))
      }
    }
  }

  test("missing_variables zeroes the same feature across all timesteps of a window") {
    val out = wins.withColumn("d", Robustness.missingVariables(col("window"), col("win_id"), 0.5, 3L))
      .select("window", "d").collect()
    out.foreach { r =>
      val orig = nested(r, 0); val deg = nested(r, 1)
      for (f <- 0 until 2) {
        val zeroed = deg.map(_(f)).forall(_ == 0.0)
        val untouched = deg.map(_(f)) == orig.map(_(f))
        assert(zeroed || untouched, s"feature $f partially zeroed")
      }
    }
  }

  test("clock_offset preserves the row multiset") {
    val out = wins.withColumn("d", Robustness.clockOffset(col("window"), col("win_id"), 0.6, 11L))
      .select("window", "d").collect()
    out.foreach { r =>
      val a = nested(r, 0).map(_.toList).sortBy(_.head)
      val b = nested(r, 1).map(_.toList).sortBy(_.head)
      assert(a == b)
    }
    // and at this severity at least one window actually rolled
    val moved = out.count(r => nested(r, 0) != nested(r, 1))
    assert(moved > 0)
  }

  test("drift adds zero at t=0 and grows linearly") {
    val out = wins.withColumn("d", Robustness.drift(col("window"), col("win_id"), 0.5, 13L))
      .select("window", "d").collect()
    out.foreach { r =>
      val orig = nested(r, 0); val deg = nested(r, 1)
      assert(deg.head == orig.head) // ramp factor 0 at first timestep
      for (f <- 0 until 2) {
        val deltas = orig.zip(deg).map { case (o, d) => d(f) - o(f) }
        // deltas are t/(T-1)*c: ratios to the last delta are 0, .25, .5, .75, 1
        val last = deltas.last
        if (math.abs(last) > 1e-12)
          deltas.zipWithIndex.foreach { case (dl, i) =>
            assert(approx(dl, last * i / (deltas.size - 1), 1e-9))
          }
      }
    }
  }

  test("degradations are deterministic under repartitioning (cluster-stable RNG)") {
    def checksum(parts: Int): Seq[(Long, Seq[Double])] =
      wins.repartition(parts)
        .withColumn("d", Robustness.packetLoss(col("window"), col("win_id"), 0.4, 99L))
        .select(col("win_id"), flatten(col("d")))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(checksum(1) == checksum(7))
  }

  test("severityGrid reproduces the reference sweep (7 severities x 5 repeats, derived seeds)") {
    val g = Robustness.severityGrid()
    assert(g.size == 35)
    assert(approx(g.head._1, 0.0) && approx(g.last._1, 0.6))
    assert(g.head._3 == 123L && g.last._3 == 123L + 1000 * 6 + 4)
  }

  test("permutation preserves the global value multiset and is deterministic") {
    val before = wins.select(explode(flatten(col("window"))).as("v"))
      .groupBy("v").count().collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    val permuted = PermImportance.permuteFeature(wins, "win_id", "window", 0, seed = 5L)
    val after = permuted.select(explode(col("window")).as("row"))
      .select(element_at(col("row"), 1).as("v"))
      .groupBy("v").count().collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    // feature 0 multiset preserved
    val f0Before = before.filter { case (v, _) => v % 10 != 0 || v == 0 } // feature0 values are 1..60
    assert(after.keySet == wins.select(explode(flatten(col("window"))).as("v"))
      .where(col("v") <= 60).select("v").distinct().collect().map(_.getDouble(0)).toSet)
    // feature 1 untouched
    val f1 = permuted.select(explode(col("window")).as("row"))
      .select(element_at(col("row"), 2).as("v")).collect().map(_.getDouble(0)).sorted
    assert(f1.toSeq == (1 to 60).map(_ * 10.0))
    // determinism
    val again = PermImportance.permuteFeature(wins, "win_id", "window", 0, seed = 5L)
      .select(col("win_id"), flatten(col("window"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val first = permuted.select(col("win_id"), flatten(col("window"))).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    assert(again.toSeq == first.toSeq)
  }
}
