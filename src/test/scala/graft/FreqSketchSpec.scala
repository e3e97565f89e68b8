package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** Frequent-items sketch tables (Stats.buildFreqSketches/
  * rollupFreqSketches + graft_freq_*): exact in the small-map regime,
  * NO_FALSE_NEGATIVES above it, mergeable, parquet-persistable. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (
    Seq.fill(50)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++ Seq.fill(5)(("a", "z")) ++
    Seq.fill(40)(("b", "x")) ++ Seq.fill(10)(("b", "w"))
  ).toDF("g", "item")

  test("exact regime: per-group heavy hitters are exact counts, est-desc") {
    val sk = Stats.buildFreqSketches(df, Seq("g"), col("item"), maxMapSize = 64)
    val rows = Stats.rollupFreqSketches(sk, Seq("g"), maxMapSize = 64)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val a = rows.filter(_._1 == "a").map(t => (t._2, t._3)).toSeq
    assert(a == Seq(("x", 50L), ("y", 30L), ("z", 5L)))
    rows.foreach { t => assert(t._4 == t._3 && t._5 == t._3, s"bounds not tight: $t") }
    assert(rows.filter(_._1 == "a").forall(_._6 == 85L))
    assert(rows.filter(_._1 == "b").map(t => (t._2, t._3)).toSeq == Seq(("x", 40L), ("w", 10L)))
  }

  test("rollup across groups equals global exact counts") {
    val sk = Stats.buildFreqSketches(df, Seq("g"), col("item"), maxMapSize = 64)
    val rows = Stats.rollupFreqSketches(sk, Seq.empty, maxMapSize = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("x", 90L), ("y", 30L), ("w", 10L), ("z", 5L)))
  }

  test("overflow regime: heavy item survives with bracketing bounds") {
    // 3000 rows: 1000 of "heavy", 2000 singletons; map of 8 slots
    val big = (Seq.fill(1000)("heavy") ++ (0 until 2000).map(i => s"u$i"))
      .map(("g", _)).toDF("g", "item")
    val sk = Stats.buildFreqSketches(big, Seq("g"), col("item"), maxMapSize = 8)
    val rows = Stats.rollupFreqSketches(sk, Seq("g"), maxMapSize = 8, minCount = 500)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val h = rows.find(_._1 == "heavy")
    assert(h.nonEmpty, s"heavy hitter purged: ${rows.toSeq}")
    assert(h.get._3 <= 1000L && 1000L <= h.get._4, s"bounds don't bracket: $h")
  }

  test("sketch table round-trips through parquet, merge respects minCount") {
    val sk = Stats.buildFreqSketches(df, Seq("g"), col("item"), maxMapSize = 64)
    val path = java.nio.file.Files.createTempDirectory("freq").toString + "/sk"
    sk.write.mode("overwrite").parquet(path)
    val rows = Stats.rollupFreqSketches(spark.read.parquet(path), Seq.empty,
      maxMapSize = 64, minCount = 30).collect().map(r => r.getString(0))
    assert(rows.toSeq == Seq("x", "y"))
  }

  test("null items are skipped, not counted") {
    val d = Seq(("a", Some("x")), ("a", None), ("a", Some("x"))).toDF("g", "item")
    val sk = Stats.buildFreqSketches(d, Seq("g"), col("item"), maxMapSize = 8)
    val rows = Stats.rollupFreqSketches(sk, Seq("g"), maxMapSize = 8)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("x", 2L)))
  }
}
