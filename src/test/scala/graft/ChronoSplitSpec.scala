package graft

import org.apache.spark.sql.functions._
import graft.ops.ChronoSplit

/** G1 laws: integer-truncation fractions, the n_train+n_val>=n guard
  * (func_preproc.py:172-177), partition property, chronology. */
class ChronoSplitSpec extends SparkSpec {
  import spark.implicits._

  private def group(g: String, n: Int, base: Int = 0) =
    (1 to n).map(i => (g, (base + i).toLong))

  private def splitCounts(n: Int): Map[String, Long] = {
    val df = group("g", n).toDF("g", "t")
    ChronoSplit.withSplit(df, Seq("g"), Seq(col("t")))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
  }

  test("70/15/15 with integer truncation") {
    val c = splitCounts(100)
    assert(c("train") == 70 && c("val") == 15 && c("test") == 15)
    val c2 = splitCounts(23) // floor(16.1)=16, floor(3.45)=3 → 16/3/4
    assert(c2("train") == 16 && c2("val") == 3 && c2("test") == 4)
  }

  test("guard: tiny groups always leave at least one test row") {
    for (n <- 1 to 8) {
      val c = splitCounts(n)
      assert(c("test") >= 1, s"n=$n -> $c")
      assert(c("train") + c("val") + c("test") == n)
      if (n > 1) assert(c("train") >= 1, s"n=$n -> $c")
    }
  }

  test("chronology: every train row precedes every val row precedes every test row (per group)") {
    val df = (group("a", 40) ++ group("b", 11, 1000)).toDF("g", "t")
    val out = ChronoSplit.withSplit(df, Seq("g"), Seq(col("t")))
      .groupBy("g", "split").agg(min("t").as("mn"), max("t").as("mx"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("a", "b")) {
      assert(out((g, "train"))._2 < out((g, "val"))._1)
      assert(out((g, "val"))._2 < out((g, "test"))._1)
    }
  }

  test("custom fractions") {
    val df = group("g", 10).toDF("g", "t")
    val c = ChronoSplit.withSplit(df, Seq("g"), Seq(col("t")), trainFrac = 0.5, valFrac = 0.3)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("train") == 5 && c("val") == 3 && c("test") == 2)
  }

  test("withSplitSalted: row-for-row parity with the window form (skewed groups, duplicate ts, guard-sized groups)") {
    // one monster group, one medium, three guard-sized; HEAVY ts ties
    // (t = i/7) so quantile boundaries land ON tied values — the case
    // that would break a non-monotone salt
    val rows: Seq[(String, java.lang.Long, Long)] =
      (1 to 997).map(i => ("monster", java.lang.Long.valueOf(i / 7), i.toLong)) ++
      (1 to 53).map(i => ("medium", java.lang.Long.valueOf(i / 3), 10000L + i)) ++
      (1 to 3).map(i => ("tinyA", java.lang.Long.valueOf(0), 20000L + i)) ++
      Seq(("tinyB", java.lang.Long.valueOf(5), 30000L),
        ("tinyB", java.lang.Long.valueOf(5), 30001L)) ++
      Seq(("one", java.lang.Long.valueOf(9), 40000L)) ++
      // NULL ts: percentile ignores them, `t > bound` is null so they
      // fall to bucket 0, and nulls-first ordering puts them at the
      // lowest ranks — exactly the window form's asc-nulls-first
      Seq(("monster", null, 50000L), ("monster", null, 50001L),
        ("medium", null, 50002L))
    val df = rows.toDF("g", "t", "id").repartition(7)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), Option(r.get(1)), r.getLong(2)) -> r.getString(3)
    val expected = ChronoSplit.withSplit(df, Seq("g"),
        Seq(col("t"), col("id")))
      .select("g", "t", "id", "split").collect().map(key).toMap
    for (buckets <- Seq(2, 5, 32)) {
      val got = ChronoSplit.withSplitSalted(df, Seq("g"), col("t"),
          Seq(col("id")), buckets = buckets)
        .select("g", "t", "id", "split").collect().map(key).toMap
      assert(got == expected, s"buckets=$buckets: " +
        got.collect { case (k, v) if expected(k) != v => (k, v, expected(k)) }
          .take(5).toSeq.toString)
    }
  }

  test("withSplitSalted: window partitions by (group, bucket), never by group alone") {
    val df = group("g", 200).map { case (g, t) => (g, t, t) }
      .toDF("g", "t", "id")
    val p = ChronoSplit.withSplitSalted(df, Seq("g"), col("t"), Seq(col("id")))
      .queryExecution.executedPlan.toString
    // the corpus-sized row_number window must include __bkt in its
    // partition spec; a plain [g] window over raw rows would re-create
    // the monster-group funnel this form exists to avoid
    val rnLines = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rnLines.nonEmpty, p)
    assert(rnLines.forall(_.contains("__bkt")), rnLines.mkString("\n"))
  }

  test("withSplitSalted: an ALL-null-ts group survives with window-form parity") {
    // group "g2" has only null timestamps: its quantile bounds are null,
    // and without the bucket sentinel the (group, bucket) joins dropped
    // the whole group (review finding, round 10)
    val rows = Seq(
      ("g1", Some(1L), 1L), ("g1", Some(2L), 2L), ("g1", Some(3L), 3L),
      ("g1", Some(4L), 4L), ("g1", Some(5L), 5L), ("g1", Some(6L), 6L),
      ("g1", Some(7L), 7L),
      ("g2", None: Option[Long], 1L), ("g2", None, 2L), ("g2", None, 3L),
      ("g2", None, 4L), ("g2", None, 5L), ("g2", None, 6L), ("g2", None, 7L))
    val df = rows.toDF("g", "ts", "id")
    val win = ChronoSplit.withSplit(df, Seq("g"), Seq(col("ts"), col("id")))
      .select("g", "id", "split").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    val sal = ChronoSplit.withSplitSalted(df, Seq("g"), col("ts"),
        Seq(col("id")), buckets = 3)
      .select("g", "id", "split").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(sal.size == rows.size, s"salted dropped rows: ${sal.size}")
    assert(sal == win, "all-null-ts group must split identically")
  }

  test("withSplitSalted: ts beyond 2^53 raises instead of silently mis-ranking") {
    val df = Seq(("g", 1L << 60, 1L), ("g", (1L << 60) + 1L, 2L),
      ("g", 3L, 3L)).toDF("g", "ts", "id")
    val e = intercept[Exception] {
      ChronoSplit.withSplitSalted(df, Seq("g"), col("ts"),
        Seq(col("id"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("withSplitSalted")), msgs(e).mkString)
  }
}
