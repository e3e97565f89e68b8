package graft

import org.apache.spark.sql.functions._
import graft.ops.{Changelog, Skew}

/** Change-log operators (SCD-2 build, CDC latest-wins merge) and the
  * key-skew diagnosis report. */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- scd2

  private val log = Seq(
    // key 1: A → A (no-op) → B → B (no-op) → A : three versions
    (1L, 10L, 1, "A"), (1L, 20L, 2, "A"), (1L, 30L, 3, "B"),
    (1L, 40L, 4, "B"), (1L, 50L, 5, "A"),
    // key 2: single row → one open version
    (2L, 15L, 1, "X")
  ).toDF("k", "ts", "seq", "attr")

  test("scd2: no-op rows collapse; versions chain half-open; last is current") {
    val out = Changelog.scd2(log, "k", "ts", Seq("attr"), Seq(col("seq")))
      .orderBy("k", "valid_from").collect()
    assert(out.length == 4)
    val k1 = out.filter(_.getAs[Long]("k") == 1L)
    assert(k1.map(r => (r.getAs[Long]("valid_from"),
      Option(r.getAs[Any]("valid_to")), r.getAs[String]("attr"))).toSeq ==
      Seq((10L, Some(30L), "A"), (30L, Some(50L), "B"), (50L, None, "A")))
    assert(k1.map(_.getAs[Boolean]("is_current")).toSeq ==
      Seq(false, false, true))
    val k2 = out.filter(_.getAs[Long]("k") == 2L)
    assert(k2.length == 1 && k2.head.getAs[Boolean]("is_current"))
  }

  test("scd2: null attrs compare null-safe (null→null is a no-op)") {
    val l = Seq((1L, 10L, Option("A")), (1L, 20L, None: Option[String]),
      (1L, 30L, None: Option[String]), (1L, 40L, Option("A")))
      .toDF("k", "ts", "attr")
    val out = Changelog.scd2(l, "k", "ts", Seq("attr"))
      .orderBy("valid_from").collect()
    // A → null → (null no-op) → A = three versions
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("valid_from")).toSeq == Seq(10L, 20L, 40L))
  }

  // ------------------------------------------------------------ cdcMerge

  private val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
    .toDF("k", "attr", "v")

  test("cdcMerge: upsert updates, tombstone deletes, insert adds, untouched survives") {
    val log = Seq(
      (1L, 10L, "U", "a2", 1.5),  // stale update…
      (1L, 20L, "U", "a3", 1.9),  // …overridden by the later one
      (2L, 10L, "D", "x", 0.0),   // delete key 2
      (4L, 10L, "U", "d", 4.0),   // insert new key 4
      (5L, 10L, "D", "x", 0.0)    // dangling delete: no-op
    ).toDF("k", "ts", "op", "attr", "v")
    val out = Changelog.cdcMerge(base, log, "k", "ts", "op",
      Seq("attr", "v")).orderBy("k").collect()
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[String]("attr"),
      r.getAs[Double]("v"))).toSeq ==
      Seq((1L, "a3", 1.9), (3L, "c", 3.0), (4L, "d", 4.0)))
  }

  test("cdcMerge: a delete-then-reinsert keeps the latest upsert") {
    val log = Seq((2L, 10L, "D", "x", 0.0), (2L, 20L, "U", "b2", 2.5))
      .toDF("k", "ts", "op", "attr", "v")
    val out = Changelog.cdcMerge(base, log, "k", "ts", "op",
      Seq("attr", "v")).orderBy("k").collect()
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(1L, 2L, 3L))
    assert(out(1).getAs[String]("attr") == "b2")
  }

  test("cdcMerge: unknown ops are refused loudly") {
    val log = Seq((1L, 10L, "UPSERT", "a", 1.0)).toDF("k", "ts", "op", "attr", "v")
    intercept[IllegalArgumentException](
      Changelog.cdcMerge(base, log, "k", "ts", "op", Seq("attr", "v")))
  }

  // ---------------------------------------------------------- skewReport

  test("skewReport: hand-computed shares and salt factor") {
    // keys: a×6, b×2, c×2 → 10 rows, 3 keys
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = Skew.skewReport(df, col("k"), parallelism = 5).head()
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("max_key_rows") == 6L)
    assert(r.getAs[String]("top1_key") == "a")
    assert(approx(r.getAs[Double]("max_share"), 0.6, 1e-9))
    // skew ratio: 6 / (10/3) = 1.8
    assert(approx(r.getAs[Double]("skew_ratio"), 1.8, 1e-9))
    // ideal partition = 10/5 = 2 rows → the 6-row key needs salt 3
    assert(r.getAs[Long]("suggested_salt") == 3L)
  }

  test("skewReport: uniform keys → ratio 1, salt 1; count ties pick the smaller key") {
    val df = Seq("a", "a", "b", "b").toDF("k")
    val r = Skew.skewReport(df, col("k"), parallelism = 2).head()
    assert(approx(r.getAs[Double]("skew_ratio"), 1.0, 1e-9))
    assert(r.getAs[Long]("suggested_salt") == 1L)
    assert(r.getAs[String]("top1_key") == "a")
  }
}
