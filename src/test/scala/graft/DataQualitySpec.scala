package graft

import org.apache.spark.sql.functions._
import graft.ops.DataQuality
import graft.ops.DataQuality.Rule._

/** Deequ-style constraint suite: fused row-local rules, FK coverage,
  * and the pass/fail verdicts. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Option("a"), 5.0, "X"),
    (2L, Option("b"), 15.0, "Y"),   // out of range [0, 10]
    (3L, None, 7.0, "X"),           // null name
    (3L, Option("d"), 9.0, "zz")    // dup id, regex miss
  ).toDF("id", "name", "v", "tag")

  test("check: fused metrics and verdicts hand-computed") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val out = DataQuality.check(df, Seq(
      NotNull("id"),
      NotNull("name", minFrac = 0.7),
      Unique(Seq("id")),
      InRange("v", 0.0, 10.0),
      MatchesRegex("tag", "^[A-Z]$"),
      RowCountBetween(2L, 10L),
      RefIntegrity("id", dim, "k")
    )).collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getBoolean(3))).toMap
    assert(out("not_null(id)") == (1.0, true))
    assert(out("not_null(name)") == (0.75, true)) // 3/4 >= 0.7
    assert(out("unique(id)") == (0.75, false))    // 3 distinct / 4 rows
    assert(out("in_range(v)") == (0.75, false))   // 15 outside
    assert(out("matches_regex(tag)") == (0.75, false))
    assert(out("row_count") == (4.0, true))
    assert(out("ref_integrity(id)") == (1.0, true))
  }

  test("check: FK misses lower coverage; thresholds gate fractions") {
    val dim = Seq(1L, 2L).toDF("k") // id 3 (×2 rows) dangles
    val out = DataQuality.check(df, Seq(
      RefIntegrity("id", dim, "k"),
      NotNull("name", minFrac = 0.8) // 0.75 < 0.8 → fail
    )).collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getBoolean(3))).toMap
    assert(out("ref_integrity(id)") == (0.5, false))
    assert(out("not_null(name)") == (0.75, false))
  }

  test("check: strict verdicts compare exact counts, not the rounded metric") {
    // 2,000,001 rows with ONE null and ONE duplicate key: both fractions
    // round to 1.000000 at 6 dp, so a verdict on the rounded face would
    // silently pass — the exact-count verdict must fail both rules
    val big = spark.range(2000001L).select(col("id"),
      when(col("id") === 7L, lit(null).cast("string"))
        .otherwise(col("id").cast("string")).as("s"),
      when(col("id") === 9L, lit(8L)).otherwise(col("id")).as("k"))
    val out = DataQuality.check(big, Seq(NotNull("s"), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(3))).toMap
    assert(out("not_null(s)") == (1.0, false))
    assert(out("unique(k)") == (1.0, false))
  }

  test("check: guards — empty rules, duplicate rule names") {
    intercept[IllegalArgumentException](DataQuality.check(df, Nil))
    intercept[IllegalArgumentException](DataQuality.check(df,
      Seq(NotNull("id"), NotNull("id", minFrac = 0.5))))
  }

  test("check: empty table — completeness vacuously 1, row count 0") {
    val empty = df.where(col("id") < 0)
    val out = DataQuality.check(empty, Seq(
      NotNull("id"), RowCountBetween(1L, 10L)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getBoolean(3))).toMap
    assert(out("not_null(id)") == (1.0, true))
    assert(out("row_count") == (0.0, false))
  }
}
