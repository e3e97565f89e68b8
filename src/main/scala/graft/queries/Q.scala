package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the oracle-checked query surface (SparkEntry).
  *
  * Conventions that keep the DuckDB hash-compare exact:
  *  - every double that went through an aggregation is `round(_, 4)` (or
  *    coarser) on BOTH sides, so last-ulp float-summation-order noise
  *    can't flip the comparison;
  *  - every result is deterministically ordered and ties in top-k /
  *    rank queries are broken by a unique key;
  *  - ANSI mode is off (pandas-style permissive casts, like the
  *    reference's `pd.to_numeric(errors="coerce")`).
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    // The testdata writer emits TIMESTAMP(NANOS) parquet, which Spark's
    // vectorized reader rejects; read nanos as long (epoch ns) and convert
    // at use sites with [[tsSeconds]].
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** Epoch-nanos long (see nanosAsLong above) → epoch seconds double.
    * DuckDB twin: `epoch(ts)` (+ fractional part via epoch_ns). */
  def tsSeconds(c: Column): Column = c.cast("double") / 1e9

  /** events + derived deterministic scoring columns shared by the metric
    * queries: y_true = 1 for 'error' events, score = a fixed arithmetic
    * blend of the fractional value part and the label (AUC ≈ .8, ~100
    * distinct score values → realistic tie handling on curves). */
  def scoredEvents(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumn("y_true", (col("event_type") === "error").cast("int"))
      .withColumn("score",
        round((col("value") - floor(col("value"))) * 0.6 + col("y_true") * 0.35, 4))
      .withColumn("y_pred", (col("score") >= 0.5).cast("int"))

  /** SQL twin of [[scoredEvents]]. */
  val scoredEventsSql: String =
    """SELECT *, CAST(score >= 0.5 AS INT) AS y_pred FROM (
      |  SELECT *, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y_true,
      |         round((value - floor(value)) * 0.6 +
      |               (CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 0.35, 4) AS score
      |  FROM events) t""".stripMargin
}
