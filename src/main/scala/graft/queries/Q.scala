package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Every parquet table the driver generates (TESTDATA.md) — the single
    * source for warmup scans and the schema-contract log. */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.ansi.enabled", "false")
    // Naive timestamps in the testdata are wall-clock UTC; pin the session
    // zone so TIMESTAMP_NTZ → epoch conversion is deterministic.
    s.conf.set("spark.sql.session.timeZone", "UTC")
    // Some testdata generations emit TIMESTAMP(NANOS) parquet, which
    // Spark's vectorized reader rejects; read those as epoch-nanos long
    // (a no-op flag for micros files) and normalize below.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$dir/$name.parquet"))
  }

  /** Canonicalize a `ts` column to an epoch-MICROSECONDS long, whatever
    * physical encoding the parquet writer chose. The testdata generator
    * has emitted both TIMESTAMP(NANOS) (arrives as epoch-nanos long under
    * `nanosAsLong`) and TIMESTAMP(MICROS) tz-naive (arrives as
    * TIMESTAMP_NTZ); downstream queries must not care. DuckDB twins use
    * `epoch_us(ts)`, which matches this canonical value for every
    * encoding. Unknown encodings fail loudly here — one diagnostic line
    * instead of a scatter of analysis errors at 18 use sites. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case None => df
      case Some(LongType) =>
        df.withColumn("ts", expr("ts div 1000"))
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)))
      case Some(other) =>
        throw new IllegalStateException(
          s"events.ts arrived as $other — expected epoch-nanos LONG, " +
            "TIMESTAMP, or TIMESTAMP_NTZ parquet. The testdata schema " +
            "drifted again; teach Q.normalizeTs the new encoding.")
    }

  /** Canonical epoch-µs long (see [[normalizeTs]]) → epoch seconds double.
    * DuckDB twin: `epoch(ts)`. */
  def tsSeconds(c: Column): Column = c.cast("double") / 1e6

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
