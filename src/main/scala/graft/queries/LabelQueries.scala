package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Labels
import graft.queries.Q._

/** Label/projection/filter operators (SURVEY §2.2 P1–P12, §2.3 F1–F5)
  * bound to the oracle tables: `events.event_type` plays the reference's
  * `Attack` column, with "benign-like" = the non-error interaction types.
  */
object LabelQueries {

  private val Benign = Seq("view", "click", "signup")
  private val Groups = Map(
    "click" -> "interaction", "view" -> "interaction",
    "signup" -> "conversion", "purchase" -> "conversion")

  val queries: Map[String, QueryFn] = Map(
    "p2_binary_label" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("label", Labels.binaryLabel(col("event_type"), Benign))
        .groupBy("event_type", "label").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    "p3_group_map" -> ((s, dir) =>
      table(s, dir, "events")
        .withColumn("grp", Labels.mapWithFallback(col("event_type"), Groups))
        .groupBy("event_type", "grp").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    "p9_label_encode" -> ((s, dir) =>
      Labels.fitLabelEncoder(table(s, dir, "events"), "event_type")
        .orderBy("y")),

    "p8_category_codes" -> ((s, dir) =>
      Labels.categoryCodes(table(s, dir, "orders"), "o_orderpriority", "code")
        .groupBy("o_orderpriority", "code").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    "p10_standardize" -> ((s, dir) => {
      // Fit on the whole table (train == all for the oracle view), report
      // per-group mean/std of the z-scored value (z stats are scale-free,
      // so rounding at 4 absorbs engine float-order noise).
      import graft.ops.Stats
      val ev = table(s, dir, "events")
      val scaler = Stats.fitStandardScaler(ev, Seq("value"))
      // `+ 0.0` normalizes IEEE -0.0 to +0.0 (the driver's hash is
      // byte-sensitive and DuckDB's round can yield -0.0 where ours doesn't).
      Stats.applyStandardScaler(ev, scaler)
        .groupBy("event_type")
        .agg((round(avg("value"), 4) + lit(0.0)).as("z_mean"),
          (round(stddev_pop(col("value")), 4) + lit(0.0)).as("z_std"))
        .orderBy("event_type")
    }),

    "p7_numeric_coercion" -> ((s, dir) =>
      // pd.to_numeric(errors="coerce") parity: permissive cast → null on
      // failure (F1 dropna included). props is a JSON-ish string; pull the
      // digits with a regex and coerce.
      table(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("double"))
        .na.drop(Seq("k"))
        .groupBy("event_type")
        .agg(round(sum("k"), 2).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")),

    "f3_task_filter" -> ((s, dir) =>
      table(s, dir, "events")
        .where(!lower(trim(col("event_type"))).isin(Benign: _*))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")),

    "f5_key_filter" -> ((s, dir) =>
      table(s, dir, "documents")
        .where(upper(trim(col("source"))) === "SRC1")
        .groupBy("lang").agg(count(lit(1)).as("n"), round(avg("n_chars"), 4).as("avg_chars"))
        .orderBy("lang")),

    "p1_state_bin" -> ((s, dir) =>
      // 'click' plays the "charging" state value.
      table(s, dir, "events")
        .withColumn("state_bin",
          when(lower(trim(col("event_type"))) === "click", 1).otherwise(0))
        .groupBy("state_bin").agg(count(lit(1)).as("n"))
        .orderBy("state_bin")),

    "g7_run_agg" -> ((s, dir) =>
      // mean/std across repeated runs (ddof=1, 0.0 for single-run keys):
      // event_type plays the run key, value the metric.
      graft.ops.MetricsOps.aggregateRuns(
          table(s, dir, "events").select(col("event_type"), col("value")),
          Seq("event_type"), "value")
        .select(col("event_type"), round(col("mean"), 4).as("mean"),
          round(col("std"), 4).as("std"))
        .orderBy("event_type")),

    "g5_class_weights" -> ((s, dir) => {
      import graft.ops.MetricsOps
      MetricsOps.classWeights(table(s, dir, "events"), "event_type")
        .select(col("cls"), round(col("weight"), 6).as("weight"))
        .orderBy("cls")
    }),
  )

  val oracle: Map[String, String] = Map(
    "p2_binary_label" ->
      """SELECT event_type,
        |  CASE WHEN lower(trim(event_type)) IN ('view','click','signup')
        |       THEN 'benign' ELSE 'attack' END AS label,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "p3_group_map" ->
      """SELECT event_type,
        |  CASE lower(trim(event_type))
        |    WHEN 'click' THEN 'interaction' WHEN 'view' THEN 'interaction'
        |    WHEN 'signup' THEN 'conversion' WHEN 'purchase' THEN 'conversion'
        |    ELSE event_type END AS grp,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "p9_label_encode" ->
      """SELECT class, CAST(row_number() OVER (ORDER BY class) - 1 AS INT) AS y
        |FROM (SELECT DISTINCT event_type AS class FROM events) t ORDER BY y""".stripMargin,

    "p8_category_codes" ->
      """WITH dict AS (
        |  SELECT class, CAST(row_number() OVER (ORDER BY class) - 1 AS INT) AS code
        |  FROM (SELECT DISTINCT coalesce(o_orderpriority, 'missing') AS class FROM orders) d)
        |SELECT coalesce(o_orderpriority, 'missing') AS o_orderpriority, code, count(*) AS n
        |FROM orders JOIN dict ON coalesce(o_orderpriority, 'missing') = dict.class
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "p10_standardize" ->
      """WITH stats AS (SELECT avg(value) AS m, stddev_pop(value) AS s FROM events)
        |SELECT event_type,
        |  round(avg((value - m) / s), 4) + 0.0 AS z_mean,
        |  round(stddev_pop((value - m) / s), 4) + 0.0 AS z_std
        |FROM events, stats GROUP BY 1, stats.m, stats.s ORDER BY 1""".stripMargin,

    "p7_numeric_coercion" ->
      """SELECT event_type, round(sum(k), 2) AS sum_k, count(*) AS n FROM (
        |  SELECT event_type, TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS DOUBLE) AS k
        |  FROM events) t
        |WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "f3_task_filter" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE lower(trim(event_type)) NOT IN ('view','click','signup')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f5_key_filter" ->
      """SELECT lang, count(*) AS n, round(avg(n_chars), 4) AS avg_chars FROM documents
        |WHERE upper(trim(source)) = 'SRC1' GROUP BY 1 ORDER BY 1""".stripMargin,

    "p1_state_bin" ->
      """SELECT CASE WHEN lower(trim(event_type)) = 'click' THEN 1 ELSE 0 END AS state_bin,
        |  count(*) AS n FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "g7_run_agg" ->
      """SELECT event_type, round(avg(value), 4) AS mean,
        |  round(coalesce(stddev_samp(value), 0.0), 4) AS std
        |FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g5_class_weights" ->
      """WITH c AS (SELECT event_type AS cls, count(*) AS n_c FROM events GROUP BY 1),
        |     t AS (SELECT sum(n_c) AS n, count(*) AS k FROM c)
        |SELECT cls, round(least(CAST(n AS DOUBLE) / (k * n_c), 10.0), 6) AS weight
        |FROM c, t ORDER BY cls""".stripMargin,
  )
}
