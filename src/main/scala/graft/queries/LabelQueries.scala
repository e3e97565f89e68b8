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

    // P3 parity over EVERY reference spelling (func_preproc.py:48-94):
    // all 32 map keys + strip/lower variants + unknown pass-throughs. The
    // oracle is the hand-transcribed expected table, so a hash match proves
    // the Scala map reproduces the reference's normalization verbatim.
    "p3_group_map_full" -> ((s, dir) => {
      import s.implicits._
      AttackSpellings.toDF("attack")
        .withColumn("grp", Labels.attackGroup(col("attack")))
        .orderBy("attack")
    }),

    // P4 parity: the network preproc's full labeling chain
    // (pipeline_trainingmodels_network.py:222-238) over every LABEL_MAPPING
    // key + unmapped raws (exact-match fallback, scenario "Benign" default,
    // null attack id).
    "p4_network_labels" -> ((s, dir) => {
      import s.implicits._
      NetworkRawLabels.toDF("label_mul_raw")
        .transform(Labels.networkLabels(_))
        .orderBy("label_mul_raw")
    }),
  )

  /** Every spelling map_attack_to_group recognizes, plus strip()/lower()
    * variants and unknown names (which must pass through unchanged). */
  private val AttackSpellings: Seq[String] = Seq(
    "  SYN-Flood ", "0", "Backdoor", "NONE (ie. Benign)", "OS-Scan",
    "Upd-Flood", "aggressive-scan", "backdoor", "benign", "cryptojacking",
    "dos", "icmp-flood", "icmp-fragmentation", "icmp-fragmentation_old",
    "none", "none (ie. benign)", "os-fingerprinting", "os-fingerpriting",
    "os-scan", "port-scan", "pshack-flood", "push-ack-flood",
    "serice-detection", "service-detection", "service-detection-scan",
    "service-version-detection", "slowloris-scan", "syn-flood",
    "syn-stealth", "syn-stealth-scan", "synonymous-ip-flood",
    "synonymousip-flood", "tcp-flood", "tcp-port-scan", "udp-flood",
    "upd-flood", "vuln-scan", "vulnerability-scan", "weird-new-attack")

  /** Every LABEL_MAPPING key + unmapped raw labels (exact-match semantics:
    * the trailing-space variant must NOT map). */
  private val NetworkRawLabels: Seq[String] = Seq(
    "Charging Benign", "Charging Benign ", "MaliciousEV aggressive scan",
    "MaliciousEV os fingerprinting", "MaliciousEV port scan",
    "MaliciousEV service detection", "MaliciousEV syn stealth scan",
    "MaliciousEV vulnerability scan", "charging Aggressive scan",
    "charging aggressive scan", "charging icmp flood",
    "charging icmp fragmentation", "charging os fingerprinting",
    "charging port scan", "charging portscan", "charging push ack flood",
    "charging service detection", "charging service detection scan",
    "charging slowLoris scan", "charging syn flood", "charging syn stealth",
    "charging synonymous ip", "charging synonymous ip flood",
    "charging tcp flood", "charging udp flood", "charging vulnerability scan",
    "idle aggressive scan", "idle benign", "idle icmp flood",
    "idle icmp fragmentation", "idle mystery probe", "idle os fingerprinting",
    "idle port scan", "idle portscan", "idle push ack flood",
    "idle service detection", "idle slowloris scan", "idle syn flood",
    "idle syn stealth scan", "idle synonymous ip",
    "idle synonymous ip flood", "idle tcp flood", "idle udp flood",
    "idle vulnerability scan", "standalone")

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

    // Expected table transcribed from func_aux/func_preproc.py:48-94.
    "p3_group_map_full" ->
      """SELECT * FROM (VALUES
        |('  SYN-Flood ', 'DoS'), ('0', 'none'), ('Backdoor', 'host-attack'),
        |('NONE (ie. Benign)', 'none'), ('OS-Scan', 'recon'),
        |('Upd-Flood', 'DoS'), ('aggressive-scan', 'recon'),
        |('backdoor', 'host-attack'), ('benign', 'none'),
        |('cryptojacking', 'host-attack'), ('dos', 'dos'),
        |('icmp-flood', 'DoS'), ('icmp-fragmentation', 'DoS'),
        |('icmp-fragmentation_old', 'DoS'), ('none', 'none'),
        |('none (ie. benign)', 'none'), ('os-fingerprinting', 'recon'),
        |('os-fingerpriting', 'recon'), ('os-scan', 'recon'),
        |('port-scan', 'recon'), ('pshack-flood', 'DoS'),
        |('push-ack-flood', 'DoS'), ('serice-detection', 'recon'),
        |('service-detection', 'recon'), ('service-detection-scan', 'recon'),
        |('service-version-detection', 'recon'), ('slowloris-scan', 'DoS'),
        |('syn-flood', 'DoS'), ('syn-stealth', 'DoS'),
        |('syn-stealth-scan', 'DoS'), ('synonymous-ip-flood', 'DoS'),
        |('synonymousip-flood', 'DoS'), ('tcp-flood', 'DoS'),
        |('tcp-port-scan', 'recon'), ('udp-flood', 'DoS'),
        |('upd-flood', 'DoS'), ('vuln-scan', 'recon'),
        |('vulnerability-scan', 'recon'),
        |('weird-new-attack', 'weird-new-attack')
        |) AS t(attack, grp) ORDER BY attack""".stripMargin,

    // Expected table transcribed from
    // pipeline_trainingmodels_network.py:65-155 (+ the :222-238 chain).
    "p4_network_labels" ->
      """SELECT * FROM (VALUES
        |('Charging Benign', 'None', 'Benign', 0, 0, 0),
        |('Charging Benign ', 'Charging Benign ', 'Benign', CAST(NULL AS INT), 0, 1),
        |('MaliciousEV aggressive scan', 'aggressive-scan', 'Recon', 1, 1, 1),
        |('MaliciousEV os fingerprinting', 'os-fingerpriting', 'Recon', 4, 1, 1),
        |('MaliciousEV port scan', 'TCP-port-scan', 'Recon', 5, 1, 1),
        |('MaliciousEV service detection', 'service-version-detection', 'Recon', 7, 1, 1),
        |('MaliciousEV syn stealth scan', 'syn-stealth-scan', 'Recon', 10, 1, 1),
        |('MaliciousEV vulnerability scan', 'vulnerability-scan', 'Recon', 14, 1, 1),
        |('charging Aggressive scan', 'aggressive-scan', 'Recon', 1, 1, 1),
        |('charging aggressive scan', 'aggressive-scan', 'Recon', 1, 1, 1),
        |('charging icmp flood', 'icmp-flood', 'DoS', 2, 2, 1),
        |('charging icmp fragmentation', 'icmp-fragmentation', 'DoS', 3, 2, 1),
        |('charging os fingerprinting', 'os-fingerpriting', 'Recon', 4, 1, 1),
        |('charging port scan', 'TCP-port-scan', 'Recon', 5, 1, 1),
        |('charging portscan', 'TCP-port-scan', 'Recon', 5, 1, 1),
        |('charging push ack flood', 'pshack-flood', 'DoS', 6, 2, 1),
        |('charging service detection', 'service-version-detection', 'Recon', 7, 1, 1),
        |('charging service detection scan', 'service-version-detection', 'Recon', 7, 1, 1),
        |('charging slowLoris scan', 'slowloris-scan', 'DoS', 8, 2, 1),
        |('charging syn flood', 'syn-flood', 'DoS', 9, 2, 1),
        |('charging syn stealth', 'syn-stealth-scan', 'Recon', 10, 1, 1),
        |('charging synonymous ip', 'synonymousIP-flood', 'DoS', 11, 2, 1),
        |('charging synonymous ip flood', 'synonymousIP-flood', 'DoS', 11, 2, 1),
        |('charging tcp flood', 'TCP-flood', 'DoS', 12, 2, 1),
        |('charging udp flood', 'upd-flood', 'DoS', 13, 2, 1),
        |('charging vulnerability scan', 'vulnerability-scan', 'Recon', 14, 1, 1),
        |('idle aggressive scan', 'aggressive-scan', 'Recon', 1, 1, 1),
        |('idle benign', 'None', 'Benign', 0, 0, 0),
        |('idle icmp flood', 'icmp-flood', 'DoS', 2, 2, 1),
        |('idle icmp fragmentation', 'icmp-fragmentation', 'DoS', 3, 2, 1),
        |('idle mystery probe', 'idle mystery probe', 'Benign', CAST(NULL AS INT), 0, 1),
        |('idle os fingerprinting', 'os-fingerpriting', 'Recon', 4, 1, 1),
        |('idle port scan', 'TCP-port-scan', 'Recon', 5, 1, 1),
        |('idle portscan', 'TCP-port-scan', 'Recon', 5, 1, 1),
        |('idle push ack flood', 'pshack-flood', 'DoS', 6, 2, 1),
        |('idle service detection', 'service-version-detection', 'Recon', 7, 1, 1),
        |('idle slowloris scan', 'slowloris-scan', 'DoS', 8, 2, 1),
        |('idle syn flood', 'syn-flood', 'DoS', 9, 2, 1),
        |('idle syn stealth scan', 'syn-stealth-scan', 'Recon', 10, 1, 1),
        |('idle synonymous ip', 'synonymousIP-flood', 'DoS', 11, 2, 1),
        |('idle synonymous ip flood', 'synonymousIP-flood', 'DoS', 11, 2, 1),
        |('idle tcp flood', 'TCP-flood', 'DoS', 12, 2, 1),
        |('idle udp flood', 'upd-flood', 'DoS', 13, 2, 1),
        |('idle vulnerability scan', 'vulnerability-scan', 'Recon', 14, 1, 1),
        |('standalone', 'standalone', 'Benign', CAST(NULL AS INT), 0, 1)
        |) AS t(label_mul_raw, attack, scenario_str, label_mul_id, scenario_id, label)
        |ORDER BY label_mul_raw""".stripMargin,
  )
}
