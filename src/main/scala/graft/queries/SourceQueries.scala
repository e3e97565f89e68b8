package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q._
import graft.sources.Sources

/** S1/S3/S4 load semantics as oracle-checked queries (round-4 promotion of
  * the spec-only scan rows): each query materializes a deterministic CSV
  * fixture DERIVED FROM the events table (the s8_harvest_join pattern —
  * fixture values are reproducible in DuckDB from the same parquet), runs
  * the real `Sources` loader over it, and reduces to a small ordered
  * aggregate. The oracle replays the derivation + the loader's parse
  * semantics (time parsing, state_bin, filename labels, coalesce fallback,
  * dropna) in SQL over `events`.
  *
  * Fixtures are bounded by `event_id <` filters, so the driver-side write
  * stays a few hundred rows at any SF.
  */
object SourceQueries {

  /** Collect (deterministically ordered) rows and write one CSV file. */
  private def writeCsv(path: java.nio.file.Path, header: String,
      lines: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, (header +: lines).mkString("", "\n", "\n"))
  }

  private def fmt2(n: Long): String = f"${n}%02d"

  val queries: Map[String, QueryFn] = Map(
    // S1: power CSV scan — `time` string → timestamp, state_bin from a
    // messy State column (case + whitespace), global time order. The
    // output's first/last times are format-parse round-trips, so the
    // comparison pins to_timestamp's semantics, not a timezone epoch.
    "s1_load" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s1")
      val rows = table(s, dir, "events").where(col("event_id") < 200)
        .select("event_id", "event_type", "value")
        .orderBy("event_id").collect()
      val lines = rows.map { r =>
        val id = r.getLong(0)
        val time = s"2024-01-15 ${fmt2(id % 24)}:${fmt2(id * 7 % 60)}:${fmt2(id * 13 % 60)}"
        val state = if (r.getString(1) == "error") " Charging " else "Idle"
        s"$time,$state,${r.getDouble(2)}"
      }
      writeCsv(base.resolve("power/part-0.csv"), "time,State,value", lines.toSeq)
      Sources.loadPower(s, base.resolve("power").toString)
        .groupBy("state_bin")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"),
          min(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")).as("first_time"),
          max(date_format(col("timestamp"), "yyyy-MM-dd HH:mm:ss")).as("last_time"))
        .orderBy("state_bin")
    }),

    // S2: host CSV scan+clean — positional schema (every column left of
    // State is an event counter, `time` excluded), numeric coercion
    // (malformed → null), constant-column drop (ev_const vanishes,
    // proven by n_event_cols = 2), row-index timestamp in file order.
    "s2_host_load" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s2")
      val rows = table(s, dir, "events").where(col("event_id") < 240)
        .select("event_id", "event_type", "value")
        .orderBy("event_id").collect()
      val lines = rows.map { r =>
        val id = r.getLong(0)
        val v = r.getDouble(2)
        val evB = if (id % 53 == 0) s"x$id" else (v * 2).toString
        val state = if (r.getString(1) == "error") "CHARGING" else "idle"
        s"${v},$evB,1,$id,$state"
      }
      writeCsv(base.resolve("host/part-0.csv"),
        "ev_a,ev_b,ev_const,time,State", lines.toSeq)
      val (cleaned, eventCols) = Sources.loadHost(s, base.resolve("host").toString)
      cleaned.groupBy("state_bin")
        .agg(count(lit(1)).as("n"), round(sum("ev_a"), 4).as("sum_a"),
          round(sum("ev_b"), 4).as("sum_b"), max(col("timestamp")).as("max_ts"))
        .withColumn("n_event_cols", lit(eventCols.length))
        .orderBy("state_bin")
    }),

    // S3: multi-file merge — per-event-type CSVs in two EVSE dirs, label
    // from the file name (P6 stem rule), union, drop text cols, dropna
    // (value blank when event_id % 97 == 0 → null → row dropped).
    "s3_merge" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s3")
      val rows = table(s, dir, "events").where(col("event_id") < 300)
        .select("event_id", "event_type", "value")
        .orderBy("event_id").collect()
      for (evse <- Seq("A", "B"); (t, rs) <- rows.groupBy(_.getString(1))) {
        val lines = rs.sortBy(_.getLong(0)).map { r =>
          val v = if (r.getLong(0) % 97 == 0) "" else r.getDouble(2).toString
          s"${r.getLong(0)},$v"
        }
        writeCsv(base.resolve(s"evse$evse/net-cap-$t.csv"), "event_id,value",
          lines.toSeq)
      }
      Sources.mergeNetworkCsvs(s, base.resolve("evseA").toString,
          base.resolve("evseB").toString, dropCols = Seq("source_file"))
        .groupBy(col("label_mul_raw"), col("evse"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("label_mul_raw", "evse")
    }),

    // S4: time-column fallback chain — the preferred column is absent, so
    // the loader must coalesce to bidirectional_first_seen_ms.
    "s4_fallback" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s4")
      val rows = table(s, dir, "events").where(col("event_id") < 250)
        .select("event_id", "value")
        .orderBy("event_id").collect()
      val lines = rows.map(r =>
        s"${r.getLong(0)},${r.getLong(0) * 131 + 7},${r.getDouble(1)}")
      writeCsv(base.resolve("net/flows.csv"),
        "flow_id,bidirectional_first_seen_ms,value", lines.toSeq)
      Sources.loadNetwork(s, base.resolve("net").toString, timeCol = "flow_start")
        .groupBy((col("flow_id") % 7).cast("int").as("g"))
        .agg(count(lit(1)).as("n"), min("timestamp").as("min_ts"),
          max("timestamp").as("max_ts"), round(sum("value"), 4).as("sum_value"))
        .orderBy("g")
    }),

    // S10: JSONL corpus load with corrupt-record quarantine — valid lines
    // parse against the explicit schema; every doc_id % 10 == 3 line is
    // malformed (invalid token BEFORE any field, so Spark's PERMISSIVE
    // partial-result parse can't populate anything) and must surface via
    // the corrupt flag with the raw line retained, never dropped. The
    // doc_id of corrupt rows is recovered from the quarantined raw text
    // for a deterministic ordering.
    "s10_jsonl_load" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s10")
      val rows = table(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), md5(col("text")).as("h"), col("n_chars"))
        .orderBy("doc_id").collect()
      val lines = rows.map { r =>
        val id = r.getLong(0)
        if (id % 10 == 3) s"""{"n": oops, "doc_id": $id}"""
        else s"""{"doc_id": $id, "h": "${r.getString(1)}", "n": ${r.getLong(2)}}"""
      }
      val f = base.resolve("docs.jsonl")
      java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("h", org.apache.spark.sql.types.StringType)
        .add("n", org.apache.spark.sql.types.LongType)
      Sources.readJsonl(s, f.toString, schema)
        .select(
          coalesce(col("doc_id"), regexp_extract(col("_corrupt_record"),
            "\"doc_id\": (\\d+)", 1).cast("long")).as("doc_id"),
          col("h"), col("n"), col("corrupt"))
        .orderBy("doc_id")
    }),

    // S5: windows parquet sink/source GOLDEN-FILE roundtrip — the fixture
    // goes through the real writeWindows (split-partitioned parquet) and
    // readWindows, and the query emits the re-read content; the twin
    // computes the same content straight from events. A green row proves
    // the sink bytes preserve every value and type end-to-end, including
    // the array column and the partition-directory `split` column. The
    // array roundtrips internally but the COMPARISON projection is the
    // scalar elements f0/f1 — the external harness sorts result frames
    // over all columns and an array column is unhashable there.
    "s5_windows_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s5")
      val fixture = table(s, dir, "events").where(col("event_id") < 2000)
        .select(col("event_id").as("wid"),
          array((col("event_id") * 7 % 101) / lit(101.0),
            (col("event_id") * 13 % 89) / lit(89.0)).as("features"),
          col("event_type").as("attack"),
          when(col("event_id") % 10 < 7, "train")
            .when(col("event_id") % 10 < 9, "val").otherwise("test").as("split"))
      Sources.writeWindows(fixture, base.resolve("windows").toString)
      Sources.readWindows(s, base.resolve("windows").toString)
        .select(col("wid"), col("features").getItem(0).as("f0"),
          col("features").getItem(1).as("f1"), col("attack"), col("split"))
        .orderBy("wid")
    }),

    // S11: ORC sink/source GOLDEN-FILE roundtrip — the same lossless-sink
    // proof as S5 for the other columnar format Spark ships natively
    // (warehouses hand corpora around as ORC too); values, types, and an
    // array column must survive the bytes. Comparison projects the array
    // to scalars (the harness sorts over all columns; arrays unhashable
    // there, the s5 note).
    "s11_orc_roundtrip" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s11")
      val fixture = table(s, dir, "documents").where(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(col("text")).as("h"),
          array((col("doc_id") * 7 % 101) / lit(101.0),
            (col("doc_id") * 13 % 89) / lit(89.0)).as("features"))
      val path = base.resolve("docs_orc").toString
      fixture.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("h"), round(col("features").getItem(0), 6).as("f0"),
          round(col("features").getItem(1), 6).as("f1"))
        .orderBy("doc_id")
    }),

    // S6: JSON metric sink GOLDEN-FILE roundtrip — doubles carrying
    // NaN/+Inf/-Inf are sanitized to null by the sink (JSON has no tokens
    // for them; func_preproc.py:481-534 semantics), written as a JSON doc,
    // read back, and emitted; non-double columns pass through untouched.
    // The twin applies the same NaN/Inf -> NULL map directly over events.
    "s6_json_sanitize" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_s6")
      val fixture = table(s, dir, "events").where(col("event_id") < 1000)
        .select(col("event_id").as("id"),
          when(col("event_id") % 4 === 0, lit(Double.NaN))
            .when(col("event_id") % 4 === 1, lit(Double.PositiveInfinity))
            .when(col("event_id") % 4 === 2, lit(Double.NegativeInfinity))
            .otherwise((col("event_id") * 31 % 97) / lit(97.0)).as("metric"),
          col("event_type").as("label"),
          (col("event_id") * 3).as("count_events"))
      val out = base.resolve("metrics").toString
      Sources.writeMetricsJson(fixture, out)
      s.read.json(out)
        .select("id", "metric", "label", "count_events")
        .orderBy("id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "s1_load" ->
      """WITH fix AS (
        |  SELECT '2024-01-15 ' || lpad(CAST(event_id % 24 AS VARCHAR), 2, '0') ||
        |         ':' || lpad(CAST(event_id * 7 % 60 AS VARCHAR), 2, '0') ||
        |         ':' || lpad(CAST(event_id * 13 % 60 AS VARCHAR), 2, '0') AS t,
        |    CASE WHEN event_type = 'error' THEN ' Charging ' ELSE 'Idle' END AS state,
        |    value
        |  FROM events WHERE event_id < 200)
        |SELECT CASE WHEN lower(trim(state)) = 'charging' THEN 1 ELSE 0 END AS state_bin,
        |  count(*) AS n, round(sum(value), 4) AS sum_value,
        |  min(t) AS first_time, max(t) AS last_time
        |FROM fix GROUP BY 1 ORDER BY 1""".stripMargin,

    // n_event_cols is the LOADER's computed count (ev_const dropped as
    // constant, time excluded by name) — the literal 2 here is the
    // expected value, not a tautology.
    "s2_host_load" ->
      """WITH fix AS (
        |  SELECT event_id, value,
        |    CASE WHEN event_id % 53 = 0 THEN NULL ELSE value * 2 END AS ev_b,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS state_bin,
        |    CAST(row_number() OVER (ORDER BY event_id) - 1 AS DOUBLE) AS ts
        |  FROM events WHERE event_id < 240)
        |SELECT state_bin, count(*) AS n,
        |  round(sum(value), 4) AS sum_a,
        |  round(sum(ev_b), 4) AS sum_b,
        |  max(ts) AS max_ts,
        |  2 AS n_event_cols
        |FROM fix GROUP BY 1 ORDER BY 1""".stripMargin,

    "s3_merge" ->
      """WITH f AS (
        |  SELECT event_type AS label_mul_raw, e.evse, value
        |  FROM events CROSS JOIN (SELECT unnest(['A', 'B']) AS evse) e
        |  WHERE event_id < 300 AND event_id % 97 <> 0)
        |SELECT label_mul_raw, evse, count(*) AS n,
        |  round(sum(value), 4) AS sum_value
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "s4_fallback" ->
      """SELECT CAST(event_id % 7 AS INTEGER) AS g, count(*) AS n,
        |  min(CAST(event_id * 131 + 7 AS DOUBLE)) AS min_ts,
        |  max(CAST(event_id * 131 + 7 AS DOUBLE)) AS max_ts,
        |  round(sum(value), 4) AS sum_value
        |FROM events WHERE event_id < 250 GROUP BY 1 ORDER BY 1""".stripMargin,

    // replay of the fixture derivation, not of the file: the twin computes
    // what a lossless quarantine-load must surface per doc
    "s10_jsonl_load" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 3 THEN NULL ELSE md5(text) END AS h,
        |  CASE WHEN doc_id % 10 = 3 THEN NULL ELSE n_chars END AS n,
        |  doc_id % 10 = 3 AS corrupt
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

    "s5_windows_roundtrip" ->
      """SELECT event_id AS wid,
        |  (event_id * 7 % 101) / 101.0e0 AS f0,
        |  (event_id * 13 % 89) / 89.0e0 AS f1,
        |  event_type AS attack,
        |  CASE WHEN event_id % 10 < 7 THEN 'train'
        |       WHEN event_id % 10 < 9 THEN 'val' ELSE 'test' END AS split
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "s11_orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS h,
        |  round((doc_id * 7 % 101) / 101.0e0, 6) AS f0,
        |  round((doc_id * 13 % 89) / 89.0e0, 6) AS f1
        |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin,

    "s6_json_sanitize" ->
      """SELECT event_id AS id,
        |  CASE WHEN event_id % 4 IN (0, 1, 2) THEN NULL
        |       ELSE (event_id * 31 % 97) / 97.0e0 END AS metric,
        |  event_type AS label,
        |  event_id * 3 AS count_events
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
  )
}
