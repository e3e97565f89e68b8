package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.queries.Q._

/** Time-aware join surface (as-of / point-in-interval), oracled against
  * DuckDB's native ASOF JOIN and a plain inequality join respectively.
  * The Spark plans are the single-shuffle union-carry and the binned
  * equi-join — see [[graft.ops.Joins]] for the 100 TB rationale.
  */
object JoinQueries {

  private val HourUs = 3600L * 1000000L

  val queries: Map[String, QueryFn] = Map(
    "q_asof_join" -> ((s, dir) => {
      // For every error event: the user's most recent purchase at-or-before
      // it (value + time), left-outer when no prior purchase exists. The
      // purchase side is deduped per (user, ts) so ties are deterministic.
      val ev = table(s, dir, "events")
      // Times travel as exact epoch-MICROsecond longs (`div`, not `/`:
      // integer division — a double round-trip at 1e18 loses the tail).
      // Micros, not nanos, because DuckDB truncates TIMESTAMP(NANOS)
      // parquet to µs on read; the join itself also compares at µs so the
      // two engines see identical orderings.
      val evUs = ev.withColumn("ts_us", col("ts"))
      val purchases = evUs.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts_us").agg(round(max("value"), 4).as("purchase_value"))
        .withColumn("purchase_ts_us", col("ts_us"))
      val errors = evUs.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts_us")
      Joins.asofJoin(errors, purchases, Seq("user_id"), "ts_us", "ts_us",
          Seq("purchase_value", "purchase_ts_us"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("purchase_value"), col("purchase_ts_us"))
        .orderBy("event_id")
    }),

    "q_range_join" -> ((s, dir) => {
      // Clicks landing inside the hour following each signup (any user):
      // count + value sum per signup interval. Inner semantics — signups
      // with no clicks in-window drop out on both sides.
      // µs timestamps for the same reason as q_asof_join: boundary
      // comparisons must be engine-identical, not just almost-always-equal.
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val intervals = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
          col("ts_us").as("lo"), (col("ts_us") + HourUs).as("hi"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("ts_us").as("click_ts"), col("value"))
      Joins.rangeJoin(clicks, "click_ts", intervals, "lo", "hi", HourUs.toDouble)
        .groupBy("signup_id")
        .agg(count(lit(1)).as("n_clicks"), round(sum("value"), 4).as("click_value"))
        .orderBy("signup_id")
    }),

    "q_interval_overlap" -> ((s, dir) => {
      // Interval-interval overlap per user: 2-hour click windows crossing
      // 2-hour purchase windows. Binned equi-join; each pair emitted
      // exactly once via the greatest(lo)-bin assignment (no dedup pass).
      val ev = table(s, dir, "events").withColumn("ts_us", col("ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("c_lo"), (col("ts_us") + 2 * HourUs).as("c_hi"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("p_lo"), (col("ts_us") + 2 * HourUs).as("p_hi"))
      Joins.overlapJoin(clicks, "c_lo", "c_hi", purchases, "p_lo", "p_hi",
          binWidth = (2 * HourUs).toDouble, keys = Seq("user_id"))
        .select("user_id", "click_id", "purchase_id")
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    "q_bloom_join" -> ((s, dir) => {
      // Selective fact⋈dim join through the Bloom pre-filter: high-value
      // orders only (~2% of orders), so most lineitem rows are dropped
      // BEFORE the shuffle. The oracle is the PLAIN join — bloom false
      // positives must be invisible in the result.
      val li = table(s, dir, "lineitem")
      val hot = table(s, dir, "orders").where(col("o_totalprice") > 450000)
      Joins.bloomFilteredJoin(li, hot, "l_orderkey", "o_orderkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "scd2_build" -> ((s, dir) => {
      // SCD Type-2 history build over the lineitem "change log": key =
      // l_orderkey, version time = l_shipdate (l_linenumber disambiguates
      // same-day lines), tracked attrs = (returnflag, linestatus). Rows
      // whose flags equal the previous version's open NO new interval;
      // the last interval per key is open-ended (is_current).
      val li = table(s, dir, "lineitem").where(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"))
      graft.ops.Changelog.scd2(li, "l_orderkey", "l_shipdate",
          Seq("l_returnflag", "l_linestatus"), Seq(col("l_linenumber")))
        .select(col("l_orderkey"), col("l_linenumber"), col("valid_from"),
          // the Kimball far-future close for open intervals (a NULL
          // valid_to is also NaT-unsortable in the comparison harness)
          coalesce(col("valid_to"),
            lit(java.sql.Date.valueOf("9999-12-31"))).as("valid_to"),
          col("is_current"), col("l_returnflag"), col("l_linestatus"))
        .orderBy("l_orderkey", "valid_from", "l_linenumber")
    }),

    "cdc_merge" -> ((s, dir) => {
      // Latest-wins CDC merge: base snapshot = each user's EARLIEST
      // event; change log = every event of users < 80, with 'error' rows
      // as delete tombstones. One window collapses the log, one outer
      // join applies it.
      val ev = table(s, dir, "events")
      val base = ev.groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_type"), col("value")))
          .as("f"))
        .select(col("user_id"), col("f.event_type").as("event_type"),
          round(col("f.value"), 6).as("value"))
      val log = ev.where(col("user_id") < 80)
        .select(col("user_id"), col("ts"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("event_type"), round(col("value"), 6).as("value"))
      graft.ops.Changelog.cdcMerge(base, log, "user_id", "ts", "op",
          Seq("event_type", "value"))
        .orderBy("user_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "scd2_build" ->
      """WITH log AS (
        |  SELECT l_orderkey, l_shipdate, l_linenumber, l_returnflag,
        |         l_linestatus
        |  FROM lineitem WHERE l_orderkey < 1000),
        |m AS (
        |  SELECT *, CASE WHEN row_number() OVER w = 1 THEN true
        |    WHEN l_returnflag IS DISTINCT FROM lag(l_returnflag) OVER w
        |      OR l_linestatus IS DISTINCT FROM lag(l_linestatus) OVER w
        |    THEN true ELSE false END AS chg
        |  FROM log
        |  WINDOW w AS (PARTITION BY l_orderkey
        |    ORDER BY l_shipdate, l_linenumber, l_returnflag, l_linestatus)),
        |k AS (SELECT * FROM m WHERE chg),
        |v AS (
        |  SELECT l_orderkey, l_linenumber, l_shipdate AS valid_from,
        |    lead(l_shipdate) OVER w2 AS valid_to, l_returnflag, l_linestatus
        |  FROM k
        |  WINDOW w2 AS (PARTITION BY l_orderkey
        |    ORDER BY l_shipdate, l_linenumber, l_returnflag, l_linestatus))
        |SELECT l_orderkey, l_linenumber, valid_from,
        |  coalesce(valid_to, DATE '9999-12-31') AS valid_to,
        |  valid_to IS NULL AS is_current, l_returnflag, l_linestatus
        |FROM v ORDER BY l_orderkey, valid_from, l_linenumber""".stripMargin,

    "cdc_merge" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_type,
        |         round(value, 6) AS value
        |  FROM events),
        |base AS (
        |  SELECT user_id, event_type, value FROM (
        |    SELECT user_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
        |    FROM e) WHERE rn = 1),
        |log AS (
        |  SELECT user_id, t,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type, value
        |  FROM e WHERE user_id < 80),
        |latest AS (
        |  -- same same-ts tie-break as Changelog.cdcMerge (op DESC, then
        |  -- the attr tuple DESC): without it two same-ts log rows for one
        |  -- user would make this window nondeterministic
        |  SELECT user_id AS lk, op, event_type AS le, value AS lv FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY t DESC, op DESC, event_type DESC, value DESC) AS rn
        |    FROM log) WHERE rn = 1)
        |SELECT coalesce(b.user_id, l.lk) AS user_id,
        |  CASE WHEN l.op = 'U' THEN l.le ELSE b.event_type END AS event_type,
        |  CASE WHEN l.op = 'U' THEN l.lv ELSE b.value END AS value
        |FROM base b FULL OUTER JOIN latest l ON b.user_id = l.lk
        |WHERE coalesce(l.op, 'U') <> 'D'
        |ORDER BY user_id""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_join" ->
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         round(max(value), 4) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE event_type = 'error')
        |SELECT l.event_id, l.user_id, l.ts_us,
        |       r.purchase_value, r.ts_us AS purchase_ts_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.event_id""".stripMargin,

    "q_range_join" ->
      """SELECT r.event_id AS signup_id, count(*) AS n_clicks,
        |       round(sum(l.value), 4) AS click_value
        |FROM events l JOIN events r
        |  ON l.event_type = 'click' AND r.event_type = 'signup'
        | AND epoch_us(l.ts) >= epoch_us(r.ts)
        | AND epoch_us(l.ts) < epoch_us(r.ts) + 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_overlap" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS lo,
        |         epoch_us(ts) + 7200000000 AS hi
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS lo,
        |         epoch_us(ts) + 7200000000 AS hi
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, p.purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.lo < p.hi AND p.lo < c.hi
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
