package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Core relational surface: scans, aggregations, joins (SURVEY §2.4 J*),
  * set ops (§2.8), sorts/limits/top-k (§2.7), distinct counts (G2/G3/G10).
  * These exercise the general `ds.join/groupBy/union/orderBy` engine API
  * the duckdb-oracle harness demands (SURVEY §2.4 note).
  */
object RelationalQueries {

  val queries: Map[String, QueryFn] = Map(
    "q1_agg" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_join_dims" -> ((s, dir) => {
      // Broadcast star join: orders ⋈ customer ⋈ nation ⋈ region — dims are
      // tiny, so Catalyst broadcasts them (verified in the plan; no shuffle
      // of the fact side beyond the final small groupBy).
      val orders = table(s, dir, "orders")
      val customer = table(s, dir, "customer")
      val nation = table(s, dir, "nation")
      val region = table(s, dir, "region")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    }),

    "q_semi_join" -> ((s, dir) => {
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
      customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    "q_anti_join" -> ((s, dir) => {
      val customer = table(s, dir, "customer")
      val orders = table(s, dir, "orders")
      customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    "q_topk" -> ((s, dir) =>
      // G10 value_counts top-N diagnostics, deterministic tie-break.
      table(s, dir, "part").groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p_brand").asc).limit(10)),

    "q_sort_limit" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(25)),

    "q_union" -> ((s, dir) => {
      // §2.8 pd.concat row-union as unionByName.
      val orders = table(s, dir, "orders")
      orders.where(col("o_totalprice") < 1000)
        .unionByName(orders.where(col("o_orderpriority") === "1-URGENT"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    "q_supplier_stats" -> ((s, dir) => {
      // Supplier -> nation -> region star rollup (the last untouched
      // testdata table): two broadcast dim hops, one aggregation.
      val sup = table(s, dir, "supplier")
      val nat = table(s, dir, "nation")
      val reg = table(s, dir, "region")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"),
          round(avg("s_acctbal"), 4).as("avg_bal"),
          round(max("s_acctbal"), 2).as("max_bal"))
        .orderBy("r_name")
    }),

    "q_subqueries" -> ((s, dir) => {
      // The SQL-parser surface: correlated EXISTS, IN, and a scalar
      // subquery in one statement — Catalyst lowers these to semi joins
      // and a broadcast scalar, exercised through spark.sql rather than
      // the DataFrame API.
      table(s, dir, "customer").createOrReplaceTempView("customer_v")
      table(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT c_mktsegment,
               count(*) AS n,
               sum(CASE WHEN c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
                        THEN 1 ELSE 0 END) AS n_above_avg
        FROM customer_v c
        WHERE EXISTS (SELECT 1 FROM orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 150000)
          AND c_nationkey IN (SELECT c_nationkey FROM customer_v
                              GROUP BY 1 HAVING count(*) >= 3)
        GROUP BY 1 ORDER BY 1""")
    }),

    "q_range_frame" -> ((s, dir) => {
      // RANGE window frame (value-based, not row-based): for each order,
      // revenue of all orders within 5000 of its price — frame bounds in
      // the ORDER BY value domain. The un-partitioned window runs on the
      // keymod-filtered slice (documented-tiny, like the curve tables);
      // partition by a real key for the 100 TB form.
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("o_totalprice"))
        .rangeBetween(-5000L, Window.currentRow)
      table(s, dir, "orders").where(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          round(sum("o_totalprice").over(w), 2).as("nearby_revenue"),
          count(lit(1)).over(w).cast("long").as("nearby_n"))
        .orderBy("o_orderkey")
    }),

    "q_outer_join" -> ((s, dir) => {
      // Full-outer join semantics: customers without orders AND orders
      // whose customer key misses the filtered dim both survive with
      // nulls; the shared key is coalesced. Aggregated per nation bucket.
      val cust = table(s, dir, "customer").where(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_nationkey"))
      val ords = table(s, dir, "orders").where(col("o_totalprice") > 100000)
        .select(col("o_custkey"), col("o_totalprice"))
      cust.join(ords, col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(coalesce(col("c_nationkey"), lit(-1L)).as("nation"))
        .agg(count(lit(1)).as("n"),
          count(col("o_custkey")).as("n_with_order"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("nation")
    }),

    "q_intersect_except" -> ((s, dir) => {
      // Set operations: customers present in BOTH halves of an order-key
      // split (INTERSECT) and in the first but not the second (EXCEPT) —
      // distinct-set semantics, not bag.
      val ords = table(s, dir, "orders")
      val lo = ords.where(col("o_orderkey") % 2 === 0).select("o_custkey")
      val hi = ords.where(col("o_orderkey") % 2 === 1).select("o_custkey")
      lo.intersect(hi).withColumn("op", lit("both"))
        .unionByName(lo.except(hi).withColumn("op", lit("even_only")))
        .groupBy("op").agg(count(lit(1)).as("n_customers"))
        .orderBy("op")
    }),

    "g2_group_counts" -> ((s, dir) =>
      table(s, dir, "orders").groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n")).orderBy("o_orderstatus", "o_orderpriority")),

    "g3_distinct_counts" -> ((s, dir) => {
      // Per-column distinct counts (constant/near-empty col detection
      // F6/F7/G3), nunique(dropna=False) parity via null sentinel.
      val li = table(s, dir, "lineitem")
      Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount")
        .map(c => li.agg(
          countDistinct(coalesce(col(c).cast("string"), lit("§null§"))).as("n_distinct"))
          .select(lit(c).as("column_name"), col("n_distinct")))
        .reduce(_ unionByName _).orderBy("column_name")
    }),

    "q_running_sum" -> ((s, dir) => {
      // W4-family relational window function: per-customer running order
      // total in date order (cumulative frame over a partitioned sort).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      table(s, dir, "orders")
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .where(col("o_custkey") < 200)
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_topn_per_group" -> ((s, dir) => {
      // Grouped top-N: 3 highest-value orders per status, rank window +
      // deterministic tie-break.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 3)
        .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rn")
    }),

    "g4_mode_per_group" -> ((s, dir) => {
      // Mode with deterministic tie-break (smallest value wins) — the
      // portable spec of pandas .mode()[0] (func_plot.py:146-153).
      import org.apache.spark.sql.expressions.Window
      val counts = table(s, dir, "orders").groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("n").desc, col("o_orderpriority").asc)
      counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"))
        .orderBy("o_orderstatus")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_join_dims" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_topk" ->
      "SELECT p_brand, count(*) AS n FROM part GROUP BY 1 ORDER BY n DESC, p_brand ASC LIMIT 10",

    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 25""".stripMargin,

    "q_union" ->
      """SELECT o_orderstatus, count(*) AS n FROM (
        |  SELECT * FROM orders WHERE o_totalprice < 1000
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_supplier_stats" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  round(avg(s_acctbal), 4) AS avg_bal, round(max(s_acctbal), 2) AS max_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_subqueries" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CASE WHEN c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND c_nationkey IN (SELECT c_nationkey FROM customer
        |                      GROUP BY 1 HAVING count(*) >= 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_range_frame" ->
      """SELECT o_orderkey, o_totalprice,
        |  round(sum(o_totalprice) OVER w, 2) AS nearby_revenue,
        |  count(*) OVER w AS nearby_n
        |FROM (SELECT * FROM orders WHERE o_orderkey % 20 = 0)
        |WINDOW w AS (ORDER BY o_totalprice
        |  RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_outer_join" ->
      """WITH c AS (SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000),
        |o AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000)
        |SELECT CAST(coalesce(c_nationkey, -1) AS BIGINT) AS nation, count(*) AS n,
        |  count(o_custkey) AS n_with_order, round(sum(o_totalprice), 2) AS revenue
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_intersect_except" ->
      """WITH lo AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
        |hi AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT op, count(*) AS n_customers FROM (
        |  SELECT 'both' AS op, o_custkey FROM (SELECT * FROM lo INTERSECT SELECT * FROM hi)
        |  UNION ALL
        |  SELECT 'even_only' AS op, o_custkey FROM (SELECT * FROM lo EXCEPT SELECT * FROM hi))
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "g2_group_counts" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "g3_distinct_counts" ->
      """SELECT 'l_returnflag' AS column_name, count(DISTINCT coalesce(CAST(l_returnflag AS VARCHAR), '§null§')) AS n_distinct FROM lineitem
        |UNION ALL SELECT 'l_linestatus', count(DISTINCT coalesce(CAST(l_linestatus AS VARCHAR), '§null§')) FROM lineitem
        |UNION ALL SELECT 'l_quantity', count(DISTINCT coalesce(CAST(l_quantity AS VARCHAR), '§null§')) FROM lineitem
        |UNION ALL SELECT 'l_discount', count(DISTINCT coalesce(CAST(l_discount AS VARCHAR), '§null§')) FROM lineitem
        |ORDER BY column_name""".stripMargin,

    "q_running_sum" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |  FROM orders) t
        |WHERE o_custkey < 200 ORDER BY 1, 2""".stripMargin,

    "q_topn_per_group" ->
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY 1, 2""".stripMargin,

    "g4_mode_per_group" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY 1, 2) t
        |WHERE rn = 1 ORDER BY 1""".stripMargin,
  )
}
