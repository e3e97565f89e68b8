package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked surface: one entry per implemented
  * operator from SURVEY.md §2 (and the training-data extensions), each with
  * a DuckDB-equivalent SQL twin in `oracleSql` (omitted only for ops whose
  * semantics aren't SQL-expressible — those get a rows-only check).
  */
object SparkEntry {

  private val groups: Seq[(Map[String, Q.QueryFn], Map[String, String])] = Seq(
    (RelationalQueries.queries, RelationalQueries.oracle),
    (LabelQueries.queries, LabelQueries.oracle),
    (SplitWindowQueries.queries, SplitWindowQueries.oracle),
    (MetricQueries.queries, MetricQueries.oracle),
    (DedupTextQueries.queries, DedupTextQueries.oracle),
    (SimilarityQueries.queries, SimilarityQueries.oracle),
    (RowsOnlyQueries.queries, RowsOnlyQueries.oracle),
    (SourceQueries.queries, SourceQueries.oracle),
    (JoinQueries.queries, JoinQueries.oracle),
    (AnalyticsQueries.queries, AnalyticsQueries.oracle),
    (ExperimentQueries.queries, ExperimentQueries.oracle),
    (SelectionQueries.queries, SelectionQueries.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = groups.iterator.map(_._1).reduce(_ ++ _)
    // a name collision across groups would silently shadow a query and
    // shrink the correctness gate — fail loudly instead
    require(merged.size == groups.map(_._1.size).sum,
      "duplicate query names across query groups")
    merged
  }

  def oracleSql: Map[String, String] = {
    val merged = groups.iterator.map(_._2).reduce(_ ++ _)
    require(merged.size == groups.map(_._2.size).sum,
      "duplicate oracle names across query groups")
    merged
  }

  /** Data-dependent oracles (literal-replay at fit time): the SQL twin
    * embeds a model fitted on the given sfDir (PCA components, BPE merge
    * rules), so it must be generated with a live session against the same
    * data the queries read. Verify merges these into oracle_sql.json
    * alongside [[oracleSql]]; all fits are deterministic, so the twin a
    * Verify run writes matches the model the query run fits. */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] = {
    val merged = SimilarityQueries.dynamicOracle ++ RowsOnlyQueries.dynamicOracle
    require(merged.keySet.intersect(oracleSql.keySet).isEmpty,
      "dynamic oracle would shadow a static oracle")
    merged
  }
}
