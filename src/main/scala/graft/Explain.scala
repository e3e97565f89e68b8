package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: print the formatted physical plan of selected queries
  * (all, or names passed as args). Usage:
  *   sbt 'runMain graft.Explain [sfDir] [query...]'
  * Audit points (builder brief): broadcast joins on dim tables, pushed
  * filters / pruned schemas at the parquet scans, WholeStageCodegen spans,
  * no unexpected single-partition exchanges outside the documented
  * global-order operators.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: $e") }
    }
    spark.stop()
  }
}
