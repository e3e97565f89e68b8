package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone per-query profiler: times named SparkEntry queries in
  * isolation (fresh plan each rep, warm JVM/scan), so a bench regression
  * can be attributed to the query itself vs. interference from the long
  * serial bench run. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt 'runMain graft.tools.ProfileQuery q_join_dims r1_packet_loss [reps]'
  * Set SPARK_GRAFT_NO_WARMUP=1 to skip the warmup and measure the
  * fresh-JVM one-shot cost a driver bench's first query pays.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val reps = args.lastOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(3)
    val names = args.filterNot(a => scala.util.Try(a.toInt).isSuccess)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as graft.Bench: JVM/codegen + every table's footer
    if (!sys.env.contains("SPARK_GRAFT_NO_WARMUP")) try {
      graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
      graft.queries.Q.tableNames
        .foreach(t => graft.queries.Q.table(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[profile] UNKNOWN query $name")
        case Some(fn) =>
          (1 to reps).foreach { rep =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            println(f"[profile] $name%-28s rep $rep  ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
          }
      }
    }
    spark.stop()
  }
}
