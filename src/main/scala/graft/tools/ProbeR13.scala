package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scratch probes: piecewise cost attribution for the queries
  * this round optimizes, at sf sizes and at synthetic 10-100M-row scale.
  * Not part of the product surface. Usage:
  *   runMain graft.tools.ProbeR13 <probe> (SPARK_GRAFT_SF_DIR env)
  */
object ProbeR13 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Q
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.headOption.getOrElse("dq") match {
      case "dq" =>
        val li = Q.table(spark, sfDir, "lineitem")
        val ord = Q.table(spark, sfDir, "orders")
        // warm scans
        li.count(); ord.count()
        for (r <- 1 to 3) {
          time(s"r$r fused agg WITH Unique (countDistinct)") {
            li.agg(count(col("l_orderkey")),
              countDistinct(struct(col("l_orderkey"), col("l_linenumber"))),
              sum(when(col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)),
              sum(when(col("l_quantity").between(1.0, 45.0), 1L).otherwise(0L)),
              sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)),
              sum(when(col("l_linestatus").rlike("^[OF]$"), 1L).otherwise(0L)),
              count(lit(1))).head()
          }
          time(s"r$r fused agg withOUT Unique") {
            li.agg(count(col("l_orderkey")),
              sum(when(col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)),
              sum(when(col("l_quantity").between(1.0, 45.0), 1L).otherwise(0L)),
              sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)),
              sum(when(col("l_linestatus").rlike("^[OF]$"), 1L).otherwise(0L)),
              count(lit(1))).head()
          }
          time(s"r$r unique via groupBy-2level") {
            li.groupBy(col("l_orderkey"), col("l_linenumber"))
              .agg(count(lit(1)).as("c"))
              .agg(count(lit(1)), sum("c")).head()
          }
          time(s"r$r anti-join count") {
            li.select(col("l_orderkey")).where(col("l_orderkey").isNotNull)
              .join(ord.select(col("o_orderkey").as("l_orderkey")).distinct(),
                Seq("l_orderkey"), "left_anti").count()
          }
          time(s"r$r regex-only pass") {
            li.agg(sum(when(col("l_linestatus").rlike("^[OF]$"), 1L)
              .otherwise(0L))).head()
          }
          time(s"r$r anti-join on DISTINCT fk + multiplicity") {
            li.select(col("l_orderkey")).where(col("l_orderkey").isNotNull)
              .groupBy(col("l_orderkey")).agg(count(lit(1)).as("__m"))
              .join(ord.select(col("o_orderkey").as("l_orderkey")).distinct(),
                Seq("l_orderkey"), "left_anti")
              .agg(coalesce(sum("__m"), lit(0L))).head()
          }
          time(s"r$r ALL rules via one groupBy(key) 2-level") {
            li.groupBy(col("l_orderkey"), col("l_linenumber"))
              .agg(count(col("l_orderkey")).as("p_nn"),
                sum(when(col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)).as("p_disc"),
                sum(when(col("l_quantity").between(1.0, 45.0), 1L).otherwise(0L)).as("p_qty"),
                sum(when(col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("p_rf"),
                sum(when(col("l_linestatus").rlike("^[OF]$"), 1L).otherwise(0L)).as("p_ls"),
                count(lit(1)).as("p_n"))
              .agg(sum("p_nn"), count(lit(1)), sum("p_disc"), sum("p_qty"),
                sum("p_rf"), sum("p_ls"), sum("p_n")).head()
          }
        }
      case "matry" =>
        // fused one-pass matryoshkaRecall vs the pre-r13 |dims|+1-pass
        // shape at synthetic scale (args: nRows, default 2M; dim 64)
        val n = args.lift(1).map(_.toInt).getOrElse(2000000)
        val dims = Seq(4, 8, 16, 32, 64)
        val corpus = spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(1), lit(64)), j =>
            sin(col("id") * j * 0.7 + j) * cos(col("id") * 0.3)).as("v"))
          .localCheckpoint(true) // materialize input OUTSIDE the timing
        val queries = corpus.where(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
          .localCheckpoint(true)
        def oldShape(): Unit = {
          import graft.ops.Similarity.bruteForceTopK
          val nQ = queries.count()
          val full = bruteForceTopK(corpus, queries, "vec_id", "v",
            "qid", "qv", 5).select(col("qid"), col("vec_id")).cache()
          val rows = dims.map { d =>
            val tc = corpus.withColumn("v", slice(col("v"), 1, d))
            val tq = queries.withColumn("qv", slice(col("qv"), 1, d))
            bruteForceTopK(tc, tq, "vec_id", "v", "qid", "qv", 5)
              .select(col("qid"), col("vec_id"))
              .join(full, Seq("qid", "vec_id"), "left_semi")
              .agg(count(lit(1)).as("n_hits"))
              .select(lit(d).as("dim"), col("n_hits"), lit(nQ).as("n_queries"),
                round(col("n_hits").cast("double") / (5 * nQ), 6).as("recall"))
          }
          noop(rows.reduce(_ unionAll _))
          full.unpersist()
        }
        for (r <- 1 to 2) {
          time(s"r$r matryoshka OLD |dims|+1-pass n=$n")(oldShape())
          time(s"r$r matryoshka NEW fused 1-pass  n=$n")(
            noop(graft.ops.Similarity.matryoshkaRecall(corpus, queries,
              "vec_id", "v", "qid", "qv", 5, dims)))
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
