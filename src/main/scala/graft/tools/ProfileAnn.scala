package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the ann_ivf job breakdown (round-9 perf item).
  * Not part of the product surface. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var jobs = 0
    val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; jobStart(js.jobId) = System.nanoTime()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.get(je.jobId).foreach { t0 =>
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
    })
    def t[A](name: String)(f: => A): A = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs - j0}")
      r
    }
    def emb = graft.queries.Q.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))

    t("warmup q1") { graft.queries.Q.table(spark, sfDir, "lineitem").count() }
    t("warmup emb count") { emb.count() }

    for (round <- 1 to 2) {
      t(s"r$round full ann_ivf") {
        val e = emb
        val queries = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("qid"), col("v").as("qv"))
        graft.ops.Similarity.ivfTopK(e, queries, "vec_id", "v", "qid", "qv",
          k = 3, nCells = 16, nProbe = 4, centroidsByHash = false).count()
      }
      spark.catalog.clearCache()
    }
    // phase breakdown (mirrors ivfTopK internals)
    val e = emb
    val (centroidData, centroids) = t("sampleCentroids") {
      val rows = e.select(col("vec_id").as("cell_id"), col("v").as("cvec"), col("vec_id").as("h"))
        .orderBy("h").limit(16).drop("h")
        .withColumn("cnorm", graft.functions.VectorFunctions.l2norm(col("cvec")))
      val d = rows.collect()
      (d, spark.createDataFrame(java.util.Arrays.asList(d: _*), rows.schema))
    }
    val sorted = centroidData
    val cvecs = sorted.map(_.getSeq[Double](1).toArray)
    val cnorms = sorted.map(_.getDouble(2))
    val corpusN = e.select(col("vec_id"), col("v"))
      .withColumn("vnorm", graft.functions.VectorFunctions.l2norm(col("v")))
    val assigned = corpusN.withColumn("cell_id",
      element_at(array(sorted.toIndexedSeq.map(r => lit(r.get(0))): _*),
        graft.functions.VectorFunctions.nearestCentroid(col("v"), col("vnorm"), cvecs, cnorms) + 1))
    t("assigned.count") { assigned.count() }
    t("assigned.count again") { assigned.count() }
    spark.stop()
  }
}
