package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run named SparkEntry queries repeatedly with a job
  * listener, printing per-run wall time and job counts/durations. Usage:
  * `runMain graft.tools.ProfileQuery <repeats> <query...>` with
  * SPARK_GRAFT_SF_DIR. Not part of the product surface. */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
    // "ALL" = the full query surface in bench order; "--release" frees
    // RDD-level storage (localCheckpoint blocks) after each query like
    // the r13 Bench epilogue, so storage occupancy can be compared
    val release = args.contains("--release")
    val names0 = args.drop(1).filterNot(_ == "--release").toSeq
    lazy val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val names = if (names0 == Seq("ALL")) all else names0
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var jobs = 0
    var jobSec = 0.0
    val jobStart = scala.collection.mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; jobStart(js.jobId) = System.nanoTime()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach(t0 => jobSec += (System.nanoTime() - t0) / 1e9)
    })
    graft.TsContract.check(spark, sfDir)
    try {
      graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
      graft.queries.Q.tableNames
        .foreach(t => graft.queries.Q.table(spark, sfDir, t).count())
    } catch { case _: Throwable => () }
    names.foreach { name =>
      for (r <- 1 to repeats) {
        val (j0, s0) = (jobs, jobSec)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val st = spark.sparkContext.getRDDStorageInfo
        println(f"[prof] $name%-28s r$r ${dt}%7.3f s  jobs=${jobs - j0}%3d  jobSec=${jobSec - s0}%7.3f  storedRdds=${st.length}%4d mem=${st.map(_.memSize).sum / 1e6}%9.1f MB")
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        if (release)
          try spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(false)) catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
