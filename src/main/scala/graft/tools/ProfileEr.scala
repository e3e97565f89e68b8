package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot profiler for the entity-resolution + CC path: NO warmup —
  * measures the fresh-JVM cost the driver bench pays. */
object ProfileEr {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[er] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (q <- Seq("dedup_entity_resolution", "dedup_entity_resolution",
        "dedup_cc_clusters", "dedup_cc_clusters", "graph_triangles")) {
      time(q) { graft.SparkEntry.queries(q)(spark, sfDir).count() }
    }
    spark.stop()
  }
}
