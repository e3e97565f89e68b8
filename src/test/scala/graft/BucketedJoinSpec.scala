package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Bucketed-table layout: joins and aggregations between tables bucketed
  * the same way must run WITHOUT a shuffle exchange — the core co-located
  * join capability for 100 TB fact-to-fact joins. Plan-level guards, not
  * just result checks.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("same-bucketing join runs with no shuffle exchange, one file per bucket") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "pa")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "pb")
    Sources.writeBucketedTable(a, "graft_bkt_a", s"$dir/a", Seq("id"), 4, Seq("id"))
    Sources.writeBucketedTable(b, "graft_bkt_b", s"$dir/b", Seq("id"), 4, Seq("id"))
    try withNoBroadcast {
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "id")
      assert(joined.count() == 1000)
      val plan = finalPlan(spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "id"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // the pre-write repartition means one parquet file per bucket
      val files = new java.io.File(s"$dir/a").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 4, s"expected 1 file/bucket, found $files")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("aggregation on the bucket key needs no exchange; non-key still shuffles") {
    val dir = Files.createTempDirectory("graft_bucketed2").toString
    val df = (1 to 1000).map(i => (i.toLong % 50, s"g${i % 7}", i.toDouble))
      .toDF("id", "grp", "v")
    Sources.writeBucketedTable(df, "graft_bkt_c", s"$dir/c", Seq("id"), 4)
    try {
      val onKey = finalPlan(
        spark.table("graft_bkt_c").groupBy("id").agg(sum("v")))
      assert(!onKey.contains("Exchange"),
        s"groupBy(bucket key) still shuffles:\n$onKey")
      val offKey = finalPlan(
        spark.table("graft_bkt_c").groupBy("grp").agg(sum("v")))
      assert(offKey.contains("Exchange"),
        "sanity: a non-bucket-key groupBy must still exchange")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_c")
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val dir = Files.createTempDirectory("graft_bucketed3").toString
    val a = (1 to 100).map(i => (i.toLong, i)).toDF("id", "x")
    val b = (1 to 100).map(i => (i.toLong, i * 10)).toDF("id", "y")
    Sources.writeBucketedTable(a, "graft_bkt_d", s"$dir/d", Seq("id"), 4)
    Sources.writeBucketedTable(b, "graft_bkt_e", s"$dir/e", Seq("id"), 3)
    try withNoBroadcast {
      val joined = spark.table("graft_bkt_d").join(spark.table("graft_bkt_e"), "id")
      assert(joined.count() == 100) // correctness holds regardless of layout
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_d")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_e")
    }
  }
}
