package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.streaming.StreamingOps

/** Skew-salting transparency (salted == unsalted) + streaming exact dedup. */
class SkewStreamDedupSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: one hot key with many distinct values + tail keys
  private lazy val skewed = (
    (1 to 500).map(i => ("hot", s"v${i % 97}")) ++
      (1 to 20).map(i => (s"k$i", s"v$i"))
    ).toDF("key", "value")

  test("countDistinctSalted equals exact countDistinct for every key") {
    val expected = skewed.groupBy("key")
      .agg(count_distinct(col("value")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (nSalts <- Seq(1, 4, 13)) {
      val got = Skew.countDistinctSalted(skewed, Seq("key"), col("value"), nSalts)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"nSalts=$nSalts")
    }
  }

  test("saltedJoin equals the plain inner join (multiset of matches)") {
    val big = skewed
    val small = ((1 to 3).map(i => ("hot", i)) ++ Seq(("k1", 99), ("absent", 7)))
      .toDF("key", "payload")
    val expected = big.join(small, Seq("key"))
      .groupBy("key", "value", "payload").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val got = Skew.saltedJoin(big, small, Seq("key"), nSalts = 5)
      .groupBy("key", "value", "payload").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("dedupExactStream keeps the first-seen row per content hash") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingOps.dedupExactStream(
      input.toDF.toDF("doc_id", "ts", "text"), "ts", "text", "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "beta"), (3L, ts(2), "alpha"))
      q.processAllAvailable()
      input.addData((4L, ts(3), "beta"), (5L, ts(4), "gamma"))
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      // duplicates 3 ("alpha") and 4 ("beta") dropped across batches
      assert(kept == Set(1L, 2L, 5L))
    } finally q.stop()
  }
}
