package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ops.LinearModel

/** FastText-style hashed-bow logistic classifier: training dynamics,
  * scorer parity with the training-path join form, partitioning
  * determinism, and the stream==batch shipping contract. */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val pos = (1 to 20).map(i => (i.toLong, s"good great fine doc$i", 1))
    val neg = (21 to 40).map(i => (i.toLong, s"bad awful junk doc$i", 0))
    (pos ++ neg).toDF("id", "text", "y")
  }

  test("training separates a planted signal and log-loss decreases with epochs") {
    val df = fixture
    val m1 = LinearModel.trainTextClassifier(df, "id", col("text"), col("y"),
      numBuckets = 256, epochs = 1, lr = 2.0)
    val m12 = LinearModel.trainTextClassifier(df, "id", col("text"), col("y"),
      numBuckets = 256, epochs = 12, lr = 2.0)
    val l1 = LinearModel.logLoss(df, col("text"), col("y"), m1)
    val l12 = LinearModel.logLoss(df, col("text"), col("y"), m12)
    assert(l12 < l1, s"log-loss should fall: 1-epoch $l1 vs 12-epoch $l12")
    val scored = df.select(col("y"),
      LinearModel.scorer(m12)(col("text")).as("p")).collect()
    val posMin = scored.filter(_.getInt(0) == 1).map(_.getDouble(1)).min
    val negMax = scored.filter(_.getInt(0) == 0).map(_.getDouble(1)).max
    assert(posMin > negMax,
      s"classes should separate: min(pos)=$posMin max(neg)=$negMax")
  }

  test("scorer column == training-path join scoring; empty text scores sigmoid(bias)") {
    val df = fixture
    val m = LinearModel.trainTextClassifier(df, "id", col("text"), col("y"),
      numBuckets = 128, epochs = 3, lr = 1.5)
    // join form: features x model weights, the shape training itself uses
    val wDf = m.weights.toSeq.toDF("__b", "__w")
    val joinScore = LinearModel.hashedFeatures(df, "id", col("text"), 128)
      .join(wDf, Seq("__b"))
      .groupBy("id").agg(sum(col("__x") * col("__w")).as("dot"))
      .select(col("id"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(m.bias) + col("dot"))))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val litScore = df.select(col("id"),
        LinearModel.scorer(m)(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    joinScore.foreach { case (id, p) =>
      assert(approx(litScore(id), p, 1e-9), s"doc $id: $p vs ${litScore(id)}")
    }
    val empty = Seq((99L, "")).toDF("id", "text")
      .select(LinearModel.scorer(m)(col("text"))).collect()(0).getDouble(0)
    assert(approx(empty, 1.0 / (1.0 + math.exp(-m.bias)), 1e-12))
  }

  test("fitted model is identical across input partitionings (9-dp rounding)") {
    val df = fixture
    val a = LinearModel.trainTextClassifier(df.repartition(7), "id",
      col("text"), col("y"), numBuckets = 64, epochs = 4, lr = 2.0)
    val b = LinearModel.trainTextClassifier(df.coalesce(1), "id",
      col("text"), col("y"), numBuckets = 64, epochs = 4, lr = 2.0)
    assert(a.bias == b.bias)
    assert(a.weights == b.weights)
  }

  test("scorer ships to a stream: stream == batch scores, unseen vocab finite") {
    implicit val sqlCtx = spark.sqlContext
    val df = fixture
    val m = LinearModel.trainTextClassifier(df, "id", col("text"), col("y"),
      numBuckets = 256, epochs = 6, lr = 2.0)
    val batch = df.select(col("id"),
        round(LinearModel.scorer(m)(col("text")), 9).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("id", "text")
      .select(col("id"), round(LinearModel.scorer(m)(col("text")), 9).as("p"))
    val q = scored.writeStream.format("memory").queryName("qc_stream")
      .outputMode("append").start()
    try {
      input.addData((1L, "good great fine doc1"), (21L, "bad awful junk doc21"),
        (99L, "zz qq ww never seen"))
      q.processAllAvailable()
      val got = spark.table("qc_stream").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got(1L) == batch(1L))
      assert(got(21L) == batch(21L))
      assert(!got(99L).isNaN && got(99L) > 0.0 && got(99L) < 1.0)
    } finally q.stop()
  }
}
