package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pq, Similarity}

/** Product-quantization laws: exactness at zero quantization error,
  * training improves reconstruction, trained-ADC recall vs brute force,
  * and determinism across partitioning. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters in 8 dims, 30 points each: cluster c has
  // base coordinate 10·c with small deterministic jitter.
  private lazy val clustered = (0 until 90).map { i =>
    val c = i % 3
    (i.toLong, (0 until 8).map(d => 10.0 * c + 0.1 * ((i * 7 + d * 3) % 5)).toArray)
  }.toDF("id", "v")

  test("ADC distance is EXACT when corpus rows are codebook rows") {
    // corpus = the 4 lowest ids -> every row encodes to itself with zero
    // quantization error, so adc == true squared L2 distance.
    val corpus = clustered.where(col("id") < 4)
    val cb = Pq.sampleCodebooks(corpus, "id", "v", m = 2, k = 4)
    val encoded = Pq.encode(corpus, "v", cb).select("id", "codes")
    val queries = corpus.select(col("id").as("qid"), col("v").as("qv"))
    val adc = Pq.adcTopK(encoded, queries, "id", "qid", "qv", cb, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = corpus.select(col("id").as("qid"), col("v").as("qv"))
      .crossJoin(corpus)
      .withColumn("d2", Similarity.dot(col("qv"), col("qv"))
        - lit(2.0) * Similarity.dot(col("qv"), col("v"))
        + Similarity.dot(col("v"), col("v")))
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id")) -> r.getAs[Double]("d2")).toMap
    for ((k2, v) <- adc) assert(approx(v, exact(k2), 1e-9), s"pair $k2")
  }

  test("self-distance is zero for codebook rows, positive otherwise") {
    val cb = Pq.sampleCodebooks(clustered, "id", "v", m = 2, k = 4)
    val encoded = Pq.encode(clustered, "v", cb).select("id", "codes")
    val queries = clustered.where(col("id") === 50)
      .select(col("id").as("qid"), col("v").as("qv"))
    val self = Pq.adcTopK(encoded, queries, "id", "qid", "qv", cb, k = 90)
      .where(col("id") === 50).collect()(0).getDouble(2)
    assert(self > 0.0) // id 50 is not a codebook row -> quantization error
  }

  test("trained codebooks reduce mean quantization error vs sampled") {
    def meanErr(cb: Pq.Codebooks): Double = {
      val enc = Pq.encode(clustered, "v", cb)
      // reconstruction error = sum of per-subspace ‖sub − c(code)‖²
      val err = (0 until cb.m).map { s =>
        val subv = slice(col("v"), s * cb.subDim + 1, cb.subDim)
        val decoded = element_at(
          typedLit(cb.books(s).zipWithIndex.map { case (c, j) => j -> c.toList }.toMap),
          element_at(col("codes"), s + 1))
        Similarity.dot(subv, subv) - lit(2.0) * Similarity.dot(subv, decoded) +
          Similarity.dot(decoded, decoded)
      }.reduce(_ + _)
      enc.agg(avg(err)).collect()(0).getDouble(0)
    }
    val sampled = Pq.sampleCodebooks(clustered, "id", "v", m = 2, k = 4)
    val trained = Pq.trainCodebooks(clustered, "id", "v", m = 2, k = 4, iters = 8)
    assert(meanErr(trained) < meanErr(sampled),
      "Lloyd iterations should reduce reconstruction error on clustered data")
  }

  test("trained-ADC top-1 finds the query's own cluster") {
    val cb = Pq.trainCodebooks(clustered, "id", "v", m = 2, k = 4, iters = 8)
    val encoded = Pq.encode(clustered, "v", cb).select("id", "codes")
    val queries = clustered.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val top = Pq.adcTopK(encoded, queries, "id", "qid", "qv", cb, k = 10)
    // every returned neighbor of query q is from q's cluster (id % 3)
    val rows = top.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) % 3 == r.getLong(0) % 3,
        s"neighbor ${r.getLong(1)} not in cluster of query ${r.getLong(0)}")
    }
  }

  test("adcTopK refuses a query side past maxQueries (loud, not a driver OOM)") {
    val cb = Pq.sampleCodebooks(clustered, "id", "v", m = 2, k = 4)
    val encoded = Pq.encode(clustered, "v", cb).select("id", "codes")
    val queries = clustered.select(col("id").as("qid"), col("v").as("qv"))
    val e = intercept[IllegalArgumentException] {
      Pq.adcTopK(encoded, queries, "id", "qid", "qv", cb, k = 3, maxQueries = 5)
    }
    assert(e.getMessage.contains("maxQueries"))
    // a deliberately raised cap admits the batch
    val ok = Pq.adcTopK(encoded, queries, "id", "qid", "qv", cb, k = 1, maxQueries = 90)
    assert(ok.count() == 90)
  }

  test("encode is deterministic across partitioning") {
    val cb = Pq.trainCodebooks(clustered, "id", "v", m = 4, k = 3, iters = 4)
    def codes(parts: Int) =
      Pq.encode(clustered.repartition(parts), "v", cb)
        .select("id", "codes").collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(1) == codes(7))
  }

  test("ivfPqTopK with nProbe = nCells equals the full ADC scan") {
    val cb = Pq.sampleCodebooks(clustered, "id", "v", m = 2, k = 4)
    val queries = clustered.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val full = Pq.adcTopK(
        Pq.encode(clustered, "v", cb).select("id", "codes"),
        queries, "id", "qid", "qv", cb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val probed = Similarity.ivfPqTopK(clustered, queries, "id", "v", "qid", "qv",
        k = 5, nCells = 6, nProbe = 6, cb = cb, centroidsByHash = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(probed == full)
  }

  test("ivfPqTopK recall: probing finds each query's own cluster members") {
    val cb = Pq.trainCodebooks(clustered, "id", "v", m = 2, k = 3, iters = 4)
    val queries = clustered.where(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val got = Similarity.ivfPqTopK(clustered, queries, "id", "v", "qid", "qv",
        k = 10, nCells = 6, nProbe = 3, cb = cb, centroidsByHash = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // query i belongs to cluster i%3; its top-10 by ADC must be dominated
    // by same-cluster ids (id % 3 == qid % 3)
    val sameCluster = got.count { case (q, id) => id % 3 == q % 3 }
    assert(sameCluster >= 27, s"same-cluster hits: $sameCluster/30")
  }
}
