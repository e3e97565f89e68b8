package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.ops.Similarity

/** Round-13 optimization parity pins: fused/restructured operators must
  * produce the values of the multi-pass forms they replaced.
  *  - prefixDots / prefixNorms are BIT-identical to slice+dot / slice+norm
  *    (the fused matryoshka ranking depends on this: any ulp drift could
  *    flip a tie and change top-k membership)
  *  - matryoshkaRecall (one corpus pass) == the |dims|+1-pass reference
  */
class R13FusionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)), j =>
        sin(col("id") * j * 0.7 + j) * cos(col("id") * 0.3)).as("v"))

  test("prefixDots/prefixNorms: bit-identical to slice+dot / slice+norm at every cut") {
    val cuts = Seq(3, 7, 16, 64, 100)
    val df = vecs(50, 64).as("a").join(vecs(50, 64).as("b"),
      col("a.vec_id") =!= col("b.vec_id"))
    val cols = cuts.zipWithIndex.flatMap { case (d, i) =>
      Seq(
        (element_at(VectorFunctions.prefixDots(col("a.v"), col("b.v"), cuts), i + 1) ===
          VectorFunctions.dot(slice(col("a.v"), 1, d), slice(col("b.v"), 1, d)))
          .as(s"dot_$d"),
        (element_at(VectorFunctions.prefixNorms(col("a.v"), cuts), i + 1) ===
          VectorFunctions.l2norm(slice(col("a.v"), 1, d))).as(s"norm_$d"))
    }
    val rows = df.select(cols: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (0 until r.length).foreach(i => assert(r.getBoolean(i), s"col $i of $r"))
    }
  }

  test("fitSq8 native buffer == the 2·dim min/max expression forest, bit-exact") {
    import graft.ops.ScalarQuant
    val dim = 16
    // include a constant dim (scale 0) and mild variety
    val df = spark.range(200).select(
      transform(sequence(lit(1), lit(dim)), j =>
        when(j === 3, lit(2.5)).otherwise(
          sin(col("id") * j * 0.31) + cos(col("id") * 0.17) * j)).as("v"))
    val m = ScalarQuant.fitSq8(df, "v", dim)
    // reference: the pre-r13 expression forest, verbatim
    val n = df
      .withColumn("__n", graft.functions.VectorFunctions.l2norm(col("v")))
      .select(transform(col("v"), x => x / col("__n")).as("__vn"))
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col("__vn"), i + 1)).as(s"mn_$i"),
      max(element_at(col("__vn"), i + 1)).as(s"mx_$i")))
    val r = n.agg(aggs.head, aggs.tail: _*).head()
    (0 until dim).foreach { i =>
      assert(m.mins(i) == r.getAs[Double](s"mn_$i"), s"min dim $i")
      val sc = (r.getAs[Double](s"mx_$i") - r.getAs[Double](s"mn_$i")) / 255.0
      assert(m.scales(i) == sc, s"scale dim $i")
    }
  }

  /** The pre-r13 multi-pass matryoshkaRecall, verbatim. */
  private def matryoshkaRef(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, qid: String, qvec: String, k: Int,
      dims: Seq[Int]): DataFrame = {
    val nQ = queries.count()
    val full = Similarity.bruteForceTopK(corpus, queries, id, vec, qid, qvec, k)
      .select(col(qid), col(id)).cache()
    val rows = dims.map { d =>
      val tc = corpus.withColumn(vec, slice(col(vec), 1, d))
      val tq = queries.withColumn(qvec, slice(col(qvec), 1, d))
      Similarity.bruteForceTopK(tc, tq, id, vec, qid, qvec, k)
        .select(col(qid), col(id))
        .join(full, Seq(qid, id), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d).as("dim"), col("n_hits"), lit(nQ).as("n_queries"),
          round(col("n_hits").cast("double") / (k * nQ), 6).as("recall"))
    }
    rows.reduce(_.unionAll(_))
  }

  test("matryoshkaRecall: fused one-pass == |dims|+1-pass reference, exact") {
    val corpus = vecs(120, 32)
    val queries = corpus.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val dims = Seq(2, 5, 11, 32)
    val got = Similarity.matryoshkaRecall(corpus, queries, "vec_id", "v",
        "qid", "qv", k = 7, dims = dims)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ref = matryoshkaRef(corpus, queries, "vec_id", "v",
        "qid", "qv", k = 7, dims = dims)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == ref.toSeq)
    // sanity: the largest budget recovers the full ranking exactly
    assert(got.last == ((32, 35L, 5L, 1.0)))
    // not all budgets saturate (otherwise the fixture proves nothing)
    assert(got.head._4 < 1.0)
  }
}
