package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN — the memory-bound scale path that
  * complements [[Similarity.ivfTopK]]'s compute-bound one.
  *
  * A D-dim vector is split into `m` subvectors of `D/m` dims; each
  * subspace has a `k`-entry codebook; a vector is stored as `m` small
  * codes. Search is asymmetric-distance (ADC): per query, an m×k table of
  * partial squared distances is precomputed ONCE (driver-side — the query
  * set is the small broadcast side by construction), and each corpus row
  * costs m table LOOKUPS instead of D multiplications.
  *
  * Why this matters at 100 TB: the scan reads the `codes` column — m
  * ints ≈ m bytes after parquet dictionary+byte-packing — instead of a
  * D·4-byte float array (64-dim float = 256 B → 4 B at m=4: a 64×
  * I/O + cache-footprint reduction), and the per-row distance is a few
  * codegen'd map lookups. Encoding is a narrow projection (literal-argmin
  * per subspace, same JIT-budget caveat as the IVF literal path —
  * m·k·subDim = k·D literal terms total); training runs driver-side on a
  * deterministic hash sample, the standard PQ practice (codebooks are a
  * model, not a per-row computation).
  *
  * Everything is deterministic: sampled codebooks are the k lowest-id
  * rows' subvectors (SQL-reproducible — the `ann_pq_adc` oracle replays
  * encode+ADC bit-for-bit in DuckDB); trained codebooks start from the k
  * lowest-HASH sample rows and run plain Lloyd iterations, so results are
  * stable across partitioning, retries, and cluster size.
  */
object Pq {

  /** `books(s)(code)` = centroid of subspace `s` (length `subDim`). */
  final case class Codebooks(m: Int, subDim: Int,
      books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    def k: Int = books.head.length
    require(books.length == m && books.forall(_.forall(_.length == subDim)),
      "codebook shape mismatch")
  }

  private def sqnorm(v: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }; s
  }
  private def ldot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def sub(v: Seq[Double], s: Int, subDim: Int): IndexedSeq[Double] =
    v.slice(s * subDim, (s + 1) * subDim).toIndexedSeq

  /** SQL-reproducible codebooks: subspace `s`'s codebook = subvectors of
    * the `k` lowest-id corpus rows (code = rank in id order). A real
    * deployment uses [[trainCodebooks]]; this form exists so the encode +
    * ADC pipeline has an exact cross-engine oracle. */
  def sampleCodebooks(corpus: DataFrame, id: String, vec: String,
      m: Int, k: Int): Codebooks = {
    val rows = corpus.select(col(id), col(vec).cast("array<double>"))
      .orderBy(col(id)).limit(k).collect()
    val dim = rows.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    Codebooks(m, subDim, (0 until m).map(s =>
      rows.toIndexedSeq.map(r => sub(r.getSeq[Double](1), s, subDim))))
  }

  /** Train per-subspace codebooks with Lloyd's algorithm on a
    * deterministic hash sample (≤ `sampleN` rows collected to the driver
    * — PQ codebooks are a tiny model trained on a sample, per standard
    * practice; encoding and search stay fully distributed). Init = the k
    * lowest-hash sample rows; empty cells keep their previous centroid. */
  def trainCodebooks(corpus: DataFrame, id: String, vec: String,
      m: Int, k: Int, iters: Int, sampleN: Int = 10000): Codebooks = {
    val sample = corpus
      .select(col(id), col(vec).cast("array<double>"), xxhash64(col(id)).as("__h"))
      .orderBy("__h").limit(sampleN)
      .collect().map(_.getSeq[Double](1).toIndexedSeq)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = (0 until m).map { s =>
      val pts = sample.map(v => sub(v, s, subDim))
      var cents = pts.take(k).toIndexedSeq
      for (_ <- 0 until iters) {
        val assign = pts.map { p =>
          var best = 0; var bestD = Double.MaxValue
          for (j <- cents.indices) {
            val d = sqnorm(cents(j)) - 2.0 * ldot(p, cents(j))
            if (d < bestD) { bestD = d; best = j }
          }
          best
        }
        cents = cents.indices.map { j =>
          val members = pts.indices.filter(assign(_) == j)
          if (members.isEmpty) cents(j)
          else {
            val acc = Array.fill(subDim)(0.0)
            members.foreach { i => val p = pts(i)
              var d = 0; while (d < subDim) { acc(d) += p(d); d += 1 } }
            IndexedSeq.tabulate(subDim)(acc(_) / members.length)
          }
        }
      }
      cents
    }
    Codebooks(m, subDim, books)
  }

  /** Nearest-code argmin for one subspace as a narrow literal expression:
    * `least()` over (‖c‖² − 2·sub·c, code) structs — ‖sub‖² is constant
    * within the argmin and dropped; ties break to the LOWEST code. */
  private def codeExpr(vec: Column, cb: Codebooks, s: Int): Column = {
    val subv = slice(vec, s * cb.subDim + 1, cb.subDim)
    least(cb.books(s).zipWithIndex.map { case (c, j) =>
      struct((lit(sqnorm(c)) - lit(2.0) * Similarity.dot(subv, typedLit(c))).as("d"),
        lit(j).as("code"))
    }: _*).getField("code")
  }

  /** Encode: adds `codes` (array<int>, length m). Narrow — no shuffle, no
    * join; k·D literal terms total (see the IVF JIT note for the budget). */
  def encode(df: DataFrame, vec: String, cb: Codebooks): DataFrame =
    df.withColumn("codes",
      array((0 until cb.m).map(s => codeExpr(col(vec).cast("array<double>"), cb, s)): _*))

  /** ADC top-k: approximate squared L2 distance per (query, corpus row)
    * via m table lookups on the precomputed per-query distance table,
    * then a per-query top-k window. `queries` is collected driver-side
    * (documented-tiny, like the IVF centroid set).
    *
    * `adc = Σ_s (‖q_s‖² − 2·q_s·c(code_s) + ‖c(code_s)‖²)` — the full
    * approximated ‖q − decode(codes)‖². */
  def adcTopK(encoded: DataFrame, queries: DataFrame, id: String,
      qid: String, qvec: String, cb: Codebooks, k: Int,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    val (qdf, lut) = queryArtifacts(encoded.sparkSession, queries, qid, qvec, cb, maxQueries)
    rankAdc(encoded.crossJoin(broadcast(qdf)), lut, id, qid, cb, k)
  }

  /** ADC top-k restricted to IVF-probed cells: `encoded` must carry a
    * `cell_id` column ([[graft.ops.Similarity.ivfPqTopK]] supplies it),
    * `probes` is the tiny (qid, cell_id) table of each query's probe
    * cells. The corpus-side scan is the broadcast probe join — only the
    * probed cells' rows reach the distance lookups, so the per-query cost
    * is O(N·nProbe/nCells) code rows, the FAISS IVFADC shape. */
  def adcTopKProbed(encoded: DataFrame, queries: DataFrame, probes: DataFrame,
      id: String, qid: String, qvec: String, cb: Codebooks, k: Int,
      maxQueries: Int = DefaultMaxQueries): DataFrame = {
    val (qdf, lut) = queryArtifacts(encoded.sparkSession, queries, qid, qvec, cb, maxQueries)
    // broadcast BOTH sides of the tiny probe⋈query-index join: qdf comes
    // from a statsless 1-partition parallelize, so without the hint the
    // planner emits a SortMergeJoin[qid,__qid] that shuffles the decoded
    // candidate set by qid at corpus scale (both sides are ≤ maxQueries·
    // nProbe rows by construction — PlanSpec pins the broadcast)
    val probeQ = probes.join(broadcast(qdf), probes(qid) === qdf("__qid"))
      .select(col("__qid"), col("__qi"), col("cell_id"))
    rankAdc(encoded.join(broadcast(probeQ), "cell_id"), lut, id, qid, cb, k)
  }

  /** The query side is collected to the driver and its distance table
    * ships as a literal (nQ·m·k doubles) — a BATCH of queries, not a
    * data-sized table. The cap makes a misuse (joining the corpus to
    * itself as "queries") fail loudly at the collect instead of as a
    * silent driver OOM; raise it deliberately via the `maxQueries`
    * parameter when a larger batch is intended. */
  val DefaultMaxQueries: Int = 4096

  /** Driver-side query artifacts: the (qid → dense query index) mapping
    * DataFrame and the flat per-(query, subspace, code) distance-table
    * literal (key = (qIdx·m + s)·k + code). `queries` is collected
    * driver-side (documented-tiny, like the IVF centroid set). */
  private def queryArtifacts(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, qid: String, qvec: String,
      cb: Codebooks, maxQueries: Int): (DataFrame, Column) = {
    // limit-probe BEFORE the collect: one row past the cap proves the
    // violation without ever materializing an unbounded query side
    val qrows = queries.select(col(qid), col(qvec).cast("array<double>"))
      .limit(maxQueries + 1).collect()
    require(qrows.length <= maxQueries,
      s"PQ query side exceeds maxQueries=$maxQueries rows; ADC collects queries " +
        s"to the driver and ships an nQ*m*k-entry distance table as a literal — " +
        s"pass a deliberate maxQueries to raise the cap for a larger batch")
    val dtable: Map[Int, Double] = qrows.zipWithIndex.flatMap { case (r, qi) =>
      val qv = r.getSeq[Double](1)
      for (s <- 0 until cb.m; c <- 0 until cb.k) yield {
        val qs = sub(qv, s, cb.subDim); val cent = cb.books(s)(c)
        ((qi * cb.m + s) * cb.k + c) ->
          (sqnorm(qs) - 2.0 * ldot(qs, cent) + sqnorm(cent))
      }
    }.toMap
    val qdf = spark.createDataFrame(
      spark.sparkContext.parallelize(qrows.zipWithIndex.map { case (r, qi) =>
        org.apache.spark.sql.Row(r.get(0), qi) }.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__qid", queries.schema(qid).dataType),
        org.apache.spark.sql.types.StructField("__qi",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    (qdf, typedLit(dtable))
  }

  /** Shared ADC ranking: m distance-table lookups per candidate row +
    * per-query top-k window. */
  private def rankAdc(candidates: DataFrame, lut: Column, id: String,
      qid: String, cb: Codebooks, k: Int): DataFrame = {
    val adc = (0 until cb.m).map { s =>
      element_at(lut, (col("__qi") * cb.m + s) * cb.k + element_at(col("codes"), s + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy("__qid").orderBy(col("adc").asc, col(id).asc)
    candidates
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("__qid").as(qid), col(id), col("adc"), col("rank"))
  }
}
