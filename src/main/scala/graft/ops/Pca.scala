package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (training-data extension —
  * SURVEY §2.12): dimensionality reduction / whitening for the ANN and
  * semantic-dedup paths.
  *
  * Scale shape — the only thing that ever touches the corpus is ONE
  * narrow aggregation: each row emits `1 + d + d(d+1)/2` (count, per-dim
  * sums, upper-triangular product sums) via a nested-transform payload,
  * posexplode, and a pos-keyed groupBy with map-side combine — so the
  * shuffle carries ≤ `1+d+d(d+1)/2` partials per partition, never rows.
  * The collected moment vector (d ≤ 512 ⇒ ≤ ~131k doubles) feeds a
  * deterministic driver-side cyclic Jacobi eigensolver (O(d³) on ≤512²
  * matrices — trivially driver-sized; covariances are rounded to 9 dp
  * first so the model is bit-stable across partitionings). Projection is
  * a stateless literal-matrix fold (`graft_dot` per component — no join,
  * no broadcast variable), so it applies unchanged to streaming ingest.
  */
object Pca {

  /** Fitted model: `mean` (length d), `components` (nComponents × d rows,
    * orthonormal, eigenvalue-descending, sign-fixed so each component's
    * largest-|x| coordinate is positive), `eigenvalues` (all d, desc). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def explainedVarianceRatio: Array[Double] = {
      val tot = eigenvalues.sum
      components.indices.map(k => eigenvalues(k) / tot).toArray
    }
  }

  private def checkDim(d: Int): Unit =
    require(d > 0 && d <= 512, s"dim must be in [1, 512], got $d " +
      "(the d(d+1)/2 moment vector and the O(d^3) driver eigensolve are " +
      "sized for embedding-width matrices, not feature explosions)")

  /** One corpus scan → (pos, s) moment frame: pos 0 = row count,
    * pos 1..d = per-dim sums, pos d+1.. = upper-triangular Σ x_i·x_j in
    * row-major (i, j≥i) order. */
  private def momentsFrame(df: DataFrame, vec: Column, d: Int): DataFrame = {
    val v = transform(vec, x => x.cast("double"))
    val tri = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + 1, lit(d) - i), xj => xi * xj)))
    df.select(posexplode(concat(array(lit(1.0)), v, tri)).as(Seq("pos", "x")))
      .groupBy("pos").agg(sum("x").as("s"))
  }

  /** Collected moments: (n, sums(d), triangular product sums). */
  private def moments(df: DataFrame, vec: Column, d: Int): (Double, Array[Double], Array[Double]) = {
    val nTri = d * (d + 1) / 2
    val flat = new Array[Double](1 + d + nTri)
    momentsFrame(df, vec, d).collect().foreach { r =>
      flat(r.getInt(0)) = r.getDouble(1)
    }
    (flat(0), flat.slice(1, 1 + d), flat.slice(1 + d, 1 + d + nTri))
  }

  private def triIndex(d: Int, i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Sample covariance (ddof=1) of the upper triangle as a DataFrame
    * (i, j ≥ i, cov) — the oracle-checkable face of the moment pass.
    * The arithmetic (S_ij − s_i·s_j/n)/(n−1) textually matches the DuckDB
    * twin so the engines differ only in summation order. */
  def covarianceUpper(df: DataFrame, vec: Column, d: Int): DataFrame = {
    checkDim(d)
    val spark = df.sparkSession
    import spark.implicits._
    val (n, s, p) = moments(df, vec, d)
    require(n > 1, s"need at least 2 rows to fit a covariance, got $n")
    val rows = for { i <- 0 until d; j <- i until d }
      yield (i, j, (p(triIndex(d, i, j)) - s(i) * s(j) / n) / (n - 1))
    rows.toDF("i", "j", "cov")
  }

  /** Fit PCA: one corpus scan (the moment pass) + driver Jacobi on the
    * 9-dp-rounded covariance. */
  def pcaFit(df: DataFrame, vec: Column, d: Int, nComponents: Int): PcaModel = {
    checkDim(d)
    require(nComponents > 0 && nComponents <= d,
      s"nComponents must be in [1, $d], got $nComponents")
    val (n, s, p) = moments(df, vec, d)
    require(n > 1, s"need at least 2 rows to fit PCA, got $n")
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      r9((p(triIndex(d, a, b)) - s(a) * s(b) / n) / (n - 1))
    }
    val (eig, vecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(k => (-eig(k), k))
    val components = order.take(nComponents).map { k =>
      val c = Array.tabulate(d)(i => vecs(i)(k))
      // sign convention: largest-|x| coordinate (first on ties) positive
      val m = c.indices.maxBy(i => (math.abs(c(i)), -i))
      if (c(m) < 0) c.map(x => -x) else c
    }.toArray
    PcaModel(mean, components, order.map(eig).toArray)
  }

  /** Project a vector column onto the fitted components: per component,
    * one `graft_dot` against a literal row + a precomputed centering
    * constant — y_k = ⟨x, w_k⟩ − ⟨mean, w_k⟩. Pure projection (codegen'd,
    * no join/state), returns array<double> of length nComponents. */
  def pcaProject(vec: Column, model: PcaModel): Column = {
    val v = transform(vec, x => x.cast("double"))
    array(model.components.map { w =>
      val b = w.indices.map(i => w(i) * model.mean(i)).sum
      graft.functions.VectorFunctions.dot(v, lit(w)) - lit(b)
    }: _*)
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix. Returns (eigenvalues, eigenvector matrix with eigenvectors
    * in COLUMNS, same index order as the eigenvalues — unsorted). Throws
    * if the off-diagonal mass hasn't converged after `maxSweeps` (loud
    * failure over silently wrong axes, cf. connectedComponents). */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    val scale = math.max(1e-300, math.sqrt(
      (for (i <- 0 until d) yield a(i)(i) * a(i)(i)).sum) + off())
    var sweep = 0
    while (off() > 1e-13 * scale) {
      require(sweep < maxSweeps,
        s"Jacobi failed to converge after $maxSweeps sweeps (off=${off()})")
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val apq = a(p)(q)
        if (math.abs(apq) > 1e-300 * scale) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
          val t =
            if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
            else 1.0 / (theta - math.sqrt(theta * theta + 1))
          val c = 1.0 / math.sqrt(t * t + 1)
          val sn = t * c
          val app = a(p)(p); val aqq = a(q)(q)
          a(p)(p) = app - t * apq
          a(q)(q) = aqq + t * apq
          a(p)(q) = 0.0; a(q)(p) = 0.0
          for (k <- 0 until d) if (k != p && k != q) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - sn * akq; a(p)(k) = a(k)(p)
            a(k)(q) = sn * akp + c * akq; a(q)(k) = a(k)(q)
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - sn * vkq
            v(k)(q) = sn * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
