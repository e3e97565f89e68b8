package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (training-data extension —
  * SURVEY §2.12): dimensionality reduction / whitening for the ANN and
  * semantic-dedup paths.
  *
  * Scale shape — the only thing that ever touches the corpus is two
  * narrow aggregations (mean pass, then centered moment pass): each
  * partition folds its rows into ONE flat buffer of `1 + d + d(d+1)/2`
  * doubles (count, centered sums, upper-triangular centered product sums)
  * via a native TypedImperativeAggregate — zero row fan-out, and the
  * shuffle carries one buffer per partition, never rows.
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

  /** Exploded parity baseline of [[centeredMoments]]: posexplode of the
    * `1 + d + d(d+1)/2` payload (count, centered sums, upper-triangular
    * centered products in row-major (i, j≥i) order) → pos-keyed groupBy
    * with map-side combine. Same numbers as the zero-fan-out aggregate
    * (bit-equal on a single partition where both reduce to one
    * sequential row-order fold — PcaSpec); kept only as the spec
    * baseline, the aggregate is the production path. */
  private[graft] def centeredMomentsExploded(df: DataFrame, vec: Column,
      d: Int, mean: Array[Double]): Array[Double] = {
    val mu = typedLit(mean.toSeq)
    val v = transform(vec, (x, i) => x.cast("double") - element_at(mu, i + 1))
    val tri = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + 1, lit(d) - i), xj => xi * xj)))
    val nTri = d * (d + 1) / 2
    val flat = new Array[Double](1 + d + nTri)
    df.select(posexplode(concat(array(lit(1.0)), v, tri)).as(Seq("pos", "x")))
      .groupBy("pos").agg(sum("x").as("s"))
      .collect().foreach(r => flat(r.getInt(0)) = r.getDouble(1))
    flat
  }

  /** One corpus scan → flat centered moments (count, Σc_i, Σc_i·c_j upper
    * triangle, c = x − mean) via the zero-fan-out
    * [[org.apache.spark.sql.graft.CenteredMomentsAgg]] — no generated
    * rows, one `1+d+d(d+1)/2`-double buffer per partition. */
  private[graft] def centeredMoments(df: DataFrame, vec: Column, d: Int,
      mean: Array[Double]): Array[Double] = {
    val v = transform(vec, x => x.cast("double"))
    df.agg(org.apache.spark.sql.graft.MomentShim
        .centeredMomentsCol(v, d, mean.toSeq, withTri = true).as("m"))
      .head().getSeq[Double](0).toArray
  }

  /** Mean-estimation first pass: (n, per-dim means). Same aggregate with
    * the triangle disabled — a `1 + d`-double buffer. */
  private[graft] def meanPass(df: DataFrame, vec: Column, d: Int): (Double, Array[Double]) = {
    val v = transform(vec, x => x.cast("double"))
    val flat = df.agg(org.apache.spark.sql.graft.MomentShim
        .centeredMomentsCol(v, d, Seq.fill(d)(0.0), withTri = false).as("m"))
      .head().getSeq[Double](0).toArray
    val n = flat(0)
    (n, Array.tabulate(d)(i => flat(1 + i) / n))
  }

  /** Two-pass centered moments: (n, mean, centered sums, centered
    * triangular product sums). The covariance face
    * `(P_ij − S_i·S_j/n)/(n−1)` over CENTERED values is algebraically the
    * sample covariance (the S_i ≈ 0 correction keeps it exact for any
    * centering point) but free of the raw-moment cancellation, so 6-dp
    * rounding no longer flips on summation order between engines. */
  private def moments(df: DataFrame, vec: Column, d: Int): (Double, Array[Double], Array[Double], Array[Double]) = {
    val (n, mean) = meanPass(df, vec, d)
    require(n > 1, s"need at least 2 rows to fit moments, got $n")
    val flat = centeredMoments(df, vec, d, mean)
    (n, mean, flat.slice(1, 1 + d), flat.drop(1 + d))
  }

  private def triIndex(d: Int, i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Sample covariance (ddof=1) of the upper triangle as a DataFrame
    * (i, j ≥ i, cov) — the oracle-checkable face of the moment pass.
    * Two-pass centered: both engines compute
    * (Σc_i·c_j − Σc_i·Σc_j/n)/(n−1) on c = x − mean, so the ~1e-13
    * summation-order wobble lands on values of covariance magnitude (not
    * raw-moment magnitude) and survives 6-dp rounding. */
  def covarianceUpper(df: DataFrame, vec: Column, d: Int): DataFrame = {
    checkDim(d)
    val spark = df.sparkSession
    import spark.implicits._
    val (n, _, s, p) = moments(df, vec, d)
    val rows = for { i <- 0 until d; j <- i until d }
      yield (i, j, (p(triIndex(d, i, j)) - s(i) * s(j) / n) / (n - 1))
    rows.toDF("i", "j", "cov")
  }

  private def snap9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Mean pass snapped to 9 dp: the centering point of the decimal-exact
    * face. The snap makes refits agree bit-for-bit (the raw mean's
    * ~1e-15 summation-order wobble is 5 orders below the 0.5e-9 grid),
    * so a literal-replay twin generated by one fit matches a query run
    * that refits. */
  private[graft] def covarianceMean(df: DataFrame, vec: Column, d: Int): (Double, Array[Double]) = {
    val (n, mean) = meanPass(df, vec, d)
    require(n > 1, s"need at least 2 rows to fit a covariance, got $n")
    (n, mean.map(snap9))
  }

  /** Decimal-EXACT sample-covariance face (i, j ≥ i, cov) — the oracle
    * gate for the moment pass. The double-sum face ([[covarianceUpper]])
    * carries ~1e-13 summation-order wobble, and at least one of the 2080
    * sf0.01 cells sits exactly on a 0.5e-6 rounding boundary, so the
    * 6-dp face flipped between engines two rounds running. Here the
    * centered values are snapped to 9 dp and summed as DECIMAL(25,18) —
    * exact integer arithmetic, ORDER-INDEPENDENT: the sums are identical
    * across partitionings, runs, and engines, so both engines round the
    * same double. (The 9-dp input snap perturbs the covariance by
    * < 1e-9·σ√2 — invisible at 6 dp.) The one residual cross-engine
    * hazard is SIGNED ZERO: a cell whose covariance rounds to zero from
    * below is -0.0 under DuckDB's round but +0.0 under Spark's
    * BigDecimal-based round — the twin normalizes with `+ 0.0` (see
    * [[covarianceUpperExactSql]]; this single cell was the r8–r10 red).
    *
    * Scale shape: ONE zero-fan-out pass — [[org.apache.spark.sql.graft.ExactMomentsAgg]]
    * folds each row into a flat 128-bit fixed-point buffer per
    * partition (no generated rows; the shuffle carries one buffer per
    * partition), exactly like the double moment aggregate but in
    * integer lanes. Production PCA fits keep the double aggregate
    * ([[centeredMoments]]); this face cross-checks it (PcaSpec pins
    * agreement to 1e-9, and bit-equality against the exploded decimal
    * baseline [[covarianceUpperExactExploded]]). */
  def covarianceUpperExact(df: DataFrame, vec: Column, d: Int): DataFrame = {
    checkDim(d)
    val spark = df.sparkSession
    import spark.implicits._
    val (n, mean) = covarianceMean(df, vec, d)
    // one zero-fan-out pass: 128-bit fixed-point integer sums
    // (ExactMomentsAgg) — bit-identical to the exploded decimal
    // baseline below (integer sums are order- and mechanism-free), but
    // without generating N × (d + d(d+1)/2) boxed decimal rows (the
    // exploded form was the most expensive query of the r9 bench)
    val v = transform(vec, x => x.cast("double"))
    val flat = df.agg(org.apache.spark.sql.graft.ExactMomentsAgg
        .col(v, d, mean.toSeq).as("m"))
      .head().getSeq[java.math.BigDecimal](0)
    val s = Array.tabulate(d)(i => flat(1 + i).doubleValue)
    // identical IEEE sequence as the DuckDB twin's face:
    // (P − S_i·S_j/n) / (n − 1) on the exact sums cast to double
    val rows = for { i <- 0 until d; j <- i until d } yield {
      val p = flat(1 + d + triIndex(d, i, j)).doubleValue
      (i, j, (p - s(i) * s(j) / n) / (n - 1))
    }
    rows.toDF("i", "j", "cov")
  }

  /** Exploded-decimal parity baseline of [[covarianceUpperExact]]'s
    * moment pass: posexplode of the per-row decimal payload → pos-keyed
    * decimal sums. Same exact numbers as the 128-bit aggregate (spec-
    * pinned bit equality); kept only as the independent cross-check. */
  private[graft] def covarianceUpperExactExploded(df: DataFrame, vec: Column,
      d: Int): DataFrame = {
    checkDim(d)
    val spark = df.sparkSession
    import spark.implicits._
    val (n, mean) = covarianceMean(df, vec, d)
    val mu = typedLit(mean.toSeq)
    val dec = org.apache.spark.sql.types.DecimalType(25, 18)
    val c = transform(vec, (x, i) =>
      round(x.cast("double") - element_at(mu, i + 1), 9)
        .cast(org.apache.spark.sql.types.DecimalType(14, 9)))
    val cUp = transform(c, x => x.cast(dec))
    val tri = flatten(transform(c, (xi, i) =>
      transform(slice(c, i + 1, lit(d) - i), xj => (xi * xj).cast(dec))))
    val sums = df.select(posexplode(concat(cUp, tri)).as(Seq("pos", "x")))
      .groupBy("pos").agg(sum("x").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val s = Array.tabulate(d)(i => sums(i).doubleValue)
    val rows = for { i <- 0 until d; j <- i until d } yield {
      val p = sums(d + triIndex(d, i, j)).doubleValue
      (i, j, (p - s(i) * s(j) / n) / (n - 1))
    }
    rows.toDF("i", "j", "cov")
  }

  /** DuckDB twin of [[covarianceUpperExact]] (literal-replay of the
    * 9-dp-snapped mean and the row count; the decimal sums and the face
    * are genuinely recomputed cross-engine). `vecExprSql` must yield a
    * float/double list; `fromSql` the table, `idSql` the row key. */
  def covarianceUpperExactSql(vecExprSql: String, fromSql: String,
      idSql: String, n: Double, mean: Array[Double]): String = {
    val mu = mean.map(java.lang.Double.toString).mkString("[", ", ", "]")
    val nLit = java.lang.Double.toString(n)
    s"""WITH ex AS (
       |  SELECT $idSql AS rid, CAST(generate_subscripts(v, 1) - 1 AS INT) AS i,
       |         CAST(unnest(v) AS DOUBLE) AS x
       |  FROM (SELECT $idSql, $vecExprSql AS v FROM $fromSql)),
       |cx AS (
       |  SELECT rid, i,
       |    CAST(round(x - ($mu)[i + 1], 9) AS DECIMAL(14,9)) AS c
       |  FROM ex),
       |s AS (SELECT i, sum(c) AS sv FROM cx GROUP BY 1),
       |p AS (SELECT a.i AS i, b.i AS j, sum(a.c * b.c) AS sp
       |      FROM cx a JOIN cx b ON a.rid = b.rid AND b.i >= a.i
       |      GROUP BY 1, 2)
       |SELECT p.i, p.j,
       |  -- + 0.0 normalizes NEGATIVE ZERO: DuckDB's round() preserves the
       |  -- sign of zero (round(-1e-9, 6) = -0.0) while Spark's round goes
       |  -- through BigDecimal.setScale, which has no signed zero (always
       |  -- +0.0). The r8/r9/r10 hash red was exactly ONE such cell — the
       |  -- sf0.01 fixture's (5,9) covariance, -2.33e-8, rounds to -0.0
       |  -- here and +0.0 in Spark: numerically equal, bitwise different,
       |  -- hash mismatch. IEEE -0.0 + 0.0 = +0.0 with no other effect.
       |  round((CAST(sp AS DOUBLE) - CAST(sa.sv AS DOUBLE) * CAST(sb.sv AS DOUBLE) / $nLit) / ($nLit - 1.0), 6) + 0.0 AS cov
       |FROM p JOIN s sa ON p.i = sa.i JOIN s sb ON p.j = sb.i
       |ORDER BY 1, 2""".stripMargin
  }

  /** Fit PCA: two corpus scans (mean pass + centered moment pass) +
    * driver Jacobi on the 9-dp-rounded covariance. */
  def pcaFit(df: DataFrame, vec: Column, d: Int, nComponents: Int): PcaModel = {
    checkDim(d)
    require(nComponents > 0 && nComponents <= d,
      s"nComponents must be in [1, $d], got $nComponents")
    val (n, mean, s, p) = moments(df, vec, d)
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
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
    array(model.components.toIndexedSeq.map { w =>
      val b = w.indices.map(i => w(i) * model.mean(i)).sum
      graft.functions.VectorFunctions.dot(v, lit(w)) - lit(b)
    }: _*)
  }

  /** DuckDB twin of [[pcaProject]] for a FITTED model (the
    * `dsirScorer`/`bootstrapMeanCISql` literal-replay pattern): the
    * components and centering constants are interpolated as literals, and
    * the dot product is a left-to-right `list_dot_product` over the same
    * double-cast inputs — bit-identical fold order, so even 4-dp rounding
    * of the projections is stable across engines. `vecSql` must be a
    * DuckDB expression yielding `DOUBLE[]`. Doubles are rendered with
    * shortest round-trip repr (`Double.toString`), which DuckDB parses
    * back to the identical bits. */
  def pcaProjectSql(vecSql: String, model: PcaModel): Seq[String] =
    model.components.map { w =>
      val b = w.indices.map(i => w(i) * model.mean(i)).sum
      val lits = w.mkString("[", ", ", "]")
      s"(list_dot_product($vecSql, $lits) - ($b))"
    }.toSeq

  /** PCA WHITENING (Su et al. 2021, "Whitening Sentence Representations
    * for Better Semantics and Faster Retrieval" — the standard post-hoc
    * fix for anisotropic embedding spaces): the [[pcaProject]] output
    * scaled per-component to unit variance,
    * z_k = (⟨x, w_k⟩ − ⟨mean, w_k⟩) / √(λ_k + eps).
    * Decorrelates the axes AND equalizes their scales, which repairs
    * cosine retrieval in collapsed embedding spaces. Same
    * pure-projection shape as [[pcaProject]] (the scales are driver
    * doubles baked into the plan); streams as-is. */
  def pcaWhiten(vec: Column, model: PcaModel, eps: Double = 1e-9): Column = {
    val v = transform(vec, x => x.cast("double"))
    array(model.components.toIndexedSeq.zipWithIndex.map { case (w, k) =>
      val b = w.indices.map(i => w(i) * model.mean(i)).sum
      val s = 1.0 / math.sqrt(model.eigenvalues(k) + eps)
      (graft.functions.VectorFunctions.dot(v, lit(w)) - lit(b)) * lit(s)
    }: _*)
  }

  /** DuckDB twin of [[pcaWhiten]] (same literal-replay contract as
    * [[pcaProjectSql]]; the per-axis scale is one extra literal
    * multiplication, mirrored in the same position). */
  def pcaWhitenSql(vecSql: String, model: PcaModel,
      eps: Double = 1e-9): Seq[String] =
    model.components.toIndexedSeq.zipWithIndex.map { case (w, k) =>
      val b = w.indices.map(i => w(i) * model.mean(i)).sum
      val s = 1.0 / math.sqrt(model.eigenvalues(k) + eps)
      val lits = w.mkString("[", ", ", "]")
      s"((list_dot_product($vecSql, $lits) - ($b)) * ($s))"
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
