package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.VectorShim

/** Public column API for the native vector expressions
  * (see org.apache.spark.sql.graft.VectorShim for the Catalyst side). */
object VectorFunctions {
  /** Σ a[i]·b[i] over the common prefix — whole-stage-codegen'd. */
  def dot(a: Column, b: Column): Column = VectorShim.dotCol(a, b)

  /** √(Σ a[i]²) — whole-stage-codegen'd. */
  def l2norm(a: Column): Column = VectorShim.l2normCol(a)

  /** Index of the nearest centroid by cosine (constant matrix, ascending-
    * cell-id order required — see NearestCentroid in VectorExpressions). */
  def nearestCentroid(vec: Column, vnorm: Column,
      cvecs: Array[Array[Double]], cnorms: Array[Double]): Column =
    VectorShim.nearestCentroidCol(vec, vnorm, cvecs, cnorms)

  /** Top-nProbe nearest-centroid indices, (distance asc, id asc) order
    * (same ascending-cell-id contract). */
  def nearestCells(vec: Column, vnorm: Column, cvecs: Array[Array[Double]],
      cnorms: Array[Double], nProbe: Int): Column =
    VectorShim.nearestCellsCol(vec, vnorm, cvecs, cnorms, nProbe)

  /** dot(a,b) / (|a|·|b|). For repeated use against many candidates,
    * precompute the norms once per side instead. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Σ a[i]·b[i] at each ascending cut — array<double>, one pass;
    * element c is bit-identical to `dot(slice(a,1,cut_c), slice(b,1,cut_c))`. */
  def prefixDots(a: Column, b: Column, cuts: Seq[Int]): Column =
    VectorShim.prefixDotsCol(a, b, cuts.toArray)

  /** √(Σ a[i]²) at each ascending cut — array<double>, one pass;
    * element c is bit-identical to `l2norm(slice(a,1,cut_c))`. */
  def prefixNorms(a: Column, cuts: Seq[Int]): Column =
    VectorShim.prefixNormsCol(a, cuts.toArray)

  /** Regularized incomplete-beta inverse (scipy `beta.ppf(p, a, b)`),
    * whole-stage-codegen'd; NaN outside the domain. The primitive behind
    * distributed Clopper–Pearson CIs (see
    * [[graft.ops.BinaryOperational]]). */
  def betaInv(p: Column, a: Column, b: Column): Column =
    org.apache.spark.sql.graft.StatShim.betaInvCol(p, a, b)
}
