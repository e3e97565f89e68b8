package org.apache.spark.sql.graft

import org.apache.commons.math3.distribution.BetaDistribution
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native statistical expressions.
  *
  * `graft_beta_inv(p, a, b)` — the regularized incomplete-beta inverse
  * (scipy `beta.ppf(p, a, b)`), the primitive behind Clopper–Pearson
  * binomial CIs (ref: clopper_pearson_ci, func_aux/func_test.py:179-193).
  * Backed by commons-math3's `BetaDistribution` (already on Spark's
  * classpath — MLlib depends on it), so the quantile runs on executors
  * and a per-group CI (thousands of groups → thousands of quantiles) is
  * one distributed select instead of a driver loop.
  *
  * Domain follows scipy: NaN outside `0 ≤ p ≤ 1`, `a > 0`, `b > 0`
  * (commons-math would throw; a data-parallel select must not die on one
  * bad row). `p = 0 → 0`, `p = 1 → 1` exactly.
  */
object StatShim {
  def betaInvCol(p: Column, a: Column, b: Column): Column =
    ExpressionUtils.column(BetaInv(
      ExpressionUtils.expression(p),
      ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
  def poissonWeightsCol(key: Column, seed: Long, b: Int): Column =
    ExpressionUtils.column(PoissonWeights(ExpressionUtils.expression(key), seed, b))
  def cdfIndexCol(u: Column, los: Array[Long]): Column =
    ExpressionUtils.column(CdfIndex(ExpressionUtils.expression(u), los))
}

object BetaInvImpl {
  /** Static entry point shared by eval and generated code. The `null`
    * RandomGenerator skips commons-math's per-instance Well19937c
    * construction — quantiles never sample. */
  def compute(p: Double, a: Double, b: Double): Double =
    if (p.isNaN || a.isNaN || b.isNaN || p < 0.0 || p > 1.0 || a <= 0.0 || b <= 0.0) Double.NaN
    else if (p == 0.0) 0.0
    else if (p == 1.0) 1.0
    else new BetaDistribution(null, a, b).inverseCumulativeProbability(p)
}

object PoissonWeightsImpl {
  import graft.ops.IntHash
  private val Cum: Array[Double] = graft.ops.Stats.PoissonCum.toArray

  /** The b inverse-CDF Poisson(1) draws for one row — bit-identical to
    * the Column form `poissonWeight(seededUniform(seed, key, lit(r)))`
    * (the affine chain's key step is computed ONCE and reused across
    * replicates; the chain is associative-free left-to-right so the
    * shared prefix is exact, and every intermediate is non-negative so
    * plain `%` equals `pmod`). */
  def compute(key: Long, seed: Long, b: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val M = IntHash.M
    val km = ((key % M) + M) % M
    val sm = ((seed % M) + M) % M
    val h1 = (IntHash.A * sm + IntHash.B + km) % M
    val out = new Array[Int](b)
    var r = 0
    while (r < b) {
      val h2 = (IntHash.A * h1 + IntHash.B + r) % M
      val u = IntHash.scrambleLong(h2).toDouble / M.toDouble
      var k = 0
      while (k < Cum.length && u >= Cum(k)) k += 1
      out(r) = if (k < Cum.length) k else 9
      r += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Array of `b` deterministic Poisson(1) bootstrap weights for a row
  * key — the hot inner loop of [[graft.ops.Stats.bootstrapMeanCI]] as
  * ONE native expression. The declarative form (b independent
  * hash-chain + CASE-ladder column trees) generated methods past the
  * JIT's HugeMethodLimit at b = 50, running the whole aggregation
  * de-optimized; this is a tight compiled loop with the key's chain
  * step hoisted out of the replicate loop. */
case class PoissonWeights(child: Expression, seed: Long, b: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(b >= 1, "b >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_poisson_weights"

  override def nullSafeEval(key: Any): Any =
    PoissonWeightsImpl.compute(key.asInstanceOf[Long], seed, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = org.apache.spark.sql.graft.PoissonWeightsImpl.compute($k, ${seed}L, $b);")

  override protected def withNewChildInternal(newChild: Expression): PoissonWeights =
    copy(child = newChild)
}

case class BetaInv(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_beta_inv"

  override def nullSafeEval(p: Any, a: Any, b: Any): Any =
    BetaInvImpl.compute(p.asInstanceOf[Double], a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.BetaInvImpl.compute($p, $a, $b);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BetaInv =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdfIndexImpl {
  /** 1-based bucket index for a draw u against the ascending exclusive
    * lower bounds `los`: index = #{lo ≤ u} (the upper-bound binary
    * search). Identical by definition to the declarative
    * `size(filter(los, lo -> lo <= u))` linear scan — O(log V) instead
    * of O(V) per draw. */
  def find(u: Long, los: Array[Long]): Int = {
    var a = 0
    var b = los.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (los(m) <= u) a = m + 1 else b = m
    }
    a
  }
}

/** Binary-search CDF bucket lookup — the scale path of
  * [[graft.ops.Stats.negativeSample]]'s tempered-unigram draw: the
  * bounded CDF rides the plan as a reference object (one copy per
  * executor, not per row), and each draw costs log₂ V compares inside
  * whole-stage codegen. The declarative higher-order-function form
  * walks the interpreted lambda evaluator once per CDF entry per draw —
  * bit-identical results, ~V/log V times the work (measured: V = 4096
  * made 500M draws crawl; this expression sustains them). */
case class CdfIndex(child: Expression, los: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(los.nonEmpty, "CdfIndex: empty CDF")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_cdf_index"

  override def nullSafeEval(u: Any): Any =
    CdfIndexImpl.find(u.asInstanceOf[Long], los)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdfLos", los, "long[]")
    nullSafeCodeGen(ctx, ev, u =>
      s"${ev.value} = org.apache.spark.sql.graft.CdfIndexImpl.find($u, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdfIndex =
    copy(child = newChild)
}
