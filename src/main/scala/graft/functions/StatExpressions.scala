package org.apache.spark.sql.graft

import org.apache.commons.math3.distribution.BetaDistribution
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
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
