package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.{JaccardSim, WordShingles}
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: prepend a cheap size-ratio guard to exact-Jaccard
  * threshold filters.
  *
  * For DISTINCT arrays (sets), `J(A,B) = |A∩B|/|A∪B| ≤ min/max of the
  * set sizes`, so `J ≥ t` implies `least(|A|,|B|) ≥ t·greatest(|A|,|B|)`.
  * The guard is two O(1) array-length reads and short-circuits the
  * O(|A|+|B|) hash-set intersection on size-mismatched candidate pairs —
  * the common case after an LSH bucket join with skewed document lengths.
  *
  * Soundness requires set semantics, so the rewrite fires ONLY when both
  * Jaccard inputs are provably duplicate-free: [[WordShingles]] output
  * (it dedups internally) or an explicit `array_distinct`. Column
  * references to precomputed shingles are NOT rewritten (distinctness
  * can't be proven through a reference) — the DataFrame-API operators in
  * [[graft.ops.Dedup]] apply the equivalent guard by construction; this
  * rule serves the SQL surface (`WHERE graft_jaccard(graft_shingles(…),
  * graft_shingles(…)) >= t`).
  *
  * Idempotent: a filter whose condition already contains the guard it
  * would insert is left alone (the optimizer runs rules to fixpoint).
  * Inject via [[GraftExtensions]] (`injectOptimizerRule`) or on a live
  * session with [[GraftExtensions.installOptimizations]].
  */
object JaccardSizeGuardRule extends Rule[LogicalPlan] {

  private def provablyDistinct(e: Expression): Boolean = e match {
    // Only the set-semantic form: with distinct=false (MinHashShim
    // .shinglesAllCol) the output carries duplicates and the size-ratio
    // bound is unsound (A=[x,x,x,x], B=[x] has J=1.0 but fails the guard).
    case w: WordShingles if w.distinct => true
    case ArrayDistinct(_) => true
    case _ => false
  }

  private def guardFor(a: Expression, b: Expression, t: Expression): Expression =
    GreaterThanOrEqual(
      Cast(Least(Seq(Size(a), Size(b))), DoubleType),
      Multiply(t, Cast(Greatest(Seq(Size(a), Size(b))), DoubleType)))

  /** Idempotence marker: once the guard is inserted the condition
    * contains `Size` over the Jaccard inputs, and no optimizer rule
    * removes a Size over a non-foldable child — whereas matching the
    * exact inserted shape breaks as soon as the optimizer simplifies it
    * (endless re-insertion under the fixpoint loop). */
  private def alreadyGuarded(cond: Expression, a: Expression, b: Expression): Boolean =
    cond.exists {
      case s: Size => s.child.semanticEquals(a) || s.child.semanticEquals(b)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      // transformUp: a top-down pass would re-descend into the inserted
      // And(guard, geq) and wrap geq again, unboundedly
      val rewritten = cond.transformUp {
        case geq @ GreaterThanOrEqual(JaccardSim(a, b), t @ Literal(_, DoubleType))
            if provablyDistinct(a) && provablyDistinct(b) &&
              !alreadyGuarded(cond, a, b) =>
          And(guardFor(a, b, t), geq)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
