package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotProduct, JaccardSim, L2Norm, MinHashSig, WordShingles}

/** SparkSessionExtensions registering the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_dot(a, b) …")` works and
  * external SQL tooling sees them in the catalog.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardSizeGuardRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_l2norm(array)")
        L2Norm(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles(text, nWords)")
        WordShingles(children.head, GraftExtensions.intLit(children(1), "nWords"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash(shingles, numHashes)")
        MinHashSig(children.head, GraftExtensions.intLit(children(1), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard"),
      new ExpressionInfo(classOf[JaccardSim].getName, "graft_jaccard"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaccard(arrayA, arrayB)")
        JaccardSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.JaroWinkler].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaro_winkler(a, b)")
        org.apache.spark.sql.graft.JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_beta_inv"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.BetaInv].getName,
        "graft_beta_inv"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_beta_inv(p, a, b)")
        org.apache.spark.sql.graft.BetaInv(children.head, children(1), children(2))
      }))
  }
}

object GraftExtensions {
  /** Install the optimizer rules on an already-built session (the
    * `injectOptimizerRule` path requires configuring extensions at
    * session build; live sessions use `experimental.extraOptimizations`). */
  def installOptimizations(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(JaccardSizeGuardRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JaccardSizeGuardRule

  /** Visible-to-shim variant of [[intLit]]. */
  def intLitPublic(e: Expression, name: String): Int = intLit(e, name)

  /** Extract a literal int argument (e.g. `graft_minhash(sh, 32)`). */
  private[functions] def intLit(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal integer")
    e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(s"$name must be an int, got $other")
    }
  }
}
