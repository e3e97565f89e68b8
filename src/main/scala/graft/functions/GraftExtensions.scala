package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotProduct, L2Norm}

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
  }
}
