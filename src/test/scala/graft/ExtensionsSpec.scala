package graft

import org.apache.spark.sql.SparkSessionExtensions

/** graft_dot / graft_l2norm must be callable from SQL. The extensions
  * class only applies to sessions created AFTER it's configured (one
  * SparkContext per test JVM), so the live-session path uses
  * VectorShim.register and the extensions class is exercised against a
  * fresh SparkSessionExtensions instance. */
class ExtensionsSpec extends SparkSpec {

  test("VectorShim.register makes the native functions SQL-callable on a live session") {
    org.apache.spark.sql.graft.VectorShim.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       graft_l2norm(array(3.0D, 4.0D)) AS n""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 5.0)
    // null propagation through the native expressions
    val n = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))").head()
    assert(n.isNullAt(0))
  }

  test("GraftExtensions injects both functions into a SparkSessionExtensions instance") {
    val ext = new SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // must not throw
  }
}
