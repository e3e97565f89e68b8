package graft

import org.apache.spark.sql.SparkSession

/** graft_dot / graft_l2norm must be callable from SQL once
  * GraftExtensions is installed. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers SQL-callable native functions") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions())
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
          |       graft_l2norm(array(3.0D, 4.0D)) AS n""".stripMargin).head()
      assert(r.getDouble(0) == 32.0)
      assert(r.getDouble(1) == 5.0)
      // null propagation through the native expressions
      val n = s.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))").head()
      assert(n.isNullAt(0))
    } finally () // shared master session; do not stop
  }
}
