package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions seam (graft.plans.GraftExtensions) — a fresh
  * session is required because extensions apply at session construction;
  * the suite clears the process-wide active/default sessions around it so
  * getOrCreate doesn't hand back the shared fixture session.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("injectOptimizerRule fires: upper(upper(x)) collapses in " +
    "optimizedPlan; injected graft_dot is SQL-callable") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      // parquet source (not a local relation) so ConvertToLocalRelation
      // can't erase the projection before our rule is observable
      val df = s.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .selectExpr("upper(upper(c_name)) AS u")
      val before = df.queryExecution.analyzed.toString
      val after = df.queryExecution.optimizedPlan.toString
      assert("(?i)upper\\(".r.findAllIn(before).size == 2, before)
      assert("(?i)upper\\(".r.findAllIn(after).size == 1,
        s"rule did not fire:\n$after")
      // semantics unchanged
      val v = df.limit(1).collect()(0).getString(0)
      assert(v == v.toUpperCase)
      // the injected scalar functions work without registerSql
      val d = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0)
      assert(d == 11.0)
      // graft_bands: planes = identity 2x2, one band of 2 rows —
      // v=(1,-1) signs (+,-) → bit 0 only → band key 1
      val b = s.sql(
        """SELECT graft_bands(array(1.0d, -1.0d),
                              array(array(1.0d, 0.0d), array(0.0d, 1.0d)),
                              2) AS b""")
        .head().getSeq[Int](0)
      assert(b == Seq(1), s"got $b")
      // graft_cdc_chunks: a 4-char string yields exactly itself
      val c = s.sql("SELECT graft_cdc_chunks('abcd') AS c")
        .head().getSeq[String](0)
      assert(c == Seq("abcd"), s"got $c")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
