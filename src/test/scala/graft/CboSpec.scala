package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer seam: table/column statistics feeding join
  * planning — the piece of the 100 TB story the plan pins can't show
  * with raw parquet (file-size-only estimation never shrinks under a
  * filter). With CBO on and ANALYZE'd column stats, a selectively
  * filtered dimension is ESTIMATED small and the join flips to
  * broadcast; without stats the same plan stays a shuffle join. This is
  * the production mechanism that turns nightly ANALYZE runs into free
  * broadcast decisions across every downstream query.
  */
class CboSpec extends AnyFunSuite with SparkFixture {

  test("ANALYZE column stats flip the filtered-dim join to broadcast; " +
    "without stats the same query shuffles") {
    val confs = Seq(
      "spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k)).toMap
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    try {
      Tables.ld(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").saveAsTable("cbo_fact")
      Tables.ld(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").saveAsTable("cbo_dim")
      // threshold below the dim's ON-DISK size: file-size estimation
      // (no stats) must NOT broadcast even with the filter applied
      val dimBytes = spark.sql("DESCRIBE EXTENDED cbo_dim")
        .filter(col("col_name") === "Statistics").collect()
      val q =
        """SELECT f.l_orderkey, d.o_orderpriority
           FROM cbo_fact f JOIN cbo_dim d ON f.l_orderkey = d.o_orderkey
           WHERE d.o_orderkey < 50"""
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "2048")
      spark.conf.set("spark.sql.cbo.enabled", "true")

      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"without column stats the filter must not shrink the estimate " +
          s"below 2KB (dim stats: ${dimBytes.mkString}):\n$before")

      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS " +
        "FOR COLUMNS o_orderkey, o_orderpriority")
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"with column stats the <50-key filter estimate must broadcast:\n" +
          after)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_fact")
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      saved.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
    }
  }
}
