package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftMemRegistry

/** Pins the V2 WRITE protocol of the memory sink (GraftMemSource write
  * half): (1) append and truncate-overwrite semantics through
  * DataFrameWriter, (2) deterministic partition-ordered commit, and
  * (3) the ABORT arm — an injected task failure must leave the table
  * exactly as it was (all-or-nothing), with the abort recorded. q321's
  * oracle covers result equality for the happy path; these tests pin
  * the commit protocol itself. */
class DsV2WriteSpec extends AnyFunSuite with SparkFixture {

  private def sink(name: String) = {
    import spark.implicits._
    val schema = Seq((1L, "x")).toDF("k", "v").schema
    GraftMemRegistry.register(name, schema, Nil)
    schema
  }

  private def readBack(name: String): Seq[(Long, String)] =
    spark.read.format("graft.sources.GraftMemSource")
      .option("table", name).load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("append accumulates; overwrite swaps the whole table " +
    "(SupportsTruncate negotiated by mode(Overwrite))") {
    import spark.implicits._
    sink("w_modes")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(2)
      .write.format("graft.sources.GraftMemSource")
      .option("table", "w_modes").mode("append").save()
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft.sources.GraftMemSource")
      .option("table", "w_modes").mode("append").save()
    assert(readBack("w_modes") == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    Seq((9L, "z")).toDF("k", "v")
      .write.format("graft.sources.GraftMemSource")
      .option("table", "w_modes").mode("overwrite").save()
    assert(readBack("w_modes") == Seq((9L, "z")))
  }

  test("commit is partition-ordered: committed row order is a pure " +
    "function of the data layout, not of task finish order") {
    import spark.implicits._
    sink("w_order")
    // 4 partitions, each holding its own key — rows must land 0,1,2,3
    spark.range(0, 4, 1, 4).select(col("id").as("k"),
        concat(lit("p"), col("id")).as("v"))
      .write.format("graft.sources.GraftMemSource")
      .option("table", "w_order").mode("overwrite").save()
    val committed = GraftMemRegistry.rowsOf("w_order")
      .map(r => r.getLong(0))
    assert(committed == Seq(0L, 1L, 2L, 3L),
      s"partition order must be preserved, got $committed")
  }

  test("abort arm: an injected task failure leaves the table EXACTLY " +
    "as it was and records the abort (all-or-nothing commit)") {
    import spark.implicits._
    sink("w_abort")
    Seq((1L, "keep")).toDF("k", "v")
      .write.format("graft.sources.GraftMemSource")
      .option("table", "w_abort").mode("append").save()
    val before = readBack("w_abort")
    val abortsBefore = GraftMemRegistry.abortCount("w_abort")
    val failing = spark.range(0, 8, 1, 4).select(col("id").as("k"),
      lit("doomed").as("v"))
    intercept[Exception] {
      failing.write.format("graft.sources.GraftMemSource")
        .option("table", "w_abort").option("failPartition", "2")
        .mode("append").save()
    }
    assert(readBack("w_abort") == before,
      "a failed job must not leak partial rows into the table")
    assert(GraftMemRegistry.abortCount("w_abort") == abortsBefore + 1,
      "BatchWrite.abort must have been called once")
  }
}
