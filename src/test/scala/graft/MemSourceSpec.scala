package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThan, StringContains}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftMemRegistry

/** Pins the DataSource V2 memory source's PUSHDOWN CONTRACT — the
  * Spark-native re-expression of the reference's `TableSource.scan
  * (projection)` seam (`datasource/mod.rs:20-28`) and its
  * projection-honouring MemTable (`memory.rs:31-41`). Results equality
  * is covered by q303's DuckDB oracle; these tests pin the mechanism:
  * the pruned schema the scan actually saw, and the pushed/residual
  * split for filters the reader can/cannot run.
  */
class MemSourceSpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  private def registered(name: String) = {
    val nation = Tables.ld(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    GraftMemRegistry.register(name, nation.schema, nation.collect().toSeq)
    (nation,
      spark.read.format("graft.sources.GraftMemSource")
        .option("table", name).load())
  }

  test("V2 mem scan returns exactly the parquet rows (all columns, " +
    "multi-partition read path)") {
    val (parquet, mem) = registered("ms_all")
    val a = parquet.orderBy("n_nationkey").collect().toSeq
    val b = mem.orderBy("n_nationkey").collect().toSeq
    assert(a == b)
    assert(mem.rdd.getNumPartitions > 1,
      "the memory table must exercise the split read path")
  }

  test("column pruning reaches the scan: a single-column projection " +
    "prunes the read schema to that column (scan(projection) semantics)") {
    val (_, mem) = registered("ms_prune")
    mem.select("n_name").collect()
    val pruned = GraftMemRegistry.lastPrunedSchema("ms_prune")
    assert(pruned.map(_.fieldNames.toSeq).contains(Seq("n_name")), pruned)
  }

  test("partial filter pushdown: comparisons are pushed and evaluated " +
    "in the reader; unsupported predicates come back as residual and " +
    "Spark evaluates them above the scan") {
    val (parquet, mem) = registered("ms_filter")
    val got = mem
      .filter(col("n_regionkey") > 1L && col("n_name").contains("A"))
      .orderBy("n_nationkey").collect().toSeq
    val want = parquet
      .filter(col("n_regionkey") > 1L && col("n_name").contains("A"))
      .orderBy("n_nationkey").collect().toSeq
    assert(got == want)
    val (pushed, residual) = GraftMemRegistry.lastFilters("ms_filter")
    assert(pushed.exists {
      case GreaterThan("n_regionkey", v) => v == 1L || v == 1
      case _ => false
    }, s"comparison must be pushed, got $pushed")
    assert(residual.exists(_.isInstanceOf[StringContains]),
      s"contains() must come back residual, got $residual")
  }

  test("complete aggregate pushdown: with pushAgg on, group-by + " +
    "count/min is computed in the source, recorded in telemetry, and " +
    "the physical plan has NO Aggregate node") {
    val nation = Tables.ld(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    GraftMemRegistry.register("ms_agg", nation.schema,
      nation.collect().toSeq)
    val df = spark.read.format("graft.sources.GraftMemSource")
      .option("table", "ms_agg").option("pushAgg", "true").load()
      .filter(col("n_regionkey") > 1L)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min("n_name").as("first_name"))
      .orderBy("n_regionkey")
    val want = nation.filter(col("n_regionkey") > 1L)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n"), min("n_name").as("first_name"))
      .orderBy("n_regionkey").collect().toSeq
    assert(df.collect().toSeq == want)
    assert(GraftMemRegistry.lastAgg("ms_agg").isDefined,
      "the aggregation must reach the scan builder")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Aggregate"),
      s"complete pushdown must leave no Aggregate node:\n$p")
  }

  test("pushAgg off (default) leaves aggregation to Spark — q303's " +
    "path keeps its partial+final aggregate") {
    val nation = Tables.ld(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    GraftMemRegistry.register("ms_noagg", nation.schema,
      nation.collect().toSeq)
    val df = spark.read.format("graft.sources.GraftMemSource")
      .option("table", "ms_noagg").load()
      .groupBy("n_regionkey").agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Aggregate"),
      "without the option the source must not hijack the aggregate")
  }

  test("pushed filter actually prunes the rows the reader emits (the " +
    "scan is not pretending)") {
    val (_, mem) = registered("ms_prunerows")
    val n = mem.filter(col("n_regionkey") > 3L).count()
    // region > 3 = exactly one region's nations in TPC-H (region 4)
    assert(n == 5, s"expected the 5 region-4 nations, got $n")
  }
}
