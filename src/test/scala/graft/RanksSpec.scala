package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Ranks

/** Direct contract checks of the staged two-stage global rank (r13) — the
  * helper now backs 8+ corpus-sized queries, so its equivalence to the
  * single-partition `row_number()` window it replaces is pinned here
  * against the window itself, not inferred from downstream oracles. The
  * null-bucket case is the r14 ADVICE finding: the pre-fix equi-join
  * silently DROPPED rows whose bucket evaluated to NULL while still
  * counting them in the offsets.
  */
class RanksSpec extends AnyFunSuite with SparkFixture {

  test("stagedGlobalRank == single-partition row_number on a total order") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "score")
    val got = Ranks.stagedGlobalRank(df, expr("score DIV 10"),
        Seq(col("score"), col("id")), "r", "n")
      .select("id", "r", "n")
    val want = df
      .withColumn("r", row_number().over(
        Window.orderBy(col("score"), col("id"))).cast("long"))
      .withColumn("n", lit(500L))
      .select("id", "r", "n")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "staged rank must be bit-identical to the global window")
  }

  test("NULL buckets: rows survive, offset 0 (NULLS FIRST), total counts them") {
    import spark.implicits._
    // bucket = the value itself; nulls in the bucket/order column
    val df = Seq[(Long, java.lang.Long)](
      (1L, 5L), (2L, null), (3L, 1L), (4L, null), (5L, 3L))
      .toDF("id", "v")
    val got = Ranks.stagedGlobalRank(df, col("v"),
        Seq(col("v"), col("id")), "r", "n")
      .select("id", "r", "n")
    // the single-partition form this must mirror: asc_nulls_first
    val want = df
      .withColumn("r", row_number().over(
        Window.orderBy(col("v").asc_nulls_first, col("id"))).cast("long"))
      .withColumn("n", lit(5L))
      .select("id", "r", "n")
    assert(got.count() == 5, "null-bucket rows must not be dropped")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "null buckets must rank NULLS FIRST with offset 0")
  }

  test("stagedNtileCounts == rank→ntile→groupBy (the form it shortcuts)") {
    import spark.implicits._
    // awkward sizes: n not divisible by t, buckets of uneven width, and a
    // group column interleaved within buckets
    val df = (1 to 377).map(i =>
        (i.toLong, (i * 7919 % 50).toLong, (i % 3).toLong))
      .toDF("id", "score", "g")
    for (t <- Seq(2, 3, 4, 7)) {
      val got = Ranks.stagedNtileCounts(df, expr("score DIV 5"),
        Seq(col("score"), col("id")), t, Seq("g"), "tile", "c")
      val want = Ranks.stagedGlobalRank(df, expr("score DIV 5"),
          Seq(col("score"), col("id")), "r", "n")
        .withColumn("tile", Ranks.ntileFromRank(col("r"), col("n"), t))
        .groupBy("g", "tile").agg(count(lit(1)).as("c"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntile counts must match the ranked form at t=$t")
    }
  }

  test("stagedNtileCounts: NULL buckets match the ranked form (NULLS FIRST)") {
    import spark.implicits._
    // nulls in the bucket/order source column — the range-frame offset
    // must place the null bucket first (offset 0), like stagedGlobalRank
    val df = Seq[(Long, java.lang.Long, Long)](
      (1L, 5L, 0L), (2L, null, 1L), (3L, 1L, 0L), (4L, null, 0L),
      (5L, 3L, 1L), (6L, 2L, 1L), (7L, null, 0L), (8L, 4L, 0L))
      .toDF("id", "v", "g")
    for (t <- Seq(2, 3)) {
      val got = Ranks.stagedNtileCounts(df, col("v"),
        Seq(col("v"), col("id")), t, Seq("g"), "tile", "c")
      val want = Ranks.stagedGlobalRank(df, col("v"),
          Seq(col("v"), col("id")), "r", "n")
        .withColumn("tile", Ranks.ntileFromRank(col("r"), col("n"), t))
        .groupBy("g", "tile").agg(count(lit(1)).as("c"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"null-bucket ntile counts must match the ranked form at t=$t")
    }
  }

  test("ntileFromRank == ANSI NTILE for every (n, t) in a sweep") {
    import spark.implicits._
    for (n <- Seq(1, 7, 12, 100); t <- Seq(2, 3, 4, 5)) {
      val df = (1 to n).map(_.toLong).toDF("id")
      val got = df.select(col("id"),
          Ranks.ntileFromRank(col("id"), lit(n.toLong), t).as("tile"))
      val want = df.select(col("id"),
        ntile(t).over(Window.orderBy("id")).cast("long").as("tile"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"ntileFromRank must match NTILE($t) at n=$n")
    }
  }
}
