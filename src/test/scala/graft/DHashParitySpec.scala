package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass DHash64 expression and the declarative
  * transform()+bitwiseOR form implement ONE bit definition (8×8 grid,
  * row-wrapped horizontal gradient); q115's DuckDB oracle replays the
  * declarative definition, so native ≡ declarative here extends the
  * oracle's reach to the native kernel — the same contract
  * CdcChunksParitySpec pins for the chunker. Edge semantics pinned
  * directly: short frames read missing pixels as 0 on both paths.
  */
class DHashParitySpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  test("native DHash64 equals the declarative dHash on every corpus frame") {
    val frames = Tables.ld(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(9L))))
      .filter(col("frame_idx") <= floor((col("n_chars") - 1) / lit(64.0)))
      .selectExpr("doc_id",
        "substring(text, cast(frame_idx * 64 + 1 AS int), 64) AS frame")
      .filter(length(col("frame")) === 64)
    val both = graft.queries.MultimodalOps.dhashDeclarativeFrame(frames)
      .withColumn("dh_native",
        graft.functions.ImageExprs.dhash64(col("frame")))
    val diff = both.filter(col("dh_native") =!= col("dh_decl"))
    assert(diff.isEmpty, "native and declarative dHash diverge")
    assert(both.count() > 0, "parity must cover a non-empty frame set")
  }

  test("short frames: positions past the end read as pixel 0 on both paths") {
    import spark.implicits._
    val frames = Seq("", "a", "ab", "a" * 63, "z" + "a" * 63)
      .toDF("frame")
    val both = graft.queries.MultimodalOps.dhashDeclarativeFrame(frames)
      .withColumn("dh_native",
        graft.functions.ImageExprs.dhash64(col("frame")))
    val diff = both.filter(col("dh_native") =!= col("dh_decl"))
    assert(diff.isEmpty, "short-frame semantics diverge")
  }

  test("graft_dhash64 is SQL-callable once registered (the same builder " +
    "GraftExtensions injects)") {
    org.apache.spark.sql.graftx.ColumnBridge.registerFunction(
      spark, "graft_dhash64", graft.functions.ImageExprs.builder)
    val v = spark.sql("SELECT graft_dhash64('a' || repeat('b', 63)) AS h")
      .head().getLong(0)
    val expect = graft.functions.DHash64(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "a" + "b" * 63,
        org.apache.spark.sql.types.StringType)).compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("a" + "b" * 63))
    assert(v === expect)
  }
}
