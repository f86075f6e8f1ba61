package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass SimHash64 expression and the relational
  * explode + 64-vote-column aggregate implement ONE signature definition;
  * the q67/q101/q105 DuckDB oracles replay the relational definition, so
  * native ≡ relational here extends the oracles' reach to the kernel —
  * the CdcChunksParitySpec/DHashParitySpec contract for the third native
  * text kernel. Edge semantics pinned directly: empty string and
  * consecutive-space empty tokens vote like the relational split does.
  */
class SimHashParitySpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  test("native SimHash64 equals the relational vote aggregate on the " +
    "corpus") {
    val docs = Tables.ld(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val native = docs.select(col("doc_id"),
      graft.functions.TextExprs.simhash64(col("text")).as("sim64"))
    val relational = graft.queries.TextOps.simhash64Relational(docs)
      .withColumnRenamed("sim64", "sim64_rel")
    val diff = native.join(relational, Seq("doc_id"))
      .filter(col("sim64") =!= col("sim64_rel"))
    assert(diff.isEmpty, "native and relational simhash diverge")
    assert(native.count() === 500)
  }

  test("empty tokens (empty string, double spaces) vote identically to " +
    "the relational split semantics") {
    import spark.implicits._
    val docs = Seq((0L, ""), (1L, "a"), (2L, "a  b"), (3L, " leading"),
      (4L, "trailing "), (5L, "a a a b"))
      .toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      graft.functions.TextExprs.simhash64(col("text")).as("sim64"))
    val relational = graft.queries.TextOps.simhash64Relational(docs)
      .withColumnRenamed("sim64", "sim64_rel")
    val diff = native.join(relational, Seq("doc_id"))
      .filter(col("sim64") =!= col("sim64_rel"))
    assert(diff.isEmpty, "edge-token semantics diverge")
  }
}
