package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass CdcChunks expression and the row-per-char relational
  * chunker implement ONE boundary definition (md5 of the 4-char window
  * ending at 1-based i ∈ [4, len), first hex digit '0'); q113's DuckDB
  * oracle replays the relational form, so native ≡ relational here extends
  * the oracle's reach to the native path. Edge semantics pinned directly:
  * short and empty strings, a boundary-free string, and interior-boundary
  * reconstruction.
  */
class CdcChunksParitySpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  test("native CdcChunks equals the relational chunker on the corpus " +
    "(multiset of (doc_id, chunk))") {
    val native = graft.queries.PipelineOps
      .cdcChunksNative(spark, sfDir)
    val relational = graft.queries.PipelineOps
      .cdcChunksRelational(spark, sfDir)
    assert(native.count() === relational.count())
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty,
      "chunk multisets differ between the native and relational chunkers")
  }

  test("chunks concatenate back to the document and respect the window " +
    "minimum") {
    val docs = Tables.ld(spark, sfDir, "documents").filter(col("n_chars") >= 4)
    val rebuilt = docs
      .select(col("doc_id"), col("text"),
        concat_ws("", graft.functions.TextExprs.cdcChunks(col("text")))
          .as("rebuilt"))
      .filter(col("text") =!= col("rebuilt"))
    assert(rebuilt.isEmpty, "chunk concatenation must reproduce the text")
  }

  test("non-BMP text (surrogate pairs): native equals relational and " +
    "chunks never split a code point") {
    import spark.implicits._
    // Emoji + supplementary CJK mixed into ASCII at varying offsets: every
    // emoji is 2 UTF-16 code units but 1 code point, so a code-unit walk
    // would shift all later boundaries and could emit half a surrogate
    // pair. n_chars = Spark length() = code points, matching the corpus.
    val texts = Seq(
      "a😀bcdefg hij🚀klm nop qrstu vwxyz",
      "🍕🍕🍕 pizza pizza pizza 🍕",
      "mixed 𣎴 supplementary 𣎴 cjk text here ok",
      "the quick brown fox 🦊 jumps over the lazy dog " * 3,
      "tail emoji after ascii run 😀😁😂")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val native = docs.filter(col("n_chars") >= 4)
      .select(col("doc_id"),
        explode(graft.functions.TextExprs.cdcChunks(col("text")))
          .as("chunk"))
    val relational = graft.queries.PipelineOps.cdcChunksRelationalFrom(docs)
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty,
      "non-BMP chunk multisets differ between native and relational")
    // a split surrogate pair would surface as an unpaired \ud800-\udfff
    // char at a chunk edge; rebuilding the text catches it end-to-end
    val rebuilt = docs
      .select(col("text"),
        concat_ws("", graft.functions.TextExprs.cdcChunks(col("text")))
          .as("rebuilt"))
      .filter(col("text") =!= col("rebuilt"))
    assert(rebuilt.isEmpty, "non-BMP chunk concatenation must reproduce text")
  }

  test("strings shorter than the 4-char window produce no chunks; a " +
    "4-char string produces exactly itself") {
    import spark.implicits._
    val out = Seq("", "abc", "abcd").toDF("text")
      .select(col("text"), graft.functions.TextExprs.cdcChunks(col("text"))
        .as("chunks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("") == Seq())
    assert(out("abc") == Seq())
    assert(out("abcd") == Seq("abcd"))
  }
}
