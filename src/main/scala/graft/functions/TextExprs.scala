package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass content-defined chunker — the 100 TB form of q113's
  * boundary definition. The relational form (explode one row per char →
  * filter → window → join) moves |text| ROWS per document through the plan
  * just to find ~|text|/16 boundaries; this expression walks the string
  * once inside whole-stage codegen and returns the chunk array directly,
  * so the downstream plan starts at chunk granularity.
  *
  * Boundary definition is IDENTICAL to the relational/DuckDB one (pinned by
  * CdcChunksParitySpec): a chunk boundary falls after 1-based char position
  * i ∈ [4, len) when the md5 of the 4-char window ending at i has first hex
  * digit '0' (top 4 bits of byte 0 zero, p = 1/16); chunk k spans
  * (b_k, b_{k+1}] with b_0 = 0 and a final implicit boundary at len.
  * Windows are CHARACTER-based (then UTF-8 encoded for the digest), exactly
  * like `md5(substr(text, i-3, 4))` in both engines. Documents shorter than
  * the 4-char window yield an empty array (the relational form filters them
  * out before the explode).
  *
  * A production chunker would swap md5 for a Gear/Rabin rolling hash (md5
  * per window is the portability price the cross-engine oracle demands);
  * the expression boundary is the only thing that changes.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  def compute(u: UTF8String): ArrayData = {
    // Positions are CODE POINTS, not UTF-16 code units: the relational twin
    // and the DuckDB oracle window with substr(text, i-3, 4) over n_chars,
    // and both engines' substr counts code points — a UTF-16 walk would
    // shift every boundary after the first non-BMP char (emoji,
    // supplementary CJK) and could split a surrogate pair mid-chunk.
    // CdcChunksParitySpec pins native ≡ relational on a non-BMP corpus.
    val cps = u.toString.codePoints().toArray
    val len = cps.length
    if (len < 4) return new GenericArrayData(Array.empty[Any])
    val d = CdcChunks.digests.get()
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = 4
    while (i < len) { // 1-based window end i ∈ [4, len)
      d.reset()
      val h = d.digest(
        new String(cps, i - 4, 4).getBytes(StandardCharsets.UTF_8))
      if ((h(0) & 0xf0) == 0) bounds += i
      i += 1
    }
    bounds += len
    val out = new Array[Any](bounds.size - 1)
    var k = 0
    while (k < out.length) {
      out(k) = UTF8String.fromString(
        new String(cps, bounds(k), bounds(k + 1) - bounds(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { x =>
      val ref = ctx.addReferenceObj("graftCdc", this,
        classOf[CdcChunks].getName)
      s"${ev.value} = $ref.compute($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  private[functions] val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
}

/** Native one-pass 64-bit SimHash — the signature kernel behind the banded
  * near-dup family (q67/q105 directly; q101's edges and q117's pipeline
  * stage through them). The relational form explodes one row per TOKEN and
  * aggregates 64 vote columns per document — correct, oracle-replayable,
  * and expensive: the explode materializes the token stream into the
  * aggregate and every row updates 64 sum buffers. This expression walks
  * the document once inside whole-stage codegen, so the plan starts at
  * (doc_id, sim64) granularity with no Generate and no 64-column
  * aggregate.
  *
  * Definition is IDENTICAL to the relational/DuckDB one (pinned by
  * SimHashParitySpec): tokens = split(text, " ") KEEPING empties (Java
  * split limit -1, matching Spark's split and DuckDB's string_split);
  * each token's md5 contributes ±1 votes per bit — bits 0..31 from the
  * first 4 digest bytes read big-endian unsigned (= conv(substr(md5,1,8),
  * 16,10)), bits 32..63 from bytes 4..7; final bit b is set iff its vote
  * total is strictly positive.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash64"

  def compute(u: UTF8String): Long = {
    val d = CdcChunks.digests.get()
    val votes = new Array[Int](64)
    val toks = u.toString.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      d.reset()
      val h = d.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      val h1 = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      val h2 = ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
        ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1); b += 1
      }
      while (b < 64) {
        votes(b) += (if (((h2 >> (b - 32)) & 1L) == 1L) 1 else -1); b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { x =>
      val ref = ctx.addReferenceObj("graftSimhash", this,
        classOf[SimHash64].getName)
      s"${ev.value} = $ref.compute($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** array<string> of content-defined chunks of `c` — one compiled pass. */
  def cdcChunks(c: Column): Column =
    ColumnBridge.toColumn(CdcChunks(ColumnBridge.toExpression(c.cast("string"))))

  /** 64-bit simhash signature of `c` — one compiled pass. */
  def simhash64(c: Column): Column =
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpression(c.cast("string"))))

  /** SQL builder for GraftExtensions: graft_simhash64(text). */
  def simhash64Builder(es: Seq[Expression]): Expression = {
    require(es.length == 1, "graft_simhash64 takes 1 string argument")
    SimHash64(org.apache.spark.sql.catalyst.expressions.Cast(
      es.head, StringType))
  }

  /** Make `graft_cdc_chunks(text)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_cdc_chunks", { args =>
      require(args.length == 1, "graft_cdc_chunks takes 1 string argument")
      CdcChunks(org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, StringType))
    })
}
