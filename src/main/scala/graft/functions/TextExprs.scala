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

object TextExprs {
  /** array<string> of content-defined chunks of `c` — one compiled pass. */
  def cdcChunks(c: Column): Column =
    ColumnBridge.toColumn(CdcChunks(ColumnBridge.toExpression(c.cast("string"))))

  /** Make `graft_cdc_chunks(text)` callable from SQL text in this session. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "graft_cdc_chunks", { args =>
      require(args.length == 1, "graft_cdc_chunks takes 1 string argument")
      CdcChunks(org.apache.spark.sql.catalyst.expressions.Cast(
        args.head, StringType))
    })
}
