package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass perceptual dHash — q115's hash kernel. The declarative
  * form (`transform(sequence(1,64), k -> ascii(substr(frame,k,1)))` + a
  * 64-term bitwiseOR chain over element_at pairs) evaluates the
  * higher-order lambda INTERPRETED per row (the repo-wide HOF lesson, see
  * TextOps.shingles scaladoc); this expression walks the frame's code
  * points once inside whole-stage codegen and emits the 64-bit hash
  * directly.
  *
  * Bit definition is IDENTICAL to the declarative twin (pinned by
  * DHashParitySpec): the frame is an 8×8 grid of code points (row-major,
  * 1-based positions 1..64), bit (r·8+c) is set when
  * px(r,c) > px(r,(c+1) mod 8) — the row-wrapped horizontal gradient.
  * Positions past the frame's end read as 0, exactly like
  * `ascii(substr(frame,k,1))` on an out-of-range k (q115 filters to full
  * 64-char frames, so this only matters for direct callers).
  */
case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash64"

  def compute(u: UTF8String): Long = {
    val cps = u.toString.codePoints().toArray
    def px(k: Int): Int = if (k < cps.length) cps(k) else 0
    var h = 0L
    var b = 0
    while (b < 64) {
      val r = b / 8; val c = b % 8
      if (px(r * 8 + c) > px(r * 8 + (c + 1) % 8)) h |= 1L << b
      b += 1
    }
    h
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { x =>
      val ref = ctx.addReferenceObj("graftDhash", this,
        classOf[DHash64].getName)
      s"${ev.value} = $ref.compute($x);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageExprs {
  /** 64-bit perceptual dHash of a text "frame" — one compiled pass. */
  def dhash64(c: Column): Column =
    ColumnBridge.toColumn(DHash64(ColumnBridge.toExpression(c.cast("string"))))

  /** SQL builder for GraftExtensions: graft_dhash64(frame). */
  def builder(es: Seq[Expression]): Expression = {
    require(es.length == 1, "graft_dhash64 takes 1 string argument")
    DHash64(org.apache.spark.sql.catalyst.expressions.Cast(
      es.head, StringType))
  }
}
