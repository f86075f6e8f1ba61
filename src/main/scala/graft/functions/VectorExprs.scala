package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the hot loop of vector similarity.
  *
  * `zip_with` + `aggregate` (the declarative form) allocates an intermediate
  * array and evaluates two lambdas per element per pair — measured ~46 s for
  * the sf0.1 all-pairs query q62. This expression compiles to a tight
  * primitive loop inside whole-stage codegen (no allocation, no virtual
  * calls), with the same left-to-right summation order, so results are
  * bit-identical to the declarative form and to DuckDB's
  * list_inner_product oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private def toExpr(c: Column): Expression =
    ColumnBridge.toExpression(c)

  private def toCol(e: Expression): Column =
    ColumnBridge.toColumn(e)

  /** Σ a[i]·b[i] in double with sequential fold — codegen'd native loop. */
  def dotp(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a.cast("array<double>")),
                     toExpr(b.cast("array<double>"))))

  /** Make `graft_dot(a, b)` callable from SQL text in this session —
    * mirrors the reference's name→function scalar registry seam
    * (`logical_plan/expression.rs:96-114`) with a native, codegen'd
    * expression instead of a UDF. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    ColumnBridge.registerFunction(spark, "graft_dot", { args =>
      require(args.length == 2, "graft_dot takes 2 array arguments")
      DotProduct(Cast(args(0), ArrayType(DoubleType)),
                 Cast(args(1), ArrayType(DoubleType)))
    })
  }
}
