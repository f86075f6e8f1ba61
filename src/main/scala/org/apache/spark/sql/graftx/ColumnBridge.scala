package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge into Spark's private[sql] Column ↔ Expression converters — the
  * seam extension libraries use to plug native Catalyst expressions into the
  * public Column API (Spark 4 wraps Columns in ColumnNodes for Connect).
  */
object ColumnBridge {
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  def toColumn(e: Expression): Column =
    new Column(ExpressionColumnNode(e))
}
