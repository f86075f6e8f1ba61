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

  /** Register a native Expression builder as a SQL-callable function in
    * this session — the runtime-registration twin of
    * SparkSessionExtensions.injectFunction (which requires registration at
    * session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
