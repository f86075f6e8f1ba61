package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.ColumnBridge

/** Spark's runtime-filter bloom pair — `BloomFilterAggregate` /
  * `BloomFilterMightContain`, exactly the expressions Catalyst's
  * InjectRuntimeFilter plants beside selective joins — surfaced as
  * first-class Columns and (via GraftExtensions) SQL functions. They are
  * deliberately absent from Spark's public FunctionRegistry, so the
  * ColumnBridge seam is the supported-shape way to use them explicitly;
  * q110's bloom-prefiltered decontamination is the consumer (the same
  * scalar-subquery + pushed-down filter shape the optimizer would inject,
  * but across a semi-join the optimizer can't see is selective).
  */
object BloomExprs {

  /** SQL builder: graft_bloom_agg(col, est_items, num_bits). */
  def aggBuilder(es: Seq[Expression]): Expression = {
    require(es.length == 3,
      "graft_bloom_agg takes (value, est_items, num_bits)")
    new BloomFilterAggregate(es(0), es(1), es(2)).toAggregateExpression()
  }

  /** SQL builder: graft_bloom_contains(bloom, value). */
  def containsBuilder(es: Seq[Expression]): Expression = {
    require(es.length == 2, "graft_bloom_contains takes (bloom, value)")
    BloomFilterMightContain(es(0), es(1))
  }

  /** Aggregate `c` into one bloom-filter blob (1-row binary column). */
  def bloomAgg(c: Column, estItems: Column, numBits: Column): Column =
    ColumnBridge.toColumn(
      aggBuilder(Seq(c, estItems, numBits).map(ColumnBridge.toExpression)))

  /** Membership probe against a bloom blob (typically a scalar subquery —
    * `bloomDf.scalar()` — so every task reads the one broadcast blob). */
  def mightContain(bloom: Column, c: Column): Column =
    ColumnBridge.toColumn(
      containsBuilder(Seq(bloom, c).map(ColumnBridge.toExpression)))
}
