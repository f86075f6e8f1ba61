package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregate: geometric mean via Σln(x), exp at finish.
  *
  * This is the distributed version of the reference's `AggregateOperator`
  * seam (reference `physical_plan/aggregate/mod.rs:225-235`): the reference
  * runs accumulators on a single partition and therefore never needed
  * `merge`; Spark's `Aggregator` contract requires associative partial
  * states (`reduce` map-side, `merge` across partitions) — exactly what a
  * 1000-executor aggregation needs. Registered via `functions.udaf`.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
