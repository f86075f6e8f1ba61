package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANK without a single-partition window (r13).
  *
  * `row_number().over(Window.orderBy(...))` on a corpus-sized frame pushes
  * every row through ONE task — locally invisible (5 000 docs sort in
  * milliseconds), at 100 TB a straggler that serializes the whole stage.
  * The standard fix is the two-stage rank (the q141 exact-percentile /
  * q209 prefix-sum shape, generalized here):
  *
  *   1. COARSE: per-bucket row counts, where the caller supplies a bucket
  *     expression MONOTONE in the order (a truncation/prefix of the first
  *      order key). The bucket-count frame is bounded by the bucket
  *      domain — broadcastable at any corpus size — so ITS global window
  *      (the running offset) is the documented bounded exception.
  *   2. FINE: row_number PARTITIONED BY bucket (a keyed shuffle, fully
  *      parallel) ordered by the caller's keys; global rank = bucket
  *      offset + within-bucket rank.
  *
  * Identical output to the single-partition form for any total order
  * (callers must pass tie-breaking order keys, as they already did).
  */
object Ranks {

  /** Adds `rankCol` (1-based global rank) and `totalCol` (total row
    * count) to `df`. `bucket` MUST be monotone non-decreasing along
    * `order` (e.g. order = n_chars asc, doc_id → bucket = n_chars DIV 64;
    * order = score DESC → bucket = -floor(score·1000)). */
  def stagedGlobalRank(df: DataFrame, bucket: Column, order: Seq[Column],
      rankCol: String, totalCol: String): DataFrame = {
    // The input feeds BOTH the coarse count and the fine rank — pin it so
    // its derivation runs once (unpinned, Catalyst re-expands the whole
    // upstream subtree per reference: q152's gram pipeline planned 4
    // scans). Per-query scratch, torn down by the bench between queries;
    // at 100 TB the equivalent is the cached/bucketed intermediate any
    // two-pass rank materializes.
    val b = df.withColumn("_rk_bkt", bucket).localCheckpoint()
    val offs = b.groupBy("_rk_bkt").agg(count(lit(1)).as("_rk_nb"))
      .withColumn("_rk_off", coalesce(sum("_rk_nb").over(
        Window.orderBy("_rk_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum("_rk_nb").over(Window.partitionBy()))
      .select(col("_rk_bkt"), col("_rk_off"), col(totalCol))
    val wb = Window.partitionBy("_rk_bkt").orderBy(order: _*)
    b.join(broadcast(offs), "_rk_bkt")
      .withColumn(rankCol, col("_rk_off") + row_number().over(wb))
      .drop("_rk_bkt", "_rk_off")
  }

  /** ANSI NTILE(t) from a 1-based global rank and the total count —
    * "first n MOD t tiles get ⌈n/t⌉ rows", bit-matching Spark's and
    * DuckDB's NTile so oracles replay it. Evaluated as t−1 exact integer
    * boundary comparisons (tile k ends at k·⌊n/t⌋ + min(k, n MOD t)) —
    * no column division anywhere, so no float-rounding edge exists. */
  def ntileFromRank(r: Column, n: Column, t: Int): Column = {
    val bs = floor(n / t).cast("bigint") // quotient ≤ n: exact in double
    val rem = n - bs * t
    (1 until t).foldLeft(lit(1L)) { (acc, k) =>
      acc + when(r > lit(k.toLong) * bs + least(lit(k.toLong), rem), 1L)
        .otherwise(0L)
    }
  }
}
