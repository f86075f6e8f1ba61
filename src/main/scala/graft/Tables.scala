package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the driver's parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's `Catalog` (reference `catalog.rs:20-65`): a named
  * lookup of schema'd batch producers — here simply lazy parquet scans, so
  * Catalyst sees a `FileSourceScanExec` it can push filters/projections into.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy scan of one table; column pruning + predicate pushdown apply. */
  def ld(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views named exactly like the files, so
    * `spark.sql` text matches the DuckDB oracle text 1:1. */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => ld(spark, dir, n).createOrReplaceTempView(n))
}
