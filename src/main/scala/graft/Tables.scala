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

  /** Lazy scan of one table; column pruning + predicate pushdown apply.
    *
    * `events.ts` has shipped under two physical encodings across fixture
    * vintages: INT64 TIMESTAMP(NANOS) — which Spark's parquet reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as a raw long — and plain
    * timestamp[us] (isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ). The
    * engine's contract is a session-local TimestampType `ts` (what every
    * event/stream query and r1-r9's green oracles were built against), so we
    * normalize BY READ TYPE rather than assuming a vintage:
    *   - LongType (nanos file + `nanosAsLong`): integer `div 1000` →
    *     `timestamp_micros`. Integer div, not `/1000.0` — epoch-nanos exceed
    *     2^53 and would lose precision through a double. Matches how DuckDB
    *     casts TIMESTAMP_NS to its microsecond TIMESTAMP, so oracles line up.
    *   - TimestampNTZType (micros file): cast to TimestampType. Session tz is
    *     pinned UTC in every entrypoint, so the wall-clock reading is
    *     identical to the nanos path (and to DuckDB's naive TIMESTAMP).
    *   - TimestampType: already the contract; pass through. */
  def ld(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Normalize `ts` to the TimestampType contract by READ TYPE (see [[ld]]).
    * Works on batch and streaming DataFrames alike — the branch is on the
    * analyzed schema, resolved before any data moves. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register all tables as temp views named exactly like the files, so
    * `spark.sql` text matches the DuckDB oracle text 1:1. */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => ld(spark, dir, n).createOrReplaceTempView(n))

  /** Register only the named tables — each registration re-reads parquet
    * footers, so SQL queries bind just what they touch (all-10 views()
    * was 2.3× of q35's whole runtime when q36 called it per-run). */
  def view(spark: SparkSession, dir: String, only: String*): Unit =
    only.foreach(n => ld(spark, dir, n).createOrReplaceTempView(n))
}
