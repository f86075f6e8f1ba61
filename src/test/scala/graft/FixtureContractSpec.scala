package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-fixture contract: `Tables.ld(..., "events")` must yield a
  * session-local TimestampType `ts` under EVERY physical encoding the driver
  * has shipped. Round 10 lost 22 correctness rows, 35 tests, and the entire
  * bench to a silent fixture re-encode (INT64 nanos → timestamp[us]); this
  * spec makes the next re-encode fail ONE targeted test with a clear message
  * instead of 35 downstream ones.
  *
  * Encodings covered (each written as a real parquet file and read back
  * through the same `Tables.ld` path production uses):
  *   1. raw INT64 epoch-nanos — what the nanos-vintage fixture looks like to
  *      Spark under `nanosAsLong=true` (Spark cannot WRITE TIMESTAMP(NANOS),
  *      but the read-side branch only ever sees LongType, so a plain long
  *      column exercises it exactly);
  *   2. timestamp[us] isAdjustedToUTC=false → reads as TIMESTAMP_NTZ (the
  *      r10-vintage fixture, verified with pyarrow in VERDICT r10);
  *   3. timestamp[us] isAdjustedToUTC=true → reads as TimestampType already.
  * All three must decode to the SAME instant for the same input so oracles
  * line up regardless of vintage.
  */
class FixtureContractSpec extends AnyFunSuite with SparkFixture {

  // 2024-03-01T12:34:56.789012 UTC, as epoch-micros.
  private val micros = 1709296496789012L

  private def roundTrip(writeDir: String): (DataType, Long) = {
    val df = Tables.ld(spark, writeDir, "events")
    val dt = df.schema("ts").dataType
    val got = df.select(unix_micros(col("ts").cast(TimestampType))).head.getLong(0)
    (dt, got)
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-fixture-$tag")
    d.toFile.deleteOnExit(); d.toString
  }

  test("nanos-vintage fixture (ts reads as LongType) decodes to TimestampType") {
    val dir = tmp("nanos")
    spark.range(1).select(lit(micros * 1000L).as("ts"), lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, got) = roundTrip(dir)
    assert(dt == TimestampType, s"events.ts must normalize to TIMESTAMP, got $dt")
    assert(got == micros)
  }

  test("micros NTZ fixture (TIMESTAMP_NTZ) decodes to TimestampType, same instant") {
    val dir = tmp("ntz")
    spark.range(1)
      .select(timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, got) = roundTrip(dir)
    assert(dt == TimestampType, s"events.ts must normalize to TIMESTAMP, got $dt")
    assert(got == micros)
  }

  test("UTC-adjusted micros fixture (TimestampType) passes through unchanged") {
    val dir = tmp("utc")
    spark.range(1)
      .select(timestamp_micros(lit(micros)).as("ts"), lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, got) = roundTrip(dir)
    assert(dt == TimestampType, s"events.ts must normalize to TIMESTAMP, got $dt")
    assert(got == micros)
  }

  test("the LIVE sf0.001 fixture decodes to TimestampType with sane instants") {
    val df = Tables.ld(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"driver fixture regressed: events.ts reads as ${df.schema("ts").dataType} " +
        "after Tables.ld — update Tables.normalizeEventsTs for the new encoding")
    // Sanity: instants land in a plausible decade, catching unit slips
    // (nanos-as-micros would land in year ~56000; micros-as-nanos in 1970).
    val yr = df.select(min(year(col("ts"))), max(year(col("ts")))).head
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts decoded to implausible years ${yr.getInt(0)}..${yr.getInt(1)}")
  }
}
