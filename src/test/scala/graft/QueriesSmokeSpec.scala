package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs end-to-end at sf0.001 and returns a sane
  * shape. (Hash-level correctness is the driver's DuckDB gate — Verify +
  * tools/check.py; this suite catches runtime breakage in `sbt test`.
  * Round 1 shipped seven queries that threw on execution and were silently
  * timed as "fast" — this spec makes that impossible to miss.)
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  // Queries where zero rows would itself be a bug at sf0.001.
  private val mustHaveRows = Set(
    "q01_scan_project", "q05_agg_global", "q06_agg_group", "q10_join_broadcast",
    "q11_join_multi", "q17_join_cross", "q28_window", "q31_topk",
    "q40_dedup_exact", "q41_text_tokens", "q47_simhash", "q60_knn_brute",
    "q63_centroid_dist", "q70_events_hourly", "q71_sessionize",
    "q74_stream_hourly", "q80_media_meta", "q81_frame_sample",
    "q89_orc_roundtrip",
    "q95_quality_gate_rules", "q96_shard_pack", "q97_stratified_sample",
    "q98_decontaminate", "q108_doc_chunks", "q109_token_repetition",
    "q111_semdedup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, "schema must not be empty")
      val n = df.count()
      assert(n >= 0)
      if (mustHaveRows(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // q39 serializes its array to CSV for the driver's pandas-hash compare;
  // this keeps the NATIVE ArrayType aggregation surface itself covered.
  test("array aggregation: sort_array(collect_list) yields a real " +
    "ArrayType column with ordered elements") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val df = Tables.ld(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_linenumber"))).as("linenums"))
    assert(df.schema("linenums").dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }, s"expected array<int>, got ${df.schema("linenums").dataType}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = r.getSeq[Int](1)
      assert(xs == xs.sorted, s"unsorted array for orderkey ${r.get(0)}")
    }
  }

  test("q69 arithmetic really is DecimalType end-to-end (no silent double " +
    "promotion), and only the driver-facing projection stringifies") {
    import org.apache.spark.sql.types.{DecimalType, StringType}
    val exact = graft.queries.Relational.decimalMoneyExact(spark, sfDir)
    assert(exact.schema("sum_price").dataType == DecimalType(18, 2))
    assert(exact.schema("sum_disc_price").dataType == DecimalType(18, 4))
    assert(exact.schema("min_price").dataType == DecimalType(12, 2))
    // The public entry is the same frame stringified for the driver's
    // pandas-vs-DuckDB compare; every decimal renders all fractional digits.
    val pub = SparkEntry.queries("q69_decimal_money")(spark, sfDir)
    Seq("sum_price", "sum_disc_price", "min_price", "max_price").foreach { c =>
      assert(pub.schema(c).dataType == StringType, s"$c should be string")
    }
    val r = pub.orderBy("l_returnflag").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getString(1).matches("""-?\d+\.\d{2}"""),
        s"sum_price not scale-2 plain notation: ${row.getString(1)}")
      assert(row.getString(2).matches("""-?\d+\.\d{4}"""),
        s"sum_disc_price not scale-4 plain notation: ${row.getString(2)}")
    }
  }

  test("every query with an oracle exists in queries, and oracle SQL is " +
    "nonempty") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle for unknown query $name")
      assert(sql.trim.nonEmpty)
    }
  }

  // Queries whose output is inherently engine-specific and therefore can't
  // be oracle-checked; each must instead be covered by SketchPropertySpec.
  // EMPTY since r13: the two sketch queries (q38, q141) were converted to
  // banded oracles — they emit exact values plus in-band verdict booleans,
  // so DuckDB hash-checks them like everything else. Adding a query
  // without an oracle should be a DELIBERATE act — extend this list AND
  // add a property spec.
  private val oracleExempt = Set.empty[String]

  test("every query WITHOUT an oracle is explicitly exempted (no silent " +
    "rows-only checks)") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- oracleExempt
    assert(missing.isEmpty,
      s"queries shipped without a DuckDB oracle or exemption: $missing")
  }
}
