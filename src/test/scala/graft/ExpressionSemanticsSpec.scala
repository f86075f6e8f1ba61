package graft

import graft.functions.VectorExprs.dotp
import graft.functions.Functions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Expression-level semantics the reference got wrong or left as todo!(),
  * pinned as tests (SURVEY §7 risk register): Kleene three-valued logic
  * (reference `binary.rs:133-148` — correct there), null-predicate rows
  * DROPPED (the reference appends a null row instead — `selection.rs:46`),
  * tan is tan (`unary.rs:96` dispatches to cos), and the native DotProduct
  * expression agreeing bit-for-bit with the declarative fold.
  */
class ExpressionSemanticsSpec extends AnyFunSuite with SparkFixture {

  private lazy val _ = spark // force init

  test("Kleene AND/OR with nulls (matches reference and_kleene/or_kleene)") {
    import spark.implicits._
    val df = Seq[(Option[Boolean], Option[Boolean])](
      (Some(true), None), (Some(false), None), (None, None))
      .toDF("a", "b")
    val rows = df.select(col("a") && col("b"), col("a") || col("b")).collect()
    // true AND null = null; true OR null = true
    assert(rows(0).isNullAt(0) && rows(0).getBoolean(1))
    // false AND null = false; false OR null = null
    assert(!rows(1).getBoolean(0) && rows(1).isNullAt(1))
    // null AND null = null
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("try_* all-fail NULL semantics: div-by-zero, BIGINT overflow, and " +
    "unparseable cast each yield NULL, never throw (ANSI-safe forms " +
    "q284 counts at production incidence)") {
    // One literal row where every branch fails — proves the NULL-absorb
    // contract the reworked q284 relies on without paying an exception
    // per corpus row (r11: the all-fail construction was 25× slower).
    val r = spark.sql(
      """SELECT try_divide(1.0, 0.0) AS d,
                try_add(9223372036854775807L, 1L) AS o,
                try_cast('xA' AS INT) AS c,
                try_multiply(9223372036854775807L, 2L) AS m,
                try_subtract(-9223372036854775808L, 1L) AS s""").head()
    assert((0 to 4).forall(r.isNullAt), r.toString)
  }

  test("null predicate drops the row (reference injects a null row — " +
    "selection.rs:46,93; we follow standard SQL)") {
    import spark.implicits._
    val df = Seq((1, Some(5)), (2, None), (3, Some(20))).toDF("id", "v")
    val kept = df.filter(col("v") > 10).collect()
    assert(kept.map(_.getInt(0)).toSeq == Seq(3))
  }

  test("tan is tan, not cos (reference unary.rs:96)") {
    import spark.implicits._
    val x = 1.0 // tan(1)=1.557 vs cos(1)=0.540 — unambiguous
    val got = Seq(x).toDF("x")
      .select(Functions.tanF(col("x"))).head().getDouble(0)
    assert(math.abs(got - math.tan(x)) < 1e-12)
    assert(math.abs(got - math.cos(x)) > 0.1)
  }

  test("DotProduct: codegen result == interpreted == declarative fold") {
    import spark.implicits._
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, -0.6f)))
    val df = vecs.toDF("a", "b")
    val declarative = df.select(
      aggregate(zip_with(col("a").cast("array<double>"),
        col("b").cast("array<double>"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)).as[Double].collect()
    val native = df.select(dotp(col("a"), col("b"))).as[Double].collect()
    assert(declarative.toSeq == native.toSeq)
    assert(math.abs(native(0) - (4.0 + 10.0 + 18.0)) < 1e-9)
  }

  test("DotProduct: null array yields null; mismatched lengths use min") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 99.0))),
      (None: Option[Array[Double]], Some(Array(1.0)))).toDF("a", "b")
    val rows = df.select(dotp(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0) // extra right element ignored
    assert(rows(1).isNullAt(0))
  }

  test("string functions: the reference's enumerated-but-todo surface " +
    "(unary.rs:97-106) all work") {
    import spark.implicits._
    val df = Seq("  Hello  ").toDF("s")
    val r = df.select(
      Functions.trimF(col("s")), Functions.upperF(col("s")),
      Functions.characterLength(col("s")), Functions.reverseF(col("s")),
      Functions.repeatF(Functions.trimF(col("s")), 2),
      Functions.replaceF(col("s"), "l", "L"),
      Functions.substrF(Functions.trimF(col("s")), 1, 4),
      Functions.ltrimF(col("s")), Functions.rtrimF(col("s")),
      Functions.lowerF(col("s"))).head()
    assert(r.getString(0) == "Hello")
    assert(r.getString(1) == "  HELLO  ")
    assert(r.getInt(2) == 9)
    assert(r.getString(3) == "  olleH  ")
    assert(r.getString(4) == "HelloHello")
    assert(r.getString(5) == "  HeLLo  ")
    assert(r.getString(6) == "Hell")
    assert(r.getString(7) == "Hello  ")
    assert(r.getString(8) == "  Hello")
    assert(r.getString(9) == "  hello  ")
  }

  test("q354 closed form: cum − min(0, running-min cum) equals the " +
    "imperative max(0, b+Δ) fold, clamps included") {
    import spark.implicits._
    val deltas = Seq(500L, -800L, 300L, -100L, 900L, -2000L, 50L)
    // imperative reference fold
    val expected = deltas.scanLeft(0L)((b, d) => math.max(0L, b + d)).tail
    val df = deltas.zipWithIndex.map { case (d, i) => (i, d) }
      .toDF("i", "delta")
    val w = org.apache.spark.sql.expressions.Window.orderBy("i")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val got = df.withColumn("cum", sum("delta").over(w))
      .withColumn("clamped",
        col("cum") - least(lit(0L), min("cum").over(w)))
      .orderBy("i").select("clamped").as[Long].collect().toSeq
    assert(got == expected, s"closed form $got != fold $expected")
  }

  test("q351 Allen cascade: each of the 13 relations classifies " +
    "exactly one hand-built interval pair") {
    import spark.implicits._
    // (a_lo, a_hi, b_lo, b_hi, expected relation)
    val cases = Seq(
      (0L, 1L, 2L, 3L, "precedes"), (0L, 2L, 2L, 3L, "meets"),
      (2L, 3L, 0L, 1L, "preceded_by"), (2L, 3L, 0L, 2L, "met_by"),
      (0L, 3L, 0L, 3L, "equals"), (0L, 2L, 0L, 3L, "starts"),
      (0L, 3L, 0L, 2L, "started_by"), (1L, 3L, 0L, 3L, "finishes"),
      (0L, 3L, 1L, 3L, "finished_by"), (1L, 2L, 0L, 3L, "during"),
      (0L, 3L, 1L, 2L, "contains"), (0L, 2L, 1L, 3L, "overlaps"),
      (1L, 3L, 0L, 2L, "overlapped_by"))
    val rel =
      """CASE
           WHEN a_hi <  b_lo THEN 'precedes'
           WHEN a_hi =  b_lo THEN 'meets'
           WHEN b_hi <  a_lo THEN 'preceded_by'
           WHEN b_hi =  a_lo THEN 'met_by'
           WHEN a_lo = b_lo AND a_hi = b_hi THEN 'equals'
           WHEN a_lo = b_lo AND a_hi < b_hi THEN 'starts'
           WHEN a_lo = b_lo THEN 'started_by'
           WHEN a_hi = b_hi AND a_lo > b_lo THEN 'finishes'
           WHEN a_hi = b_hi THEN 'finished_by'
           WHEN a_lo > b_lo AND a_hi < b_hi THEN 'during'
           WHEN a_lo < b_lo AND a_hi > b_hi THEN 'contains'
           WHEN a_lo < b_lo THEN 'overlaps'
           ELSE 'overlapped_by' END"""
    val got = cases.toDF("a_lo", "a_hi", "b_lo", "b_hi", "want")
      .select(col("want"), expr(rel).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, classified ${r.getString(1)}"))
    assert(got.map(_.getString(1)).distinct.length == 13,
      "all 13 relations must be reachable")
  }

  test("q340 estimator conversion: population→sample skewness and " +
    "kurtosis match directly computed sample estimators") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 10.0)
    val n = xs.length.toDouble
    val mean = xs.sum / n
    def m(p: Int) = xs.map(x => math.pow(x - mean, p)).sum / n
    val g1 = m(3) / math.pow(m(2), 1.5)
    val g2 = m(4) / (m(2) * m(2)) - 3
    val sampleSkew = g1 * math.sqrt(n * (n - 1)) / (n - 2)
    val sampleKurt = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + 6)
    val r = xs.toDF("x").agg(count(lit(1)).as("n"),
        skewness(col("x")).as("g1"), kurtosis(col("x")).as("g2"))
      .select(
        (col("g1") * sqrt(col("n") * (col("n") - 1)) / (col("n") - 2))
          .as("sk"),
        ((col("n") - 1) / ((col("n") - 2) * (col("n") - 3)) *
          ((col("n") + 1) * col("g2") + 6)).as("ku")).head()
    assert(math.abs(r.getDouble(0) - sampleSkew) < 1e-9)
    assert(math.abs(r.getDouble(1) - sampleKurt) < 1e-9)
    // cross-check against the independently known values for this set
    assert(math.abs(r.getDouble(0) - 1.763632614803888) < 1e-9)
    assert(math.abs(r.getDouble(1) - 3.228) < 1e-3)
  }
}
