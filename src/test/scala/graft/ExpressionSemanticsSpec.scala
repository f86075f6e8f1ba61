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
}
