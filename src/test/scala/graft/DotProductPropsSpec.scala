package graft

import graft.functions.VectorExprs.dotp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native DotProduct expression against a
  * plain Scala reference fold — random dimensions and magnitudes, including
  * empty arrays. The codegen path must be bit-identical to the sequential
  * double fold (that identity is what makes the DuckDB oracles hash-match).
  * Uses ScalaCheck generators with a fixed seed (no scalatest bridge in the
  * offline cache), so runs are reproducible.
  */
class DotProductPropsSpec extends AnyFunSuite with SparkFixture {

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.choose(0, 96)
    xs <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
  } yield xs.toArray

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("dotp == sequential Scala fold on 200 random vector pairs") {
    import spark.implicits._
    val pairs = samples(Gen.zip(vecGen, vecGen), 200)
    assert(pairs.size >= 150, "generator should rarely fail")
    val df = pairs.toDF("a", "b")
    val got = df.select(dotp(col("a"), col("b"))).as[Double].collect()
    val want = pairs.map { case (a, b) =>
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    assert(got.toSeq == want)
  }

  test("null ELEMENT anywhere in either side yields NULL, not a silent " +
    "0.0-slot read (r13 kernel contract; the AsOf-unbox bug class)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(3.0), Some(4.0))),
      (2L, Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(3.0), Some(4.0))),
      (3L, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](None, Some(4.0))))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.VectorExprs.dotp(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(1L -> Some(11.0), 2L -> None, 3L -> None))
    // bands: a null element nulls the whole key array — a corrupt vector
    // must never land in a bucket
    val planes = Seq.fill(16)(Seq(0.5, -0.5))
    val bk = df.select(col("id"),
        graft.functions.VectorExprs.bands(col("a"), planes, 16).as("bk"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(bk == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("dotp is symmetric; empty arrays give zero") {
    import spark.implicits._
    val pairs = samples(Gen.zip(vecGen, vecGen), 50)
    val df = pairs.toDF("a", "b")
    val rows = df.select(dotp(col("a"), col("b")), dotp(col("b"), col("a")))
      .as[(Double, Double)].collect()
    rows.foreach { case (ab, ba) => assert(ab == ba) }
    val empty = Seq((Array.empty[Double], Array(1.0, 2.0))).toDF("a", "b")
    assert(empty.select(dotp(col("a"), col("b"))).as[Double].head() == 0.0)
  }
}
