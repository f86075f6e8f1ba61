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
