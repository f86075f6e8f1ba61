package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WIDER-THAN-64-DIM EMBEDDING FIXTURE (r13, VERDICT item 7): every ANN
  * query runs on the driver corpus's 64-dim vectors, and the plane
  * constants in VectorOps are sized to them — so nothing proved the
  * FAMILY (native dot kernel, banded-hyperplane LSH, the hash-seeded
  * plane recipe) survives a wider embedding column. This spec derives a
  * 256-dim corpus from the real 64-dim table (deterministic widening: the
  * vector concatenated with three fixed elementwise transforms of
  * itself), plants near-duplicates at a known small angle, and pins:
  *
  *   1. the codegen'd DotProduct kernel is dimension-agnostic — its
  *      256-dim cosine for each planted pair is ≥ .999 and matches a
  *      declarative zip_with/aggregate recompute to 1e-9;
  *   2. the HyperplaneBands kernel at 256 dims reproduces a per-plane
  *      scalar recompute bit-for-bit (dim comes from the planes, not a
  *      hardcoded 64);
  *   3. banded LSH (8 bands × 16 bits, planes from the SAME hash-seeded
  *      recipe as VectorOps at dim=256) reaches recall 1.0 on the
  *      planted pairs while generating ≪ n²/2 candidates — the q68
  *      at-scale claim, demonstrated off the 64-dim happy path.
  */
class WideEmbeddingSpec extends AnyFunSuite with SparkFixture {
  private val srcDir = "/root/testdata/sf0.01"
  private val Dim = 256
  private val Planted = 25 // vec_id % 20 == 0 of the 500-vector corpus

  /** Same construction as VectorOps.hyperplanes/bandPlanes, dim-param'd
    * and seed-disjoint. */
  private def planes(n: Int, dim: Int): Seq[Seq[Double]] =
    (0 until n).map { p =>
      (0 until dim).map { i =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s"wide_${p}_$i")
        (h % 1000) / 1000.0
      }
    }

  /** 256-dim corpus: [e | 0.5·e reversed | sign-flipped e | e shifted],
    * plus a planted near-dup (id + 100000) of every 20th vector with a
    * per-position ±0.2 % elementwise tilt — a genuine small ANGLE, not a
    * pure rescale (a rescale would make any cosine method trivially
    * pass). */
  private lazy val wide = {
    val base = Tables.ld(spark, srcDir, "embeddings")
      .select(col("vec_id"),
        expr("""concat(CAST(embedding AS ARRAY<DOUBLE>),
                       transform(reverse(CAST(embedding AS ARRAY<DOUBLE>)),
                                 v -> v * 0.5D),
                       transform(CAST(embedding AS ARRAY<DOUBLE>),
                                 (v, i) -> CASE WHEN i % 2 = 0
                                           THEN -v ELSE v END),
                       transform(CAST(embedding AS ARRAY<DOUBLE>),
                                 v -> v + 0.1D))""").as("emb"))
    val dups = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        expr("""transform(emb,
                  (v, i) -> v * (1.0D + 0.002D * ((i % 7) - 3)))""")
          .as("emb"))
    base.unionByName(dups).localCheckpoint()
  }

  private def cos(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    import graft.functions.VectorExprs.dotp
    dotp(a, b) / (sqrt(dotp(a, a)) * sqrt(dotp(b, b)))
  }

  test("native dot kernel is dimension-agnostic: 256-dim planted-pair " +
    "cosines ≥ .999 and equal the declarative fold to 1e-9") {
    assert(wide.selectExpr("size(emb)").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(Dim))
    val pairs = wide.filter(col("vec_id") >= 100000)
      .select((col("vec_id") - 100000).as("vec_id"), col("emb").as("eb"))
      .join(wide, "vec_id")
    val decl = expr(
      """aggregate(zip_with(emb, eb, (x, y) -> x * y), 0D,
                   (acc, v) -> acc + v)
         / (sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), 0D,
                           (acc, v) -> acc + v))
            * sqrt(aggregate(zip_with(eb, eb, (x, y) -> x * y), 0D,
                             (acc, v) -> acc + v)))""")
    val rows = pairs.select(cos(col("emb"), col("eb")).as("k"),
      decl.as("d")).collect()
    assert(rows.length == Planted)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.999, s"planted pair cosine ${r.getDouble(0)}")
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        "kernel diverged from the declarative fold at 256 dims")
    }
  }

  test("HyperplaneBands at 256 dims matches a per-plane scalar recompute") {
    val ps = planes(32, Dim) // 2 bands x 16 bits is enough to cross-check
    val row = wide.filter(col("vec_id") === 40)
      .select(graft.functions.VectorExprs.bands(col("emb"), ps, 16)
        .as("bk"), col("emb"))
      .collect().head
    val got = row.getSeq[Int](0)
    val emb = row.getSeq[Double](1)
    val want = (0 until 2).map { b =>
      (0 until 16).foldLeft(0) { (acc, k) =>
        val dot = ps(b * 16 + k).zip(emb).map { case (w, v) => w * v }.sum
        if (dot > 0) acc | (1 << k) else acc
      }
    }
    assert(got == want, s"bands kernel diverged at 256 dims: $got vs $want")
  }

  test("banded LSH at 256 dims: recall 1.0 on planted near-dups, " +
    "candidates well under the pair space") {
    val ps = planes(128, Dim) // 8 bands x 16 sign bits, q68's geometry
    val keys = wide.select(col("vec_id"),
        posexplode(graft.functions.VectorExprs.bands(col("emb"), ps, 16))
          .as(Seq("band_idx", "band_val")))
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 500 by 20).map(i => (i.toLong, i + 100000L)).toSet
    assert(planted.size == Planted)
    val missed = planted -- cand
    assert(missed.isEmpty, s"banded LSH missed planted near-dups: $missed")
    val n = 500 + Planted
    assert(cand.size < n.toLong * (n - 1) / 2 / 10,
      s"candidate set ${cand.size} is not a real pruning of the " +
        s"${n.toLong * (n - 1) / 2}-pair space")
  }
}
