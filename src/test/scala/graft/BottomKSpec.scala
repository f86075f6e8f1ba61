package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BottomKBuffer, BottomKIds}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.LongType

/** Kernel-level contract for the native bottom-k sketch: the bounded
  * max-heap must agree with the obvious sort-take-k reference on any
  * input split, merges must be order-insensitive, and the byte
  * serialization must round-trip — the three properties that make the
  * aggregate's distributed answer a pure function of the input set. */
class BottomKSpec extends AnyFunSuite {

  private def ref(pairs: Seq[(Long, Long)], k: Int): Seq[Long] =
    pairs.distinct.sorted.take(k).map(_._2)

  private def fill(pairs: Seq[(Long, Long)], k: Int): BottomKBuffer = {
    val b = new BottomKBuffer(k)
    pairs.foreach { case (h, i) => b.offer(h, i) }
    b
  }

  // deterministic pseudo-random stream (no RNG state in tests either)
  private def stream(n: Int, seed: Long): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val x = (i * 2654435761L + seed) ^ ((i * seed) >>> 7)
      (x & 0xFFFFFFFFFFL, i.toLong)
    }

  test("heap matches sort-take-k on streams shorter and longer than k") {
    for (n <- Seq(3, 16, 17, 200); k <- Seq(1, 16, 64)) {
      val ps = stream(n, 42)
      assert(fill(ps, k).sortedIds.toSeq == ref(ps, k), s"n=$n k=$k")
    }
  }

  test("merge is order-insensitive and equals the union's bottom-k") {
    val k = 16
    val a = stream(100, 7); val b = stream(100, 13)
    val m1 = fill(a, k); val m2 = fill(b, k)
    val bids = m2.sortedIds.toSeq // capture before m1 absorbs m2's arrays
    var n = 0
    while (n < m2.size) { m1.offer(m2.hashes(n), m2.ids(n)); n += 1 }
    // union reference must come from each side's own surviving k —
    // bottom-k of union == bottom-k of (bottom-k(a) ∪ bottom-k(b))
    assert(m1.sortedIds.toSeq == ref(a ++ b, k))
    assert(bids == ref(b, k))
  }

  test("serialize/deserialize round-trips through the aggregate") {
    val agg = BottomKIds(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, LongType, nullable = false), 16)
    val buf = fill(stream(50, 99), 16)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedIds.toSeq == buf.sortedIds.toSeq)
    // eval yields the ids in hash-rank order
    assert(agg.eval(back).toString.nonEmpty)
  }

  test("set semantics (r13, r12 ADVICE): duplicate (hash, id) offers " +
    "take no slot and never repeat in the output") {
    val k = 4
    val ps = stream(6, 11)
    val b = new BottomKBuffer(k)
    // every element offered three times, interleaved
    (ps ++ ps ++ ps).foreach { case (h, i) => b.offer(h, i) }
    val got = b.sortedIds.toSeq
    assert(got == ref(ps, k),
      s"duplicated stream must sample like the distinct set: $got")
    assert(got.distinct == got, "an id repeated inside the k slots")
    // and merging a buffer into itself is idempotent
    val solo = fill(ps, k)
    var n = 0
    val (hs, ids) = (solo.hashes.clone(), solo.ids.clone())
    val sz = solo.size
    while (n < sz) { solo.offer(hs(n), ids(n)); n += 1 }
    assert(solo.sortedIds.toSeq == ref(ps, k))
  }

  test("result is a pure function of the input set: any arrival order, " +
    "any partition split, same sample") {
    val k = 8
    val ps = stream(60, 3)
    val base = fill(ps, k).sortedIds.toSeq
    assert(fill(ps.reverse, k).sortedIds.toSeq == base)
    assert(fill(ps.sortBy(_._2), k).sortedIds.toSeq == base)
    // three-way split, merged pairwise in a different order
    val Seq(x, y, z) = ps.grouped(20).toSeq
    val bz = fill(z, k); val by = fill(y, k); val bx = fill(x, k)
    var n = 0
    while (n < by.size) { bz.offer(by.hashes(n), by.ids(n)); n += 1 }
    n = 0
    while (n < bx.size) { bz.offer(bx.hashes(n), bx.ids(n)); n += 1 }
    assert(bz.sortedIds.toSeq == base)
  }
}
