package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native bottom-k sketch: a [[TypedImperativeAggregate]] keeping the k
  * `(hash, id)` pairs with the SMALLEST hash per group — the classic
  * KMV/bottom-k construction that gives a deterministic, mergeable,
  * fixed-size "uniform" sample when the hash is a good mixer (here the
  * caller passes an md5-derived 60-bit value, so DuckDB can replay the
  * choice bit for bit; no RNG anywhere).
  *
  * This is the third rung of the UDAF ladder the reference's aggregate
  * seam implies (`physical_plan/aggregate/mod.rs:225-235`): q54's typed
  * `Aggregator` is the Encoder-based form; this is the engine-internal
  * form Spark's own `percentile`/`collect_list` use — raw
  * `InternalRow` updates, an opaque byte-serialized buffer, and an
  * explicit `merge` of partial states. The buffer is a size-bounded
  * max-heap: update is O(log k) against the CURRENT worst member, merge
  * is heap-union truncated to k, and the serialized form is exactly
  * `4 + 16k` bytes — at 100 TB each executor ships one such blob per
  * (group × partition), never the group's rows.
  *
  * Ties are impossible in practice (60-bit hash) but broken (hash, id)
  * lexicographically so the result is a pure function of the input SET.
  * Output: the ids ordered by hash ascending (position = sample rank).
  */
case class BottomKIds(
    hash: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = hash :: id :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bottom_k_ids"

  override def createAggregationBuffer(): BottomKBuffer =
    new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val i = id.eval(input)
    if (h != null && i != null)
      b.offer(h.asInstanceOf[Long], i.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    var n = 0
    while (n < o.size) { b.offer(o.hashes(n), o.ids(n)); n += 1 }
    b
  }

  override def eval(b: BottomKBuffer): Any =
    new GenericArrayData(b.sortedIds)

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * b.size)
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var n = 0
    while (n < b.size) {
      out.writeLong(b.hashes(n)); out.writeLong(b.ids(n)); n += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val b = new BottomKBuffer(k)
    var n = 0
    while (n < sz) { b.offer(in.readLong(), in.readLong()); n += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKIds =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKIds =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomKIds =
    copy(hash = c(0), id = c(1))
}

/** Size-bounded binary max-heap over (hash, id) pairs in two parallel
  * primitive arrays — no boxing, no per-element allocation. The root
  * (slot 0) is the current WORST member, so a full heap rejects
  * non-improving offers with one comparison. */
final class BottomKBuffer(k: Int) {
  val hashes = new Array[Long](k)
  val ids = new Array[Long](k)
  var size = 0

  private def gt(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 > h2 || (h1 == h2 && i1 > i2)

  /** Linear membership scan. O(k), but only reached by offers that would
    * otherwise ENTER the heap (fill phase, or improving on the current
    * worst) — steady-state non-improving offers still exit on the one
    * root comparison. Keeps the documented "pure function of the input
    * SET" contract: a duplicate (hash, id) row must not consume a second
    * of the k slots (r12 ADVICE; latent while q316 feeds distinct ids). */
  private def contains(h: Long, i: Long): Boolean = {
    var n = 0
    while (n < size) {
      if (hashes(n) == h && ids(n) == i) return true
      n += 1
    }
    false
  }

  def offer(h: Long, i: Long): Unit = {
    if (size == k && !gt(hashes(0), ids(0), h, i)) return // non-improving
    if (contains(h, i)) return // set semantics: duplicates take no slot
    if (size < k) {
      // sift up from the new leaf
      var c = size; size += 1
      hashes(c) = h; ids(c) = i
      while (c > 0 && gt(hashes(c), ids(c), hashes((c - 1) / 2),
          ids((c - 1) / 2))) {
        val p = (c - 1) / 2
        val th = hashes(c); val ti = ids(c)
        hashes(c) = hashes(p); ids(c) = ids(p)
        hashes(p) = th; ids(p) = ti
        c = p
      }
    } else if (gt(hashes(0), ids(0), h, i)) {
      // replace the worst, sift down
      hashes(0) = h; ids(0) = i
      var p = 0
      var done = false
      while (!done) {
        val l = 2 * p + 1; val r = l + 1
        var m = p
        if (l < size && gt(hashes(l), ids(l), hashes(m), ids(m))) m = l
        if (r < size && gt(hashes(r), ids(r), hashes(m), ids(m))) m = r
        if (m == p) done = true
        else {
          val th = hashes(p); val ti = ids(p)
          hashes(p) = hashes(m); ids(p) = ids(m)
          hashes(m) = th; ids(m) = ti
          p = m
        }
      }
    }
  }

  /** ids ordered by (hash, id) ascending — the sample in rank order. */
  def sortedIds: Array[Long] = {
    val idx = (0 until size).sortBy(n => (hashes(n), ids(n)))
    idx.map(ids).toArray
  }
}
