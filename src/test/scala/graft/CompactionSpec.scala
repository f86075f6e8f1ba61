package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.io.File

/** Layout assertions for q100's small-file compaction: the rewrite must
  * actually shrink the file count to the target, and range partitioning
  * must leave each output file owning a DISJOINT o_orderkey range — the
  * property that makes post-compaction scans min-max-prunable on the key.
  */
class CompactionSpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  private def parts(dir: String): Seq[File] =
    new File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("q100 compacts 64 fragments into 4 range-disjoint files") {
    SparkEntry.queries("q100_compact_small_files")(spark, sfDir).collect()
    val base = s"/root/repo/target/sink/sf0.001"
    assert(parts(s"$base/orders_fragmented").size == 64)
    val compacted = parts(s"$base/orders_compacted")
    assert(compacted.size == 4, s"expected 4 files, got ${compacted.size}")
    // each file's [min,max] o_orderkey range must not overlap any other's
    val ranges = compacted.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"overlapping key ranges: $ranges")
      case _ =>
    }
  }
}
