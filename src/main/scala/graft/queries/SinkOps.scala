package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.ld

/** File sinks + re-scan: the reference has NO writers (SURVEY §2.1 — its
  * only sink is a materialized Vec<RecordBatch>); at 100 TB the write path
  * IS the pipeline. Each query writes a derived dataset (partitioned
  * parquet / CSV), reads it back, and aggregates — the oracle aggregates
  * the source directly, so the check proves roundtrip fidelity, not just
  * that a file appeared. Output paths are per-sf so the sf0.01 correctness
  * run and the sf0.1 bench never clobber each other.
  */
object SinkOps {

  /** Single source of truth for the sink root: <cwd>/target/sink rather
    * than a literal repo path, so the suite survives the repo living
    * anywhere. */
  private[graft] lazy val sinkRoot: java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("user.dir"), "target", "sink")

  /** Basename of the sf dir, robust to a trailing slash
    * ("/x/sf0.01/" → "sf0.01", not ""). */
  private[graft] def sfName(d: String): String = {
    val t = d.replaceAll("/+$", "")
    t.substring(t.lastIndexOf('/') + 1)
  }

  private def outDir(d: String, name: String): String =
    sinkRoot.resolve(sfName(d)).resolve(name).toString

  /** Per-invocation scratch dir for TRANSIENT writes (q116's dim):
    * unique (so concurrent invocations never clobber each other — the
    * q110 session-mutation class), under the system tmp dir (so nothing
    * accumulates beneath target/ across bench runs), and recursively
    * removed at JVM exit. */
  private[graft] def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scala.sys.addShutdownHook {
      import java.nio.file.Files
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse
            .foreach(f => Files.deleteIfExists(f))
        } finally walk.close()
      }
    }
    p.toString
  }

  /** Once-per-JVM write guard for DETERMINISTIC layout sinks (q129): the
    * first invocation in a JVM performs the write, repeats skip it and go
    * straight to the read-back. Verify (one invocation per query) is
    * unaffected; the bench's measured iterations stop re-paying the
    * identical file write, so the reported number tracks the QUERY (stats
    * from the laid-out files) rather than the sink — the r10 verdict's
    * q129 note. Keyed by absolute output path (includes the sf name), and
    * deliberately JVM-local: a fresh process always rewrites, so stale
    * leftovers from older code can never be read. Only valid for writes
    * whose bytes are a pure function of the input dir — NOT for the
    * roundtrip queries (q90/q91/q93/q140), where the write IS the
    * semantics under test. */
  private val writtenOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def writeOnce(path: String)(doWrite: => Unit): Unit =
    if (writtenOnce.add(path)) doWrite

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Partitioned parquet write (the 100 TB layout primitive: one dir per
    // partition key → partition pruning on re-scan) → read back → agg.
    "q90_parquet_roundtrip" -> ((s, d) => {
      val path = outDir(d, "lineitem_by_flag")
      ld(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
      s.read.parquet(path)
        .groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // JSON-lines roundtrip: the interchange format every ingest pipeline
    // meets. Read-back uses the WRITER's schema (inference would widen
    // types); doubles survive exactly (Spark writes shortest-round-trip
    // decimal reprs). The aggregate uses the exact-cents pattern so the
    // oracle (over the source table) proves roundtrip fidelity.
    "q88_json_roundtrip" -> ((s, d) => {
      val path = outDir(d, "events_json")
      val src = ld(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
      src.write.mode("overwrite").json(path)
      s.read.schema(src.schema).json(path)
        .groupBy((col("user_id") % 10).as("user_band")).agg(
          count(lit(1)).as("n"),
          (sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("tot_value"))
        .orderBy("user_band")
    }),

    // Small-file COMPACTION — the file-size governance pass every lake
    // runs: streaming ingests and over-parallel writers leave thousands
    // of KB-scale files per partition, and then per-file open cost +
    // driver metadata pressure dominate every scan. Stage a deliberately
    // fragmented copy (64 shards), then compact with repartitionByRange
    // on the natural sort key + sortWithinPartitions: range partitioning
    // yields evenly-sized files each owning a DISJOINT o_orderkey range,
    // so post-compaction scans min-max-prune on the key (the poor man's
    // clustering index) and the rewrite is one narrow shuffle. At 100 TB
    // the same plan runs per-partition with n sized to target-file-bytes.
    // The aggregate runs over the COMPACTED copy while the oracle
    // aggregates the source — a green row proves the rewrite lost
    // nothing; CompactionSpec pins the file counts and range disjointness.
    "q100_compact_small_files" -> ((s, d) => {
      val frag = outDir(d, "orders_fragmented")
      val comp = outDir(d, "orders_compacted")
      // the fragmented copy is the SCENARIO, not the op under test — stage
      // it once per path (the q92 build-once pattern) so repeat runs
      // measure the compaction rewrite itself
      if (!new java.io.File(s"$frag/_SUCCESS").exists())
        ld(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
          .repartition(64)
          .write.mode("overwrite").parquet(frag)
      s.read.parquet(frag)
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(comp)
      s.read.parquet(comp)
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          (sum(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("tot"),
          min("o_orderkey").as("min_k"),
          max("o_orderkey").as("max_k"))
        .orderBy("o_orderpriority")
    }),

    // ORC roundtrip — the other columnar warehouse format Spark ships
    // natively; same write→scan→agg shape as q90's parquet path.
    "q89_orc_roundtrip" -> ((s, d) => {
      val path = outDir(d, "orders_orc")
      ld(s, d, "orders")
        .filter(col("o_totalprice") > 300000)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n"),
          (sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("tot"))
        .orderBy("o_orderpriority")
    }),

    // Bucketed tables: both sides written bucketed+sorted on the join key,
    // so the join needs NO Exchange at read time — the canonical 100 TB
    // co-located-join layout (bucket pruning + shuffle elimination).
    // Requires the session catalog (embedded metastore); tables land in
    // spark.sql.warehouse.dir (default ./spark-warehouse inside the repo).
    "q92_bucketed_join" -> ((s, d) => {
      // The build-once guard keys the table names on a digest of the FULL
      // canonical path, not the basename — two corpora sharing a basename
      // (or a re-pointed symlink) must not silently reuse each other's
      // bucketed layout (r4 advice). Data regenerated IN PLACE under the
      // same path mid-session is still assumed immutable: bucketed layout
      // is write-once-join-many by contract.
      val sf = java.security.MessageDigest.getInstance("MD5")
        .digest(new java.io.File(d).getCanonicalPath.getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      val lt = s"graft_l_$sf"; val ot = s"graft_o_$sf"
      // Bucketed layout is WRITE-ONCE, JOIN-MANY in production; the build
      // runs only when the sf-keyed tables aren't in this session's catalog
      // yet, so repeat executions (bench iterations) measure the join the
      // layout exists to serve, not the rewrite.
      if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(ot)) {
        // The default session catalog is in-memory: table NAMES don't
        // survive a JVM restart but warehouse FILES do, and saveAsTable
        // refuses to reuse a location it doesn't know about. Drop both
        // layers first.
        Seq(lt, ot).foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = java.nio.file.Paths.get(
            java.net.URI.create(s.conf.get("spark.sql.warehouse.dir"))
              .getPath, t)
          if (java.nio.file.Files.exists(loc)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
          }
        }
        ld(s, d, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .write.mode("overwrite")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(lt)
        ld(s, d, "orders")
          .select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(ot)
      }
      val l = s.table(lt); val o = s.table(ot)
      // merge hint: at fact×fact scale this join IS a sort-merge join; the
      // bucket layout then satisfies its distribution+ordering requirement
      // with ZERO Exchange/Sort (verified in PlanSpec). Without the hint
      // Spark would broadcast the small test-corpus side and hide the story.
      l.hint("merge").join(o.hint("merge"),
          l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(
          count(lit(1)).as("n_lines"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // Partition pruning: events written partitioned by event_type; the
    // filtered re-scan reads ONE partition directory (PartitionFilters in
    // the plan, pinned by PlanSpec) — at 100 TB this is the difference
    // between scanning 20 TB and 4 TB before the first filter runs.
    "q93_partition_pruning" -> ((s, d) => {
      val path = outDir(d, "events_by_type")
      ld(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"))
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .filter(col("event_type") === "purchase")
        .groupBy((col("user_id") % 100).as("user_band")).agg(
          count(lit(1)).as("n"),
          round(sum("value"), 2).as("tot"))
        .orderBy("user_band")
    }),

    // CSV write + schema'd read-back (text roundtrip fidelity).
    "q91_csv_roundtrip" -> ((s, d) => {
      val path = outDir(d, "orders_csv")
      ld(s, d, "orders")
        .filter(col("o_totalprice") > 400000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
        .csv(path)
        .groupBy((col("o_custkey") % 10).as("cust_band")).agg(
          count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("tot"))
        .orderBy("cust_band")
    }),

    // Z-order (Morton) clustering — the write-time layout optimization
    // (Delta/Iceberg's OPTIMIZE ZORDER BY) that gives min/max file
    // skipping on TWO columns at once, where q93's directory partitioning
    // serves only one. Both dims are normalized to 16 bits by value range
    // (the range comes from a 1-row broadcast aggregate, not a driver
    // round-trip), bit-interleaved into a 32-bit Morton code, and files
    // are assigned by the code's top 4 bits — VALUE-range assignment, so
    // it is embarrassingly parallel (no global rank/ntile window; this is
    // exactly how a production z-order write range-partitions) and
    // oracle-exact. The z-ordered copy is physically written (repartition
    // on file_id, z-sorted within files, one directory per file) and the
    // per-file stats come from the READ-BACK — the roundtrip-fidelity
    // pattern of this file — next to the same stats for a plain
    // partkey-linear layout straight from the source. The payoff is in
    // the output itself (measured at sf0.01): linear files bound partkey
    // to 124 of 2000 but span the FULL 0..99 suppkey range (zero skipping
    // on the second dim); z-order files bound BOTH dims to exactly 1/4 of
    // range (pk span 499, sk span 24 — the 4 file bits split 2+2 across
    // dims), so a two-dim point query prunes 15/16 files.
    "q129_zorder_layout" -> ((s, d) => {
      val path = outDir(d, "lineitem_zorder")
      val li = ld(s, d, "lineitem").select("l_partkey", "l_suppkey")
      val stats = li.agg(
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      val zed = li.crossJoin(broadcast(stats))
        .selectExpr("l_partkey", "l_suppkey",
          "(l_partkey - min_pk) * 65536 DIV (max_pk - min_pk + 1) AS xb",
          "(l_suppkey - min_sk) * 65536 DIV (max_sk - min_sk + 1) AS yb")
        .selectExpr("l_partkey", "l_suppkey", "xb",
          s"($zInterleave) AS z")
      // Layout write happens once per JVM (writeOnce): the z-ordered bytes
      // are a pure function of the input, so bench iterations 2..n read the
      // warm-up's files and the timed body is the stats/skipping query.
      writeOnce(path) {
        zed.selectExpr("l_partkey", "l_suppkey", "z", "z >> 28 AS file_id")
          .repartition(col("file_id"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").partitionBy("file_id").parquet(path)
      }
      val zStats = s.read.parquet(path)
        .groupBy(lit("zorder").as("layout"),
          col("file_id").cast("long").as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      val linStats = zed
        .selectExpr("l_partkey", "l_suppkey", "xb >> 12 AS file_id")
        .groupBy(lit("linear").as("layout"), col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      zStats.unionAll(linStats).orderBy("layout", "file_id")
    }),

    // SCHEMA EVOLUTION read: two parquet snapshots written with DIFFERENT
    // schemas into one dataset (v1 lacks `lang` — the "column added
    // later" lakehouse staple), read back with mergeSchema=true, which
    // unions the footer schemas and fills the missing column with NULL
    // for old files. The check proves the EVOLVED-read semantics (v1 rows
    // surface lang=NULL; v2 rows keep theirs), not just that files
    // appeared — the oracle recomputes the same union from `documents`
    // directly. At 100 TB, mergeSchema's footer-union pass is the
    // expensive part (one footer read per file — fine per-partition,
    // pathological across millions of tiny files); production pins the
    // evolved schema in a metastore and reads with it EXPLICITLY, which
    // is exactly what the oracle side models (one declared schema, old
    // rows null-filled). The snapshot split (doc_id parity) is
    // deterministic; writes go to the per-sf sink dir (overwrite), so
    // correctness and bench runs never clobber each other.
    "q140_schema_evolution" -> ((s, d) => {
      val path = outDir(d, "docs_evolved")
      val docs = ld(s, d, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$path/v=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "source", "n_chars", "lang")
        .write.mode("overwrite").parquet(s"$path/v=2")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("tot_chars"))
        .orderBy("source", "lang")
    }),

    // XML roundtrip — Spark 4's built-in XML source (the spark-xml
    // donation: rowTag-delimited record framing, schema-on-write).
    // The B2B/feed-interchange rung beside q88's JSON lines: same
    // write → schema'd read-back → exact-cents aggregate shape, so a
    // green row proves the XML encode/decode lost nothing (numeric
    // round-trip through text included — the writer emits
    // shortest-round-trip decimals like the JSON path). Read-back uses
    // the WRITER's schema; XML inference would widen types.
    "q196_xml_roundtrip" -> ((s, d) => {
      val path = outDir(d, "part_xml")
      val src = ld(s, d, "part")
        .filter(col("p_retailprice") > 950)
        .select("p_partkey", "p_brand", "p_retailprice")
      src.write.mode("overwrite").option("rowTag", "part").xml(path)
      s.read.schema(src.schema).option("rowTag", "part").xml(path)
        .groupBy("p_brand").agg(
          count(lit(1)).as("n"),
          (sum(expr(
            "CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("double") / 100).as("tot"))
        .orderBy("p_brand")
    }),

    // File-skipping effectiveness audit — the number q129's layouts are
    // CHOSEN on: for 10 md5-drawn 2-D point probes, how many files'
    // [min,max] zone-map envelopes must be read under the z-ordered
    // layout vs the single-column linear one. This is min/max data
    // skipping priced BEFORE committing a rewrite (the lakehouse
    // OPTIMIZE decision): per-file stats are recomputed relationally
    // (same splice of the Morton expression as q129 — no files
    // written), probes hit the ~32-row stats frame as a broadcast
    // range join, and the verdict is exact candidate-file counts per
    // (layout, probe). At 100 TB the stats frame IS the table format's
    // footer/manifest metadata — this audit never touches row data
    // beyond the one layout-assignment pass.
    "q246_skipping_audit" -> ((s, d) => {
      val li = ld(s, d, "lineitem").select("l_partkey", "l_suppkey")
      val stats = li.agg(
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      val zed = li.crossJoin(broadcast(stats))
        .selectExpr("l_partkey", "l_suppkey",
          "(l_partkey - min_pk) * 65536 DIV (max_pk - min_pk + 1) AS xb",
          "(l_suppkey - min_sk) * 65536 DIV (max_sk - min_sk + 1) AS yb")
        .selectExpr("l_partkey", "l_suppkey", "xb",
          s"($zInterleave) AS z")
      val fstats = zed
        .selectExpr("'zorder' AS layout", "z >> 28 AS file_id",
          "l_partkey", "l_suppkey")
        .unionAll(zed.selectExpr("'linear'", "xb >> 12",
          "l_partkey", "l_suppkey"))
        .groupBy("layout", "file_id")
        .agg(min("l_partkey").as("fmin_pk"), max("l_partkey").as("fmax_pk"),
          min("l_suppkey").as("fmin_sk"), max("l_suppkey").as("fmax_sk"))
        .localCheckpoint() // probes + per-layout totals share the stats
      val nf = fstats.groupBy("layout").agg(count(lit(1)).as("n_files"))
      val probes = li.distinct()
        .orderBy(md5(concat_ws(":", col("l_partkey"), col("l_suppkey"))),
          col("l_partkey"), col("l_suppkey"))
        .limit(10)
        .select(col("l_partkey").as("ppk"), col("l_suppkey").as("psk"))
      fstats.join(broadcast(probes),
          col("ppk") >= col("fmin_pk") && col("ppk") <= col("fmax_pk") &&
          col("psk") >= col("fmin_sk") && col("psk") <= col("fmax_sk"))
        .groupBy("layout", "ppk", "psk")
        .agg(count(lit(1)).as("n_candidate_files"))
        .join(broadcast(nf), "layout")
        .select("layout", "ppk", "psk", "n_files", "n_candidate_files")
        .orderBy("layout", "ppk", "psk")
    }),

    // HILBERT-CURVE LAYOUT vs Z-ORDER — the second space-filling curve
    // beside q129's Morton: Hilbert preserves locality strictly better
    // (every curve step is an adjacent cell; Morton takes long jumps at
    // quadrant seams), which is why Databricks' liquid clustering moved
    // from z-order to Hilbert. Orders are range-binned to a 16×16 grid
    // (custkey × order date, broadcast min/max stats — q129's
    // value-range assignment, no rank window), the cell maps to its
    // Hilbert and Morton positions through a 256-row broadcast lookup
    // generated by ONE Scala curve walk (the same array also renders
    // the oracle's VALUES literal, so the two engines share the exact
    // curve — the q301 generated-both-sides discipline), and each
    // layout assigns 13 cells per file (curve position DIV 13). The 13
    // is deliberate: at power-of-4-ALIGNED file sizes (16 cells) both
    // curves emit perfect 4×4 quadrants and tie — the Hilbert
    // advantage is precisely at unaligned split points, where Morton's
    // quadrant-seam jumps blow up the box (measured on this grid:
    // total bbox 370 vs 588 at 13 cells/file) and real file sizes are
    // never aligned to the curve. The verdict is in the output:
    // per-file bounding-box AREA — Hilbert files bound both dims
    // tighter, which at 100 TB is directly the min/max-skipping win on
    // two-dim point/range predicates. All binning integer-exact; the
    // lookup is O(grid), never O(rows).
    "q319_hilbert_layout" -> ((s, d) => {
      import s.implicits._
      val o = ld(s, d, "orders")
      val stats = o.agg(
        min("o_custkey").as("min_c"), max("o_custkey").as("max_c"),
        min(col("o_orderdate").cast("date")).as("min_d"),
        max(col("o_orderdate").cast("date")).as("max_d"))
      val binned = o.crossJoin(broadcast(stats)).selectExpr(
          "CAST((o_custkey - min_c) * 16 DIV (max_c - min_c + 1)" +
            " AS BIGINT) AS xb",
          "CAST(datediff(CAST(o_orderdate AS DATE), min_d) * 16" +
            " DIV (datediff(max_d, min_d) + 1) AS BIGINT) AS yb")
        .selectExpr("xb", "yb", "xb * 16 + yb AS cell")
      val lut = curve256
        .map { case (c, h, z) => (c.toLong, h.toLong, z.toLong) }
        .toDF("cell", "hd", "zd")
      // one corpus pass for BOTH layouts: each row explodes into its
      // two (layout, file) tags instead of a per-layout union that
      // would scan orders twice (plan-pinned: exactly one parquet scan)
      binned.join(broadcast(lut), Seq("cell"))
        .select(col("xb"), col("yb"), explode(array(
          struct(lit("hilbert").as("layout"),
            expr("hd DIV 13").as("file_id")),
          struct(lit("zorder").as("layout"),
            expr("zd DIV 13").as("file_id")))).as("lf"))
        .select(col("lf.layout").as("layout"),
          col("lf.file_id").as("file_id"), col("xb"), col("yb"))
        .groupBy("layout", "file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("xb").as("min_xb"), max("xb").as("max_xb"),
          min("yb").as("min_yb"), max("yb").as("max_yb"))
        .withColumn("bbox_area", expr(
          "(max_xb - min_xb + 1) * (max_yb - min_yb + 1)"))
        .orderBy("layout", "file_id")
    }),

    // DELTA-ENCODING BIT-WIDTH AUDIT — which sort order makes the ts
    // column cheapest to store? Parquet's DELTA_BINARY_PACKED wins
    // exactly when consecutive deltas are small, so the audit computes,
    // per candidate layout, the exact bit-width a delta stream needs:
    // bits(Δ) = length(bin(Δ)) (an ENGINE-EXACT integer log2 — no
    // floats), partition leaders charged the full 64 bits. Layouts
    // model the page-local reality of columnar encoding (deltas only
    // ever span a page, never the corpus): 'time_clustered' deltas
    // within each day (the q322 segmentation), 'user_clustered' within
    // each user — BOTH windows partition-bounded, no global sort — and
    // 'plain' is the 64-bit baseline. Output per layout: value count,
    // total bits, bytes vs plain, and the compression ratio in bp.
    // This is the storage-planning twin of q319's read-locality audit:
    // q319 picks the layout for SKIPPING, this prices the same
    // decision for ENCODING.
    "q328_bitwidth_audit" -> ((s, d) => {
      val us = ld(s, d, "events")
        .select(unix_micros(col("ts")).as("us"), col("event_id"),
          col("user_id"),
          expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"))
      def layout(name: String, part: String) = {
        val w = Window.partitionBy(part).orderBy("us", "event_id")
        us.withColumn("delta", col("us") - lag("us", 1).over(w))
          .selectExpr(s"'$name' AS layout",
            "CASE WHEN delta IS NULL THEN 64" +
              " ELSE length(bin(delta)) END AS bits")
      }
      layout("time_clustered", "day")
        .unionByName(layout("user_clustered", "user_id"))
        .unionByName(us.selectExpr("'plain' AS layout", "64 AS bits"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_values"),
          sum(col("bits").cast("long")).as("total_bits"))
        .selectExpr("layout", "n_values", "total_bits",
          "(total_bits + 7) DIV 8 AS enc_bytes",
          "8 * n_values AS plain_bytes",
          "(10000 * total_bits) DIV (64 * n_values) AS ratio_bp")
        .orderBy("layout")
    }),

    // CSV MALFORMED-RECORD MODES — the ingestion-robustness contract
    // q304's JSON dead-letter split expressed for the CSV reader's
    // BUILT-IN modes: the same deterministically corrupted feed (every
    // 37th record loses its numeric field to a stray token) read twice
    // — PERMISSIVE keeps every row and surfaces breakage as nulls +
    // _corrupt_record (count them, never silently absorb), while
    // DROPMALFORMED returns the clean subset only. Emitting BOTH
    // modes' row/violation counts side by side is the audit a feed
    // owner signs off on before choosing a mode. The corrupted file is
    // written once per run (overwrite, per-sf path); the oracle
    // re-derives every count from the injection rule itself.
    "q335_csv_malformed" -> ((s, d) => {
      val path = outDir(d, "orders_dirty_csv")
      ld(s, d, "orders")
        .selectExpr("o_orderkey",
          "CASE WHEN o_orderkey % 37 = 0 THEN 'oops'" +
            " ELSE CAST(o_custkey AS STRING) END AS custkey_raw",
          "o_orderpriority")
        .selectExpr(
          "concat_ws(',', CAST(o_orderkey AS STRING), custkey_raw," +
            " o_orderpriority) AS line")
        .coalesce(1).write.mode("overwrite").text(path)
      val schema = "o_orderkey BIGINT, o_custkey BIGINT," +
        " o_orderpriority STRING, _corrupt_record STRING"
      val permissive = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .agg(lit("permissive").as("mode"), count(lit(1)).as("n_rows"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(col("o_custkey")).as("custkey_sum"))
      val dropm = s.read
        .schema("o_orderkey BIGINT, o_custkey BIGINT," +
          " o_orderpriority STRING")
        .option("mode", "DROPMALFORMED").csv(path)
        .agg(lit("dropmalformed").as("mode"), count(lit(1)).as("n_rows"),
          lit(0L).as("n_corrupt"), sum(col("o_custkey")).as("custkey_sum"))
      permissive.unionByName(dropm).orderBy("mode")
    }),

    // DYNAMIC PARTITION OVERWRITE — the lakehouse write semantics that
    // makes partitioned re-runs safe: with partitionOverwriteMode=
    // dynamic, INSERT OVERWRITE replaces ONLY the partitions the new
    // data touches and leaves every other partition's files intact
    // (static mode would truncate the whole table — the classic
    // accidental-wipe). Sequence: full write of the per-flag rollup,
    // then a dynamic overwrite of flag 'R' alone with reduced rows;
    // the read-back must show R's new content beside A/N's ORIGINAL
    // content. At 100 TB this is how daily reprocessing replaces one
    // day-partition under a table serving reads.
    "q336_dynamic_partition_overwrite" -> ((s, d) => {
      val path = outDir(d, "li_flag_dyn")
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.get(conf)
      try {
        val rollup = ld(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
        rollup.write.mode("overwrite")
          .partitionBy("l_returnflag").parquet(path)
        s.conf.set(conf, "dynamic")
        rollup.filter(col("l_returnflag") === "R")
          .withColumn("n", col("n") * 0L) // the "reprocessed" day: zeroed
          .write.mode("overwrite")
          .partitionBy("l_returnflag").parquet(path)
        s.read.parquet(path)
          .select(col("l_returnflag"), col("l_linestatus"), col("n"),
            col("qty"))
          .orderBy("l_returnflag", "l_linestatus")
      } finally s.conf.set(conf, prev)
    }),
  )

  /** Hilbert xy→d for the 16×16 grid plus the 4-bit Morton code, one
    * walk over the 256 cells — the single source of truth for BOTH the
    * Spark lookup frame and the oracle's VALUES literal. Algorithm is
    * the standard quadrant-rotate form (Hamilton 2006 / Wikipedia's
    * xy2d). */
  private[queries] lazy val curve256: Seq[(Int, Int, Int)] = {
    def xy2d(xIn: Int, yIn: Int): Int = {
      var (x, y, d) = (xIn, yIn, 0)
      var s = 8
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) { // rotate quadrant
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    for { x <- 0 until 16; y <- 0 until 16 } yield {
      val z = (0 until 4).map(b =>
        (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))).sum
      (x * 16 + y, xy2d(x, y), z)
    }
  }

  private[queries] lazy val curveValues: String = curve256
    .map { case (c, h, z) => s"($c, $h, $z)" }.mkString(", ")

  /** 16-bit × 16-bit Morton interleave over normalized coords `xb`,`yb` —
    * built once and spliced VERBATIM into both the Spark plan and the
    * DuckDB oracle (`&`/`<<`/`>>` parse identically in both dialects;
    * only integer division differs: Spark `DIV` vs DuckDB `//`). */
  private[queries] val zInterleave: String = (0 until 16).map(b =>
    s"(((xb >> $b) & 1) << ${2 * b}) + (((yb >> $b) & 1) << ${2 * b + 1})")
    .mkString(" + ")

  val oracle: Map[String, String] = Map(
    // q319: the lut VALUES literal is rendered from the SAME Scala
    // curve walk the Spark side joins against — zero drift possible.
    "q319_hilbert_layout" ->
      s"""WITH st AS (SELECT min(o_custkey) AS min_c,
                             max(o_custkey) AS max_c,
                             min(CAST(o_orderdate AS DATE)) AS min_d,
                             max(CAST(o_orderdate AS DATE)) AS max_d
                      FROM orders),
              b AS (SELECT (o_custkey - min_c) * 16
                             // (max_c - min_c + 1) AS xb,
                           (CAST(o_orderdate AS DATE) - min_d) * 16
                             // ((max_d - min_d) + 1) AS yb
                    FROM orders CROSS JOIN st),
              lut(cell, hd, zd) AS (VALUES $curveValues),
              t AS (SELECT xb, yb, hd, zd FROM b
                    JOIN lut ON xb * 16 + yb = lut.cell),
              f AS (SELECT 'hilbert' AS layout, hd // 13 AS file_id,
                           xb, yb FROM t
                    UNION ALL
                    SELECT 'zorder', zd // 13, xb, yb FROM t)
         SELECT layout, CAST(file_id AS BIGINT) AS file_id,
                count(*) AS n_rows,
                CAST(min(xb) AS BIGINT) AS min_xb,
                CAST(max(xb) AS BIGINT) AS max_xb,
                CAST(min(yb) AS BIGINT) AS min_yb,
                CAST(max(yb) AS BIGINT) AS max_yb,
                CAST((max(xb) - min(xb) + 1) * (max(yb) - min(yb) + 1)
                     AS BIGINT) AS bbox_area
         FROM f GROUP BY 1, 2 ORDER BY 1, 2""",

    // q335: every count re-derived from the injection rule itself.
    "q335_csv_malformed" ->
      """WITH base AS (SELECT o_orderkey, o_custkey,
                              (o_orderkey % 37 = 0) AS bad
                       FROM orders)
         SELECT * FROM (
           SELECT 'dropmalformed' AS mode,
                  CAST(count(*) FILTER (NOT bad) AS BIGINT) AS n_rows,
                  CAST(0 AS BIGINT) AS n_corrupt,
                  CAST(sum(o_custkey) FILTER (NOT bad) AS BIGINT)
                    AS custkey_sum
           FROM base
           UNION ALL
           SELECT 'permissive', CAST(count(*) AS BIGINT),
                  CAST(count(*) FILTER (bad) AS BIGINT),
                  CAST(sum(o_custkey) FILTER (NOT bad) AS BIGINT)
           FROM base)
         ORDER BY mode""",

    // q336: R's n zeroed by the dynamic overwrite, everything else as
    // originally written — partition isolation proven by equality.
    "q336_dynamic_partition_overwrite" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CASE WHEN l_returnflag = 'R' THEN 0
                     ELSE count(*) END AS BIGINT) AS n,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    // q328: same bin()-length bit-width, same partition-bounded lags.
    "q328_bitwidth_audit" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_id, user_id,
                           CAST(CAST(ts AS DATE) AS VARCHAR) AS day
                    FROM events),
              t AS (
                SELECT 'time_clustered' AS layout,
                       CASE WHEN lag(us) OVER w1 IS NULL THEN 64
                            ELSE length(bin(us - lag(us) OVER w1))
                       END AS bits
                FROM e WINDOW w1 AS (PARTITION BY day
                                     ORDER BY us, event_id)
                UNION ALL
                SELECT 'user_clustered',
                       CASE WHEN lag(us) OVER w2 IS NULL THEN 64
                            ELSE length(bin(us - lag(us) OVER w2))
                       END
                FROM e WINDOW w2 AS (PARTITION BY user_id
                                     ORDER BY us, event_id)
                UNION ALL
                SELECT 'plain', 64 FROM e)
         SELECT layout, CAST(count(*) AS BIGINT) AS n_values,
                CAST(sum(bits) AS BIGINT) AS total_bits,
                CAST((sum(bits) + 7) // 8 AS BIGINT) AS enc_bytes,
                CAST(8 * count(*) AS BIGINT) AS plain_bytes,
                CAST((10000 * sum(bits)) // (64 * count(*)) AS BIGINT)
                  AS ratio_bp
         FROM t GROUP BY 1 ORDER BY 1""",

    "q88_json_roundtrip" ->
      """SELECT user_id % 10 AS user_band, count(*) AS n,
                CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                     AS DOUBLE) / 100 AS tot_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY user_band""",
    "q140_schema_evolution" ->
      """WITH ev AS (SELECT doc_id, source, n_chars, NULL AS lang
                     FROM documents WHERE doc_id % 2 = 0
                     UNION ALL
                     SELECT doc_id, source, n_chars, lang
                     FROM documents WHERE doc_id % 2 = 1)
         SELECT source, lang, count(*) AS n,
                CAST(sum(n_chars) AS BIGINT) AS tot_chars
         FROM ev GROUP BY 1, 2 ORDER BY source, lang""",
    "q89_orc_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS tot
         FROM orders WHERE o_totalprice > 300000
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q90_parquet_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_price
         FROM lineitem WHERE l_quantity > 45
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q91_csv_roundtrip" ->
      """SELECT o_custkey % 10 AS cust_band, count(*) AS n,
                round(sum(o_totalprice), 2) AS tot
         FROM orders WHERE o_totalprice > 400000
         GROUP BY 1 ORDER BY cust_band""",
    "q92_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
                round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q93_partition_pruning" ->
      """SELECT user_id % 100 AS user_band, count(*) AS n,
                round(sum(value), 2) AS tot
         FROM events WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY user_band""",
    // compaction must be content-invisible: oracle aggregates the source
    "q100_compact_small_files" ->
      """SELECT o_orderpriority, count(*) AS n,
                CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS tot,
                min(o_orderkey) AS min_k, max(o_orderkey) AS max_k
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // Both layouts recomputed from the SOURCE (the z-ordered side in
    // Spark aggregates the read-back, so a green row proves the physical
    // layout roundtripped); identical Morton expression, '//' for DIV.
    "q129_zorder_layout" ->
      s"""WITH st AS (SELECT min(l_partkey) AS min_pk,
                             max(l_partkey) AS max_pk,
                             min(l_suppkey) AS min_sk,
                             max(l_suppkey) AS max_sk
                      FROM lineitem),
              b AS (SELECT l_partkey, l_suppkey,
                           (l_partkey - min_pk) * 65536
                             // (max_pk - min_pk + 1) AS xb,
                           (l_suppkey - min_sk) * 65536
                             // (max_sk - min_sk + 1) AS yb
                    FROM lineitem CROSS JOIN st),
              zb AS (SELECT l_partkey, l_suppkey, xb,
                            ($zInterleave) AS z
                     FROM b),
              f AS (SELECT 'zorder' AS layout, z >> 28 AS file_id,
                           l_partkey, l_suppkey
                    FROM zb
                    UNION ALL
                    SELECT 'linear', xb >> 12, l_partkey, l_suppkey
                    FROM zb)
         SELECT layout, file_id, count(*) AS n_rows,
                min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
                min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         FROM f GROUP BY 1, 2 ORDER BY 1, 2""",
    "q196_xml_roundtrip" ->
      """SELECT p_brand, count(*) AS n,
                CAST(sum(CAST(CAST(p_retailprice AS DECIMAL(14,2)) * 100
                              AS BIGINT)) AS DOUBLE) / 100 AS tot
         FROM part WHERE p_retailprice > 950
         GROUP BY p_brand ORDER BY p_brand""",
    "q246_skipping_audit" ->
      s"""WITH st AS (SELECT min(l_partkey) AS min_pk,
                             max(l_partkey) AS max_pk,
                             min(l_suppkey) AS min_sk,
                             max(l_suppkey) AS max_sk
                      FROM lineitem),
              b AS (SELECT l_partkey, l_suppkey,
                           (l_partkey - min_pk) * 65536
                             // (max_pk - min_pk + 1) AS xb,
                           (l_suppkey - min_sk) * 65536
                             // (max_sk - min_sk + 1) AS yb
                    FROM lineitem CROSS JOIN st),
              zb AS (SELECT l_partkey, l_suppkey, xb,
                            ($zInterleave) AS z
                     FROM b),
              f AS (SELECT 'zorder' AS layout, z >> 28 AS file_id,
                           l_partkey, l_suppkey
                    FROM zb
                    UNION ALL
                    SELECT 'linear', xb >> 12, l_partkey, l_suppkey
                    FROM zb),
              fs AS MATERIALIZED (
                    SELECT layout, file_id,
                           min(l_partkey) AS fmin_pk,
                           max(l_partkey) AS fmax_pk,
                           min(l_suppkey) AS fmin_sk,
                           max(l_suppkey) AS fmax_sk
                    FROM f GROUP BY 1, 2),
              nf AS (SELECT layout, count(*) AS n_files FROM fs
                     GROUP BY 1),
              probes AS MATERIALIZED (
                    SELECT l_partkey AS ppk, l_suppkey AS psk
                    FROM (SELECT DISTINCT l_partkey, l_suppkey
                          FROM lineitem)
                    ORDER BY md5(l_partkey::VARCHAR || ':' ||
                                 l_suppkey::VARCHAR),
                             l_partkey, l_suppkey
                    LIMIT 10)
         SELECT fs.layout, ppk, psk, CAST(n_files AS BIGINT) AS n_files,
                CAST(count(*) AS BIGINT) AS n_candidate_files
         FROM fs JOIN probes
           ON ppk >= fmin_pk AND ppk <= fmax_pk
          AND psk >= fmin_sk AND psk <= fmax_sk
         JOIN nf ON fs.layout = nf.layout
         GROUP BY fs.layout, ppk, psk, n_files
         ORDER BY fs.layout, ppk, psk""",
  )
}
