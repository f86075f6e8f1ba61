package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the scale properties the engine is
  * designed around must be visible in `explain` — filters and projections
  * reaching the parquet scan, small dims broadcast, partial aggregation.
  * These pin the plan, not just the result, so a regression that keeps
  * answers right but destroys the 100 TB story fails the build.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: filter is pushed down to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("GreaterThan(l_quantity") || p.contains("l_quantity"),
      "quantity filter must reach the scan")
  }

  test("q01: scan reads only the three projected columns") {
    val p = plan("q01_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_linenumber") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"column pruning failed: $readSchema")
  }

  test("q10: dimension join is a broadcast join (no fact-side shuffle)") {
    assert(plan("q10_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q06: aggregation is partial+final (map-side combine)") {
    val p = plan("q06_agg_group")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial and final HashAggregate")
  }

  test("q47: simhash plan has exactly one shuffle (the doc_id groupBy)") {
    val p = plan("q47_simhash")
    // count node headers in the details section ("(5) Exchange"), not raw
    // substring hits — formatted explain prints each node twice
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    // one hash exchange for the groupBy + one range exchange for the sort
    assert(exchanges <= 2, s"unexpected extra shuffles ($exchanges):\n$p")
  }

  test("q45: shingle pipeline is computed once — plan scans documents " +
    "at most twice (r3 rebuilt it 4x)") {
    val p = plan("q45_ngram_jaccard")
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans <= 2, s"shingle recompute is back ($scans scans):\n$p")
  }

  test("q46: no BroadcastExchange anywhere — the signature table is " +
    "corpus-sized and must reach the estimate joins via keyed shuffle") {
    val p = plan("q46_minhash_lsh")
    assert(!p.contains("BroadcastExchange"),
      s"corpus-sized broadcast regressed:\n$p")
  }

  test("q94: incremental dedup anti-join is a keyed shuffle, not a " +
    "seen-set broadcast (the seen-set is the whole historical corpus)") {
    val p = plan("q94_incremental_dedup")
    assert(!p.contains("BroadcastExchange"),
      s"seen-set broadcast would die at scale:\n$p")
    assert(p.contains("LeftAnti"), "anti-join missing")
  }

  test("q98: gram pipeline behind one reusable exchange — at most 3 " +
    "documents scans in the static plan (gram subtree x2 dedup'd by the " +
    "AQE stage cache + the cheap final 2-column scan)") {
    val p = plan("q98_decontaminate")
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans <= 3, s"gram recompute crept in ($scans scans):\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"benchmark gram set must shuffle, not broadcast:\n$p")
  }

  test("q62: pair join is broadcast nested-loop over pre-cast arrays " +
    "(no per-pair cast)") {
    val p = plan("q62_embed_neardup")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("graft_dot"), "native DotProduct must be in the plan")
  }

  test("q67: banded simhash near-dup has NO nested-loop join — candidates " +
    "come from the band-bucket equi-join") {
    val p = plan("q67_simhash_banded")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"pair space must stay bucketed:\n$p")
    assert(p.contains("band_val"), "bucket join key missing from the plan")
  }

  test("q68: banded embed near-dup joins the pair space only via the " +
    "band-key equi-join (BNLJ appears only as 1-row stats broadcasts)") {
    val p = plan("q68_neardup_rerank")
    // the int8 stats attach via crossJoin(broadcast(1-row)) — same shape as
    // q56's percentile gate; what must NOT happen is a nested loop whose
    // both sides are the corpus. Every corpus×corpus contact is an
    // equi-join on (band_idx, band_val) or on vec_id.
    val bnlj = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(p).size
    assert(bnlj <= 2, s"unexpected pair-space nested loop ($bnlj):\n$p")
    assert(p.contains("band_val"), "bucket join key missing from the plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q92: bucketed sort-merge join needs no join-side Exchange") {
    val p = plan("q92_bucketed_join")
    assert(p.contains("SortMergeJoin"))
    // only the aggregation exchange + the final orderBy range exchange —
    // the join itself reads co-located buckets
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges == 2, s"bucket co-location lost ($exchanges exchanges):\n$p")
  }

  test("q86: salted skew join is a shuffled-hash join on (key, salt) — " +
    "no broadcast hiding the skew story") {
    val p = plan("q86_skew_salted_join")
    assert(p.contains("ShuffledHashJoin"), p.take(800))
    assert(!p.contains("BroadcastHashJoin"),
      "dim side must not broadcast — salting is the portable skew fix")
    assert(p.contains("salt"), "join keys must include the salt")
  }

  test("q87: exact percentiles run as streaming window rank, not an " +
    "ordered-set aggregate buffering group values") {
    val p = plan("q87_length_quantiles")
    assert(p.contains("Window"), p.take(800))
    assert(!p.toLowerCase.contains("percentile"),
      "must not fall back to Spark's in-memory percentile aggregate")
    // group sizes join back via broadcast (20 rows), fact shuffles once
    assert(p.contains("BroadcastHashJoin"), "sizes dim should broadcast")
  }

  test("q99: runtime bloom filter prunes the fact scan before its shuffle") {
    val p = plan("q99_runtime_filter_join")
    assert(p.contains("bloom_filter_agg"),
      "expected a bloom filter built over the filtered orders keys")
    assert(p.contains("might_contain"),
      "expected might_contain applied to the lineitem side")
  }

  test("q110: explicit bloom prefilter drops corpus grams BEFORE the " +
    "g5 exchange (fused into the pre-shuffle gram filter), and the exact " +
    "semi-join confirm survives") {
    val p = plan("q110_bloom_decontaminate")
    // r15: the map-side gram build (see TextOps.shingles) collapses the
    // lead projections, so the fused filter reads isnotnull(toks#..[(pos
    // + 4)]) instead of isnotnull(t4#..) — accept either spelling; the
    // property (bloom prunes inside the gram-build Filter, below every
    // Exchange) is unchanged.
    val fused = p.linesIterator.exists(l =>
      l.contains("might_contain") &&
        (l.contains("isnotnull(t4") ||
          (l.contains("isnotnull(toks") && l.contains("+ 4)])"))))
    assert(fused,
      s"bloom must prune in the gram-build filter, before any Exchange:\n$p")
    assert(p.contains("LeftSemi"),
      "exact confirm join missing — bloom false positives would leak")
  }

  test("q111: semantic-dedup pair join is an equi-join on cluster id, " +
    "never a pair-space nested loop, and the assignment subtree closes " +
    "with one shared cid Exchange") {
    val p = plan("q111_semdedup")
    assert(!p.contains("CartesianProduct"))
    // Identify the pair join POSITIVELY instead of bounding the BNLJ count
    // (r7 asserted bnlj <= 6, which a regressed corpus-pair BNLJ could
    // slip under if a centroid-attach BNLJ disappeared): the corpus×corpus
    // contact must be an Inner HASH equi-join keyed on cid on BOTH sides.
    // The centroid-attach BNLJs that remain are k×4-row broadcasts — fine.
    val pairJoin =
      """\(\d+\) (ShuffledHashJoin|SortMergeJoin)\s*\nLeft keys \[1\]: \[cid#\d+L?\]\s*\nRight keys \[1\]: \[cid#\d+L?\]\s*\nJoin type: Inner""".r
    assert(pairJoin.findFirstIn(p).isDefined,
      s"pair join must be an Inner hash equi-join on cid:\n$p")
    assert(p.contains("hashpartitioning(cid"),
      s"pair-join sides must arrive co-partitioned on cid:\n$p")
  }

  test("q115: frame dHash near-dup pairs only via the band-bucket " +
    "equi-join — no corpus broadcast, no nested loop") {
    val p = plan("q115_frame_neardup")
    assert(!p.contains("BroadcastExchange"),
      s"frame-signature broadcast would die at corpus scale:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"pair space must stay bucketed:\n$p")
    assert(p.contains("band_val"), "bucket join key missing from the plan")
  }

  test("q118: span scrub marks coverage via keyed shuffles — no " +
    "corpus-fraction broadcast") {
    val p = plan("q118_span_scrub")
    assert(!p.contains("BroadcastExchange"),
      s"span-start frame must shuffle, not broadcast:\n$p")
    assert(p.contains("LeftSemi"), "hot-gram semi-join missing")
  }

  test("q125: composed IVF×PQ restricts the ADC scan to probed lists — " +
    "broadcast list join before the per-neighbor aggregate, no " +
    "pair-space product") {
    val p = plan("q125_ann_ivf_pq")
    // the (q_id, cid) probe frame joins the code scan on cid via
    // broadcast BEFORE any ADC aggregation: with nprobe < nlist the
    // full-corpus ADC never runs (at 100 TB this join is the partition
    // prune over cid-partitioned codes)
    val bhjBlocks = p.split("BroadcastHashJoin").drop(1)
    assert(bhjBlocks.exists(_.take(120).contains("[cid#")),
      s"ADC scan must join the probed-list frame on cid:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "no unkeyed products")
    // the only BNLJ crosses are the tiny-broadcast argmin/probe products
    // (corpus × 8 centroids, probes × centroids) — the kAssign pattern
    assert(p.linesIterator.count(_.matches("""\(\d+\) BroadcastNestedLoopJoin""")) <= 4,
      "unexpected extra cross joins")
  }

  test("q117: composed curation chain keeps its stage joins keyed — " +
    "no pair-space product anywhere in the chain") {
    // r9: q117/q123 consume a SHARED checkpointed derivation, so the
    // five-stage chain no longer appears in the query's own plan. Guard
    // the chain on the un-pinned derivation (identity pin = the same
    // stage-building code composed into one plan).
    val st = graft.queries.PipelineOps.curationStages(spark, sfDir)
    val p = st.admitted.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), "stage chain must stay keyed")
    assert(p.contains("LeftSemi"), "decontamination gram contact missing")
    assert(p.contains("LeftAnti"), "contaminated-doc drop missing")
  }

  test("q117/q123 consume ONE shared checkpointed derivation — the " +
    "consumer plan scans materialized frames, not the re-derived chain") {
    val p117 = plan("q117_curation_pipeline")
    val p123 = plan("q123_curation_audit")
    // Both consumers read checkpointed RDD scans; neither re-runs the
    // five-stage chain (no gram semi-join in the consume-side plan).
    assert(p117.contains("Scan ExistingRDD"), p117.take(800))
    assert(p123.contains("Scan ExistingRDD"), p123.take(800))
    assert(!p117.contains("LeftSemi"),
      "q117 must consume the checkpointed admitted frame, not re-derive")
  }

  test("q132: interval join is a keyed equi-join on (user, cell) — " +
    "never a per-user BNLJ over the interval space") {
    val p = plan("q132_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "range join degenerated to a product")
    val shjBlocks = p.split("ShuffledHashJoin").drop(1)
    assert(shjBlocks.exists(b => b.take(160).contains("user_id#") &&
      b.take(160).contains("cell#")),
      s"pair join must be keyed on (user_id, cell):\n${p.take(1000)}")
  }

  test("q133: BM25 broadcasts only the 10-row query frame; posting and " +
    "dl joins stay shuffled") {
    val p = plan("q133_bm25")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 1,
      "exactly one broadcast: the derived query terms")
    assert(p.contains("ShuffledHashJoin"), "dl join must not broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must be TakeOrdered")
  }

  test("q134: triangle wedges join on the apex and close with a LEFT " +
    "SEMI probe — no corpus broadcast, no product") {
    // Coverage limit: the edge list is localCheckpoint'd inside the query,
    // which truncates lineage — the eagerly-executed BUILD side (the ps
    // self-join and the intentional 1-row nparts broadcast cross) is not
    // visible to these assertions. They guard the wedge/closing consume
    // side only; the build side's shape is documented in the query comment
    // (same stance as q131's Plans.scala note).
    val p = plan("q134_triangle_count")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "wedge join degenerated")
    assert(p.contains("LeftSemi"), "closing-edge probe must be a semi join")
  }

  test("q135: weighted sample rides TakeOrderedAndProject — no global " +
    "sort of the ticket frame") {
    val p = plan("q135_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("q136: exact-Jaccard candidates come from the prefix equi-join — " +
    "no all-pairs product anywhere") {
    val p = plan("q136_jaccard_prefix")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "prefix filter bypassed")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) ShuffledHashJoin""")) >= 3,
      "prefix self-join + two verify joins must stay keyed")
  }

  test("q145: point-in-time lookup is ONE custkey-keyed window pass over " +
    "the version∪fact union — never a per-fact range join or product") {
    val p = plan("q145_pit_lookup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "PIT lookup degenerated to a range join/product")
    // The carry-forward pass: exactly one Union feeding a
    // hashpartitioning(custkey) exchange, then a Window.
    assert(p.linesIterator.count(_.matches("""\(\d+\) Union""")) == 1)
    assert(p.contains("hashpartitioning(custkey"),
      "carry-forward window must partition by custkey")
    // Two windows total: version cumsum + the carry-forward last().
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "expected the cumsum window and one carry-forward window only")
  }

  test("q146: entity-resolution candidates come from the two keyed " +
    "blocking self-joins, dedup runs NARROW (pk-pair projection before " +
    "the distinct), and attrs are fetched once after — no all-pairs " +
    "product, everything shuffled") {
    val p = plan("q146_entity_resolution")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "blocking bypassed: pair product")
    // 2 blocking self-joins + 2 post-dedup attr-fetch joins
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) ShuffledHashJoin""")) == 4,
      "expected two blocking passes + two attr-fetch joins, all shuffled")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Union""")) == 1,
      "multi-pass union missing")
    // the dedup aggregate must key on exactly (a_pk, b_pk) — the narrow
    // form; full-width dedup would list every entity column here
    assert(p.matches("""(?s).*Keys \[2\]: \[a_pk#\d+L, b_pk#\d+L\].*"""),
      "pair dedup must be narrow on (a_pk, b_pk)")
  }

  test("q148: CMS consumers read the pinned vocab — the corpus token " +
    "groupBy is checkpointed once, no parquet re-scan per consumer") {
    // Coverage limit: "Scan parquet == 0" holds BECAUSE the vocab frame is
    // localCheckpoint'd — the corpus-scale tokenize+groupBy that built it
    // runs eagerly and is lineage-truncated out of this plan. The guard
    // proves consumers share the pin; the build side's one-shuffle shape
    // is documented in the query comment.
    val p = plan("q148_heavy_hitters_cms")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")) == 0,
      "a consumer re-derived the vocab from the raw corpus")
    assert(p.contains("Scan ExistingRDD"), "pinned vocab frame missing")
  }

  test("q149: transition matrix rides ONE corpus-scale shuffle (the " +
    "user_id session window); later stages are matrix-sized") {
    val p = plan("q149_session_transitions")
    assert(p.contains("hashpartitioning(user_id"),
      "session window must partition by user_id")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "expected the lag window and the from_type share window only")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")) == 1,
      "events must be scanned once")
  }

  test("q139: sequence packing shuffles once for the per-source window " +
    "(plus only the presentation sort)") {
    val p = plan("q139_sequence_pack")
    // Exchange 1 = hashpartitioning(source) for the running-sum window;
    // Exchange 2 = rangepartitioning for the deterministic output ORDER BY
    // (driver-compare presentation, not part of the packing computation).
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges == 2, s"expected window + output-sort Exchanges, " +
      s"got $exchanges")
    assert(p.contains("hashpartitioning(source"),
      "window must partition by source")
    assert(p.contains("Generate"), "window-span explode missing")
  }

  test("q150: winsorized stats ride ONE corpus shuffle (the source rank " +
    "window); the cuts frame joins back by broadcast, never a shuffle") {
    val p = plan("q150_winsorized_stats")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "clamp join degenerated")
    assert(p.contains("hashpartitioning(source"),
      "rank window must partition by source")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "expected the row_number window and the per-source count window only")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1,
      "cuts must come back as a broadcast hash join")
  }

  test("q151: temperature mixture scans the corpus once in the final " +
    "plan — the per-source totals frame is pinned, not re-derived") {
    val p = plan("q151_temperature_mixture")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*""")) == 1,
      "targets side re-scanned the corpus instead of reading the pin")
    assert(p.contains("Scan ExistingRDD"), "pinned totals frame missing")
    assert(p.contains("hashpartitioning(source"),
      "admission window must partition by source")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1,
      "expected only the cumulative-admission window")
  }

  test("q93: re-scan of the partitioned write prunes to one partition") {
    val p = plan("q93_partition_pruning")
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, "expected PartitionFilters on the scan")
    assert(pf.get.contains("event_type"), pf.get)
  }

  test("graft_dot and graft_bands are SQL-callable after registerSql") {
    graft.functions.VectorExprs.registerSql(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
    val b = spark.sql(
      """SELECT graft_bands(array(3.0d, 2.0d),
                            array(array(1.0d, 0.0d), array(0.0d, -1.0d)),
                            1) AS b""")
      .head().getSeq[Int](0)
    // two 1-row bands: dot>0 → key 1, dot<0 → key 0
    assert(b == Seq(1, 0), s"got $b")
  }

  test("q152: rank fusion is a keyed full-outer merge over the two " +
    "staged-rank frames, offsets attach by broadcast, top-20 TakeOrdered") {
    val p = plan("q152_rrf_fusion")
    // r13: the two corpus-wide rankings run as staged global ranks
    // (Ranks.scala); their inputs (gram-overlap counts after the
    // broadcast query-gram semi-probe; cosine scores after the 1-row
    // query-vector broadcast cross) are materialized behind the staged
    // rank's eager pin, so the final plan shows the two bounded
    // bucket-offset BROADCASTS, the keyed fine-rank windows, and the
    // fusion — and may not contain a parquet scan or BNLJ at all.
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 2,
      "broadcast hash joins: the two staged-rank offset tables")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastNestedLoopJoin""")) == 0,
      "no pair-space product anywhere in the fusion plan")
    assert(p.contains("FullOuter"), "rank fusion must be a full-outer merge")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must be TakeOrdered")
  }

  test("q153: mutual-kNN consume side is the edge-list semi-join over the " +
    "pinned top-k frame — no product, no corpus scan") {
    // Coverage limit (q134's stance): codes/codebook/sdc/topk are
    // localCheckpoint'd — the PQ training and blocking joins run eagerly
    // in the build and are lineage-truncated out of this plan; without
    // those pins the four codes references re-expanded training into a
    // 64-scan / 129-Exchange plan (measured, comment at the query).
    val p = plan("q153_mutual_knn")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "mutuality join degenerated")
    assert(p.contains("LeftSemi"), "mutuality must be a semi join")
    assert(!p.contains("Scan parquet"), "consume side must read the pins")
  }

  test("q154: landmark match is a df-capped h-keyed inverted-index " +
    "self-join — keyed shuffles only, no product") {
    val p = plan("q154_audio_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "landmark join degenerated")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) ShuffledHashJoin""")) == 3,
      "df-prune join + the two inverted-index sides must stay shuffled")
    assert(p.contains("hashpartitioning(doc_id"),
      "peak/landmark windows must partition by doc_id")
  }

  test("q155: snapshot diff is ONE key-keyed full-outer join, no " +
    "broadcast of either snapshot") {
    val p = plan("q155_snapshot_diff")
    val shj = p.linesIterator
      .count(_.matches("""\(\d+\) (ShuffledHashJoin|SortMergeJoin)"""))
    assert(shj == 1, s"expected exactly one shuffled join, got $shj")
    assert(p.contains("FullOuter"), "diff join must be full-outer")
    assert(!p.contains("BroadcastHashJoin"),
      "neither snapshot may broadcast")
  }

  test("q157: sorted-neighborhood pairs come from the rank-arithmetic " +
    "equi-join behind noun-keyed windows — no product, no global sort " +
    "collapse") {
    val p = plan("q157_sorted_neighborhood")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), "rank pairing degenerated")
    assert(p.contains("hashpartitioning(noun") ||
      p.contains("hashpartitioning(a_noun"),
      "rank window must partition by the block key, not a global sort")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) ShuffledHashJoin""")) == 1,
      "the rank-distance pair join must stay keyed + shuffled")
  }

  test("q158: drift runs on the pinned vocab counts — corpus tokenized " +
    "once, totals as the only broadcast") {
    val p = plan("q158_token_drift")
    assert(!p.contains("Scan parquet"),
      "a consumer re-derived token counts from the raw corpus")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastNestedLoopJoin""")) == 1,
      "exactly one BNLJ: the 1-row totals broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-15 must be TakeOrdered")
  }

  test("q159: MaxSim broadcasts the 8-row query bag; max-then-sum are " +
    "partial+final aggregates over one exploded scan") {
    val p = plan("q159_late_interaction")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) Scan parquet.*""")) == 2,
      "one corpus scan + one query scan only")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) HashAggregate""")) >= 4,
      "max and sum must both run partial+final")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must be TakeOrdered")
  }

  test("q161: IVM merges base view and delta aggregates in custkey-keyed " +
    "joins — no broadcast of either aggregate side") {
    val p = plan("q161_incremental_agg")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) (ShuffledHashJoin|SortMergeJoin)""")) == 2,
      "expected the feed's full-outer + the view merge, both shuffled")
    // both the change-feed join and the view merge are FullOuter
    assert(p.linesIterator.count(_.contains("Join type: FullOuter")) == 2,
      "feed diff and view merge must both be full-outer")
    assert(!p.contains("BroadcastHashJoin"),
      "neither snapshot nor view side may broadcast")
  }

  test("q162: attribution rides ONE user_id shuffle — no self-join, " +
    "no product") {
    val p = plan("q162_attribution")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "attribution must not join")
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      "exactly one user_id Exchange feeds both touch windows")
    // Catalyst emits first() and last() as two ADJACENT Window nodes even
    // over the identical spec; the invariant that matters is that both ride
    // the single Exchange+Sort — so exactly two Sorts total (the window
    // sort + the final presentation sort), no re-sort between the windows.
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "first- and last-touch windows, nothing else")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Sort""")) == 2,
      "one window sort + the final ORDER BY only — no re-sort between " +
        "the two Window nodes")
  }

  test("q163: adaptive gate broadcasts the per-source cuts; the verdict " +
    "pass is map-only over a second scan") {
    val p = plan("q163_adaptive_gate")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 1,
      "cuts frame must broadcast")
    assert(p.contains("hashpartitioning(source"),
      "rank window must partition by source")
  }

  test("q160: k-anonymity levels are map-side-combined QI aggregates " +
    "with the nation dim broadcast — group keys shuffle, not rows") {
    val p = plan("q160_k_anonymity")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 2,
      "nation dim must broadcast on both levels")
    assert(p.contains("hashpartitioning(nat") &&
      p.contains("hashpartitioning(reg"),
      "each level shuffles its own QI keys")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q165: OLS min-day window and moment aggregate share ONE grp " +
    "Exchange — two Exchanges total (the other is the final sort)") {
    val p = plan("q165_group_trend_ols")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 2,
      "window + groupBy must reuse the grp partitioning")
    assert(p.contains("hashpartitioning(grp"), "grp-keyed shuffle expected")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "single-pass: no join anywhere")
  }

  test("q166: profiler is ONE scan + the two-phase distinct (partial " +
    "dedup keyed on (col_name, val) before the col_name agg)") {
    val p = plan("q166_column_profiler")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      "any-width profiling must stay a single table scan")
    assert(p.contains("hashpartitioning(col_name, val") ||
      p.contains("hashpartitioning(col_name#") ||
      p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 3,
      "distinct must shuffle (col_name, val) first, then col_name")
  }

  test("q167: inverted index build map-side-combines per-(term,doc) " +
    "before the term-keyed posting aggregate") {
    val p = plan("q167_inverted_index")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) (Object)?HashAggregate""")) == 4,
      "both levels must be partial+final")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "no join: df/cf/postings come from one aggregate")
  }

  test("q168: ring ownership is a broadcast array probe — no shuffled " +
    "join, no window, doc side never exchanged before the 1-row agg") {
    val p = plan("q168_consistent_hash")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastExchange""")) == 2,
      "both rings must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "ownership must not use a global-order window")
  }

  test("q169: expectation suite is one multi-metric agg + one broadcast " +
    "anti-join — three scans total, never one per constraint") {
    val p = plan("q169_expectation_suite")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) Scan parquet\s*""")) == 3,
      "orders twice (metrics + RI probe) and customer once")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      "referential check must be a broadcast anti-join")
  }

  test("q170: KS cumulative window runs over the DISTINCT-value frame " +
    "(below an aggregate), with the 1-row totals broadcast") {
    val p = plan("q170_ks_test")
    val lines = p.linesIterator.toSeq
    val win = lines.indexWhere(_.matches(""".*\(\d+\) Window.*"""))
    val agg = lines.indexWhere(_.matches(""".*\(\d+\) HashAggregate.*"""),
      win)
    assert(win >= 0 && agg > win,
      "window must consume the per-cents aggregate, not raw rows")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastExchange""")) == 1,
      "totals are the only broadcast")
  }

  test("q171: PMI joins are vocab-sized broadcasts over the thresholded " +
    "pair table; the top-50 cut is TakeOrdered, not a global sort") {
    val p = plan("q171_pmi_collocations")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 2,
      "both unigram joins must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q172: skew audit is two scans + map-side-combined group counts; " +
    "rank windows never see row data, and the only joins are the two " +
    "staged-rank offset broadcasts") {
    val p = plan("q172_skew_audit")
    // r13: the per-key count frames rank via Ranks.stagedGlobalRank —
    // their eager pins hide the parquet scans behind Scan ExistingRDD,
    // and each audit branch attaches its bounded offset table by
    // broadcast; no other join shape may appear
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) == 2,
      "exactly the two staged-rank offset broadcasts")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("NestedLoop"), "the audit must not join row data")
  }

  test("q173: merkle digests fold map-side and meet in ONE full-outer " +
    "merge of 17-number sides — no window, no corpus-sized join") {
    val p = plan("q173_table_checksum")
    assert(p.linesIterator.count(_.contains("Join type: FullOuter")) == 1,
      "exactly the level/bucket digest merge")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "order-invariant digests need no ordering")
  }

  test("q174: frequent pairs broadcast the item supports; the basket " +
    "self-join is keyed (no part×part product)") {
    val p = plan("q174_frequent_pairs")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) BroadcastHashJoin""")) >= 2,
      "item-support joins must broadcast")
    assert(!p.contains("CartesianProduct"),
      "pair generation must stay keyed on the order key")
  }

  test("q175: bot regularity rides ONE user_id shuffle — gap window and " +
    "per-user aggregate share it, no join") {
    val p = plan("q175_bot_regularity")
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      "window and aggregate must share the user_id Exchange")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
  }

  test("q176: DSIR model joins broadcast (feature-space-sized, never " +
    "the corpus); selection is a map expression, not a rank window") {
    val p = plan("q176_dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      "the 256-row model must broadcast into the per-doc scorer")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "selection must be the threshold expression, not a global rank")
    assert(!p.contains("SortMergeJoin"),
      "no corpus-sized shuffled join belongs in this plan")
  }

  test("q177: history pack rides ONE user_id shuffle — ordering window " +
    "and (user,window) aggregate share it (subset rule), no join") {
    val p = plan("q177_history_pack")
    assert(p.linesIterator.count(_.contains("hashpartitioning(user_id")) == 1,
      "window and aggregate must share the user_id Exchange")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) ObjectHashAggregate""")) >= 2,
      "collect_list must run partial+final on the shared partitioning")
  }

  test("q178: epoch reshard is one scan + stack Generate + one " +
    "partial+final aggregate — no join, no window") {
    val p = plan("q178_epoch_reshard")
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.matches("""(?s).*\(\d+\) Generate.*"""),
      "stack unpivot must be a Generate")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(p.linesIterator
      .count(_.matches("""\(\d+\) HashAggregate""")) >= 2,
      "balance counts must map-side combine")
  }

  test("q179: batch packing windows are partitioned per shard/band — " +
    "parallel batching, no global window, no join") {
    val p = plan("q179_length_bucket_batch")
    assert(p.contains("hashpartitioning(shard") &&
      p.contains("hashpartitioning(band"),
      "each strategy must batch within its own partitioning")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.matches("""(?s).*\(\d+\) Union.*"""))
  }

  test("q180: waterfill windows run over the stats frame only (above " +
    "the stratum aggregate); no shuffled corpus join") {
    val p = plan("q180_budget_waterfill")
    // node ids increase leaf-to-root, so the stratum aggregate (the
    // windows' input) must carry a SMALLER id than every Window node
    val lines = p.linesIterator.toSeq
    val agg = lines.indexWhere(_.matches(""".*\(\d+\) HashAggregate.*"""))
    val win = lines.indexWhere(_.matches(""".*\(\d+\) Window.*"""))
    assert(agg >= 0 && win >= 0 && agg < win,
      "windows must consume the (source, lang) aggregate, not raw rows")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the level attaches by broadcast, never a shuffled join")
  }

  test("q181: leakage split consumes checkpointed CC labels in a " +
    "doc_id-keyed left join — no product, no corpus broadcast") {
    val p = plan("q181_leakage_split")
    assert(p.contains("Scan ExistingRDD"),
      "cluster labels must come from the checkpointed CC loop")
    assert(p.linesIterator.count(_.contains("Join type: LeftOuter")) >= 1,
      "singletons keep their own id via the left join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q182: containment pair join is keyed on the gram (shuffled " +
    "hash), never a corpus broadcast or product") {
    val p = plan("q182_containment")
    assert(p.contains("ShuffledHashJoin"),
      "posting-list self-join must stay shuffled on g5")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "no n² pair space")
  }

  test("q183: IVF maintenance broadcasts the frozen centroids over " +
    "both assignment scans; counts meet in ONE full-outer merge") {
    val p = plan("q183_ivf_maintenance")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "centroid attach is the k x 64 broadcast cross")
    assert(p.linesIterator.count(_.contains("Join type: FullOuter")) == 1,
      "exactly the train/new occupancy merge")
  }

  test("q184: Luhn scrub is map-only — zero joins, zero aggregates, " +
    "the presentation sort is the only exchange") {
    val p = plan("q184_luhn_scrub")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(!p.matches("""(?s).*\(\d+\) HashAggregate.*"""),
      "the checksum folds are row-local HOFs, not aggregates")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 1,
      "only the orderBy range partition may shuffle")
  }

  test("q185: residual ADC is restricted by the per-probed-list LUT " +
    "broadcast join — the q125 prune with residual geometry") {
    val p = plan("q185_residual_pq")
    assert(p.contains("BroadcastHashJoin"),
      "the 640-row residual LUT must broadcast into the code scan")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) >= 1,
      "per-probe ranking must be a partitioned window")
  }

  test("q188: winnowed fingerprint frame is checkpointed once and the " +
    "pair join is keyed on the fingerprint — no product") {
    val p = plan("q188_winnow_fingerprint")
    assert(p.contains("Scan ExistingRDD"),
      "fingerprint set must come from the single checkpointed derivation")
    assert(p.linesIterator.count(_.contains("ShuffledHashJoin")) >= 1,
      "fingerprint self-join must stay shuffled on h")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no n² pair space")
  }

  test("q189: deletion-neighborhood candidates meet in a variant-keyed " +
    "shuffled join; the levenshtein verify never sees a product") {
    val p = plan("q189_deletion_neighborhood")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 2,
      "each side explodes its deletion positions exactly once")
    assert(p.contains("ShuffledHashJoin"),
      "candidates must join on the variant key")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no n² pair space")
  }

  test("q190: every diversity level is a two-level aggregate — the " +
    "distinct count is (source, gram)-keyed, never an expand") {
    val p = plan("q190_distinct_ngram_diversity")
    assert(!p.contains("Expand"),
      "COUNT(DISTINCT) must not compile to expand at corpus scale")
    // 3 levels × (partial+final over the gram key, then partial+final
    // over source) — at least 6 HashAggregates and one Exchange per level
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) >= 6)
    assert(p.contains("Scan ExistingRDD"),
      "all three widths must read the one checkpointed token expansion")
  }

  test("q191: recursive CTE compiles to UnionLoop; the loop body is " +
    "JOIN-FREE (upward walk) so each round is a frontier map") {
    val p = plan("q191_recursive_cte")
    assert(p.contains("UnionLoop") && p.contains("UnionLoopRef"),
      "WITH RECURSIVE must plan as Spark 4's UnionLoop")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "the recursive step must stay join-free — the OR-join downward " +
        "form measured 11.3 s vs 5.8 s (per-round broadcast NLJ)")
    val lines = p.linesIterator.toSeq
    val loop = lines.indexWhere(_.contains("(1) UnionLoop"))
    val agg = lines.indexWhere(_.matches(""".*\(\d+\) HashAggregate.*"""))
    assert(loop >= 0 && agg >= 0,
      "loop and aggregate must both be present")
    assert(p.contains("(p_partkey#") && p.contains(">= 1"),
      "anchor filter must reach the relation, not run post-loop")
  }

  test("q192: pipe syntax plans exactly the classic SQL shape — one " +
    "scan, pushed filter, partial+final aggregate, HAVING post-filter") {
    val p = plan("q192_pipe_syntax")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("PushedFilters:") && p.contains("l_discount"),
      "the |> WHERE must reach the parquet scan")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) == 2,
      "partial+final pair")
  }

  test("q194: the 17-word bloom is built by aggregate and BROADCAST " +
    "into the probe — the probe side never shuffles before the audit") {
    val p = plan("q194_bloom_fpr_audit")
    assert(p.contains("BroadcastExchange"),
      "the filter words must broadcast, never join shuffled")
    assert(p.linesIterator
      .count(_.contains("BroadcastHashJoin LeftOuter")) == 1,
      "probe is one left-outer broadcast join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q195: chi-square readout is two distinct-aggregates plus a " +
    "single-row totals broadcast — no corpus-sized join") {
    val p = plan("q195_ab_chi2")
    assert(p.contains("BroadcastNestedLoopJoin Cross"),
      "the 1-row arm totals attach by broadcast cross")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) >= 4,
      "both distincts must be two-level (map-side combined)")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q196: XML read-back aggregates with a partial+final pair over " +
    "one scan of the written files") {
    val p = plan("q196_xml_roundtrip")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) Scan xml.*""")) == 1,
      "exactly one scan of the XML roundtrip files")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) == 2)
  }

  test("q197: collated group key plans as partial+final SortAggregate " +
    "with ONE keyed Exchange (no hash agg for UTF8_LCASE in 4.1)") {
    val p = plan("q197_collation_group")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) SortAggregate.*""")) == 2,
      "collation forces sort-based aggregation — pin it so a Spark that " +
        "restores hashing shows as a plan diff")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 2,
      "group-key shuffle + presentation sort only")
  }

  test("q198: negative-sampling anti-join stays SHUFFLED on (u, item) " +
    "and the rank window prunes via WindowGroupLimit") {
    val p = plan("q198_negative_sampling")
    assert(p.contains("SortMergeJoin LeftAnti") ||
      p.contains("ShuffledHashJoin LeftAnti"),
      "the interaction table is corpus-sized — the anti-join must " +
        "shuffle, never broadcast it")
    assert(p.contains("WindowGroupLimit"),
      "rank<=4 must prune per-group rows before the final window")
    assert(!p.contains("CartesianProduct"))
  }

  test("q199: feature hashing is the two-level aggregate shape — " +
    "(doc, bucket) keyed then doc keyed, no join, no expand") {
    val p = plan("q199_feature_hashing")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "no vocabulary pass, no dictionary join — that is the point")
    assert(!p.contains("Expand"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 3,
      "(doc,b) shuffle + doc shuffle + presentation sort only")
  }

  test("q200: deletion audit is a union of per-table aggregates; the " +
    "lineitem cascade resolves via a broadcast of deleted order keys") {
    val p = plan("q200_deletion_propagation")
    assert(p.matches("""(?s).*\(\d+\) Union.*"""))
    assert(p.linesIterator
      .count(_.contains("BroadcastHashJoin LeftOuter")) == 1,
      "the cascade join broadcasts the rare deleted-order set")
    assert(!p.contains("SortMergeJoin"),
      "no fact-side shuffle for the audit")
  }

  test("q201: GROUP BY ALL plans the identical classic shape — one " +
    "pushed-filter scan, partial+final aggregate") {
    val p = plan("q201_group_order_all")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"))
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) == 2)
  }

  test("q202: correlated LATERAL LIMIT decorrelates to a rank window " +
    "with WindowGroupLimit — never a per-outer-row subquery") {
    val p = plan("q202_lateral_topk")
    assert(p.contains("WindowGroupLimit"),
      "the correlated LIMIT must become a pruned rank window")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("CartesianProduct"))
  }

  test("q203: cross-modal evidence merges the two detectors in ONE " +
    "full-outer pair join; both banded detectors stay keyed") {
    val p = plan("q203_crossmodal_dedup")
    assert(p.linesIterator.count(_.contains("SortMergeJoin FullOuter")) == 1,
      "exactly the text/video evidence merge")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), "no n² anywhere")
  }

  test("q204: quartile cuts come from the value-histogram window (the " +
    "one Window consumes the aggregate) and broadcast back to the scan") {
    val p = plan("q204_feature_binning")
    val lines = p.linesIterator.toSeq
    val win = lines.indexWhere(_.matches(""".*\(\d+\) Window\s*"""))
    val agg = lines.lastIndexWhere(_.matches(""".*\(\d+\) HashAggregate.*"""))
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) Window\s*""")) == 1 &&
      win >= 0 && agg > win,
      "the cumulative window must run over the distinct-value frame, " +
        "never a corpus-sized row_number")
    assert(p.contains("BroadcastNestedLoopJoin Cross"),
      "the 1-row cut frame attaches by broadcast")
  }

  test("q206: the SQL-defined function is INLINED — no black-box eval " +
    "node, the plan is the classic pushed-filter aggregate") {
    val p = plan("q206_sql_udf")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF") &&
      !p.contains("Invoke"),
      "CREATE FUNCTION bodies must inline into codegen, not evaluate " +
        "as opaque calls")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      "the filter must still reach the scan through the function call")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) HashAggregate.*""")) == 2)
  }

  test("q207: datasheet joins the fp-keyed dup flags shuffled and " +
    "merges the per-source gini frame by broadcast") {
    val p = plan("q207_source_datasheet")
    assert(p.contains("ShuffledHashJoin"),
      "the corpus-sized fingerprint join must stay shuffled")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 1,
      "the ~20-row gini frame attaches by broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q208: LPA rounds are checkpoint-pinned — the visible plan " +
    "reads the round-3 label frame, not a re-expanded loop") {
    val p = plan("q208_label_propagation")
    assert(p.contains("Scan ExistingRDD"),
      "each synchronous round must materialize once (the q131 recipe); " +
        "a re-expanded loop would replay the edge build per round")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "all joins happen inside the pinned rounds")
  }

  test("q193: time-decay lags ride ONE user_id Exchange; only the " +
    "presentation sort adds a second") {
    val p = plan("q193_time_decay")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 2,
      "window shuffle + orderBy range partition, nothing else")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1,
      "all four lags share one window spec")
  }

  test("q209: AUC rank statistic runs over the PINNED per-score frame — " +
    "both cumsum stages read it, the corpus is scanned once; the coarse " +
    "offsets attach by broadcast and no window is corpus-sized") {
    val p = plan("q209_auc_roc")
    assert(p.contains("Scan ExistingRDD"),
      "the per-score (np, nn) frame must be materialized once")
    assert(!p.contains("Scan parquet"),
      "the visible plan must not re-derive the corpus scan per branch")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1,
      "bucket offsets attach by broadcast, never a shuffle")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "coarse offsets window (<=20 rows) + bucket-partitioned fine window")
    assert(!p.contains("CartesianProduct"))
  }

  test("q210: calibration bins are one map-side-combined aggregate — " +
    "partial+final on the 10-value bin key, no joins, no windows") {
    val p = plan("q210_calibration_ece")
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate""")) == 2)
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 2,
      "bin-key shuffle + presentation sort, nothing else")
  }

  test("q211: Poisson bootstrap is a map-side 32x explode combined " +
    "before the only data shuffle; the point-estimate branch joins by " +
    "broadcast") {
    val p = plan("q211_poisson_bootstrap")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1,
      "one replicate explode")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1,
      "per-source CI frame joins the per-source point frame broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q212: HITS alternations ride the pinned edge list; top-20 is " +
    "TakeOrderedAndProject, never a global sort; every normalization " +
    "total attaches as a 1-row broadcast") {
    val p = plan("q212_hits")
    assert(p.contains("Scan ExistingRDD"), "edge list pinned once")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "only the FINAL normalization's 1-row total attach is visible; " +
        "earlier half-rounds are pinned (unpinned, the plan held " +
        "2^rounds copies of the normalization cross)")
    assert(!p.contains("CartesianProduct"))
  }

  test("q213: KMV sketch top-128 is WindowGroupLimit-pruned; est and " +
    "exact branches merge in ONE outer join; everything reads the " +
    "pinned distinct-gram frame") {
    val p = plan("q213_kmv_overlap")
    assert(p.contains("WindowGroupLimit"),
      "per-key rank<=128 must prune before the full window sort")
    assert(p.linesIterator.count(_.contains("SortMergeJoin LeftOuter")) == 1,
      "exactly the est-exact merge")
    assert(!p.contains("Scan parquet"),
      "sketch AND exact branches read the pinned shingle frame")
    assert(!p.contains("CartesianProduct"))
  }

  test("q214: k-center assignment is one cross against the 4-row " +
    "broadcast center table over the pinned corpus; counts are " +
    "partial+final") {
    val p = plan("q214_kcenter_init")
    assert(p.contains("Scan ExistingRDD"))
    assert(
      p.linesIterator.count(_.contains("BroadcastNestedLoopJoin Cross")) == 1,
      "one assignment cross vs the tiny center table")
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate""")) >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("q215: Heaps curve derives both decile series from the pinned " +
    "(decile, tok) frame — the token explode never runs twice, the " +
    "only window is the 10-row cumsum") {
    val p = plan("q215_heaps_law")
    assert(p.contains("Scan ExistingRDD"),
      "occurrence totals and first-seen counts share one materialization")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 0,
      "the corpus-sized explode happened once, inside the pin")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
  }

  test("q216: Gini-Simpson is two stacked map-side-combined aggregates " +
    "and nothing else — no joins, no windows, no float accumulation " +
    "order to drift") {
    val p = plan("q216_token_gini")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 3,
      "(source,tok) shuffle + source shuffle + presentation sort")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1)
  }

  test("q217: raking rounds are checkpoint-pinned — the visible plan " +
    "reads the final cell weights, every IPF half-step materialized " +
    "once (the q208 recipe)") {
    val p = plan("q217_raking_mixture")
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""),
      "marginal scalings happen inside the pinned rounds")
  }

  test("q218: upsampling audit and expansion branches share the pinned " +
    "weighted frame; the expansion is a map-side Generate; the two " +
    "20-row audits merge by broadcast") {
    val p = plan("q218_quality_upsample")
    assert(!p.contains("Scan parquet"),
      "both branches must read the pinned weight frame")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1)
  }

  test("q220: the named parameter folds to a literal BEFORE optimization " +
    "— the filter still pushes down to the parquet scan") {
    val p = plan("q220_parameterized_sql")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      "a parameter that blocked pushdown would full-scan the fact table")
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate""")) == 2)
  }

  test("q221: both nucleus windows are source-PARTITIONED and share one " +
    "sort; the per-source rollup reuses the (source,tok) partitioning " +
    "without a third data shuffle") {
    val p = plan("q221_top_p_vocab")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange""")) == 3,
      "(source,tok) shuffle + source window shuffle + presentation sort")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
  }

  test("q222: the arrival-order running max is the two-stage blocked " +
    "pattern — block offsets broadcast back, the fine window is " +
    "block-PARTITIONED, never one global partition") {
    val p = plan("q222_watermark_audit")
    assert(p.contains("Scan ExistingRDD"),
      "block maxima and the fine pass share one pinned read")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2,
      "coarse block-offset window + block-partitioned fine window")
  }

  test("q223: gap histogram and its total share the pinned gap frame; " +
    "the 1-row total attaches as a broadcast cross") {
    val p = plan("q223_session_gap_calibration")
    assert(p.contains("Scan ExistingRDD"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1,
      "only the ~40-row bucket cumsum is visible; the per-user lag " +
        "window ran inside the pin")
  }

  test("q224: quantile mapping is a broadcast range join against the " +
    "pinned value-histogram — one corpus scan, both source windows " +
    "share one sort, no corpus-sized window") {
    val p = plan("q224_quantile_normalize")
    assert(p.linesIterator.count(_.matches(""".*\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the CDF range join rides the broadcast global histogram")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2)
    assert(p.contains("Scan ExistingRDD"),
      "the global histogram is pinned once, broadcast twice")
  }

  test("q225: the map pipeline is one straight-line plan — map build, " +
    "transform_values, map_filter and the contract explode, no joins") {
    val p = plan("q225_map_ops")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1,
      "one explode back to the order-insensitive row contract")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ObjectHashAggregate""")) == 2,
      "map build is partial+final")
  }

  test("q226: the hourly grid generates from per-group bounds (a " +
    "map-side explode over the pinned counts), never a calendar scan; " +
    "the island window is event_type-partitioned") {
    val p = plan("q226_gapfill_series")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "both branches must read the pinned hourly counts")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 2,
      "one grid explode per consumer branch of the tiny bounds frame")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
  }

  test("q227: the transitivity assembly reads the pinned edge/wedge " +
    "frames; the only crosses are the 1-row count attachments") {
    val p = plan("q227_neardup_transitivity")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 2,
      "exactly the two 1-row count crosses")
    assert(!p.contains("CartesianProduct"))
  }

  test("q248: the sweep reads the pinned session/peak frames; the " +
    "argmax filter runs as a broadcast EQUI-join on the 1-row max, the " +
    "only crosses are the two 1-row attachments (max, total)") {
    val p = plan("q248_concurrency_sweep")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "final assembly must ride the checkpointed frames")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 1,
      "peak = max(peak) must be an equi-join against the broadcast max")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 2,
      "exactly the 1-row max/total crosses")
    assert(!p.contains("CartesianProduct"))
  }

  test("q249: survivorship picks ride cluster-sized windows over the " +
    "pinned fingerprint frame — no parquet rescan, no cross") {
    val p = plan("q249_golden_record")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 3,
      "best/source/lang picks are the only windows, all ck-partitioned")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q250: rank window and f(1) broadcast touch only the pinned " +
    "50-row shortlist") {
    val p = plan("q250_zipf_audit")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the f(1) attachment is the only cross")
  }

  test("q251: the neighbor join is an EQUI-join on the assembled rank " +
    "(no range/cartesian pair space), one pass over the candidates") {
    val p = plan("q251_sorted_neighborhood")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1,
      "the 1..w explode drives the equi-join")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the truth-count attachment is the only cross")
  }

  test("q252: the motif match is one straight-line plan — session " +
    "window, ordered-string rollup, map-side regex; no joins") {
    val p = plan("q252_sequence_motif")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ObjectHashAggregate""")) == 2,
      "the sort_array(collect_list) rollup is partial+final")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q253: before/after occupancy ride the pinned one-map-pass " +
    "assignment; the assembly is the 8-row full-outer only") {
    val p = plan("q253_rendezvous_hash")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "both rollups must read the checkpointed assignment")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    assert(p.contains("SortMergeJoin FullOuter") ||
      p.contains("ShuffledHashJoin FullOuter"),
      "the node assembly is one full-outer join")
  }

  test("q254: everything beyond the hourly rollup runs in histogram " +
    "space — the pinned #hours frame with two tiny broadcast " +
    "attachments (total, fold bounds)") {
    val p = plan("q254_purged_cv")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 2,
      "exactly the total + fold-bounds crosses")
    assert(!p.contains("CartesianProduct"))
  }

  test("q255: the seed indicator stays a map-side CASE — the round " +
    "loop reads only the pinned edge frame, no seed-table join, no " +
    "parquet rescan") {
    val p = plan("q255_personalized_ppr")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the final round must read the checkpointed rank/edge frames")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q256: adjacency and source mix ride the pinned ticket scan; " +
    "the shard window is shard-partitioned keyed work") {
    val p = plan("q256_shuffle_quality")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1,
      "one shard-keyed lag window — never a global order")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the 1-row expectation attachment is the only cross")
  }

  test("q257: audits share the pinned candidate frame and ONE " +
    "intersection pass — no second verify join, no cartesian") {
    val p = plan("q257_ppjoin_positional")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the 1-row finals attachment is the only cross")
  }

  test("q258: the weight pass is one candidate-broadcast fan-out over " +
    "the pinned corpus — no parquet rescan, no cartesian") {
    val p = plan("q258_kmeanspar_init")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the candidate-set fan-out is the only cross")
    assert(p.contains("BroadcastHashJoin"),
      "the selection-distance labels attach by broadcast equi-join")
  }

  test("q259: naive and idempotent sinks read the SAME pinned partials " +
    "— one delivery rollup, keyed equi-joins only") {
    val p = plan("q259_idempotent_sink")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q260: the skyline runs in histogram space — prefix max over " +
    "the distinct-price frame, membership by broadcast equi-join") {
    val p = plan("q260_pareto_frontier")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q261: the final assembly reads only the five pinned 1-row " +
    "picks — cumulative coverage is a closed-form window, no corpus " +
    "recount") {
    val p = plan("q261_greedy_coverage")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "no corpus-scale node may survive into the output plan")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.contains("Union"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q262: each FD is one lhs-keyed two-level aggregate; the dims " +
    "attach by broadcast equi-join, reports union") {
    val p = plan("q262_fd_audit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) >= 2,
      "supplier and customer dims must broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
    assert(p.contains("Union"))
  }

  test("q263: debounce is one straight-line pass — a (user, type)-" +
    "keyed window, map-side flagging, one rollup, no joins") {
    val p = plan("q263_debounce")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q264: the phrase probe filters to the two query terms before " +
    "any join; adjacency is an equi-join over the pinned positional " +
    "frame") {
    val p = plan("q264_phrase_search")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) == 1,
      "the 1-row bag-twin attachment is the only cross")
    assert(p.contains("Union"))
  }

  test("q265: LISTAGG WITHIN GROUP plans as aggregation over one scan " +
    "— no joins, ordering carried by the aggregate contract") {
    val p = plan("q265_listagg")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q266: the whole matrix is ONE moment aggregate over one scan " +
    "— adding a measure adds columns, never a pass") {
    val p = plan("q266_corr_matrix")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1,
      "the 6 pair rows come from one stack of the 1-row moments")
  }

  test("q267: assortativity reads the pinned edge frame — two keyed " +
    "degree joins + one 1-row moment aggregate, no edge self-join") {
    val p = plan("q267_assortativity")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"))
  }

  test("q268: burstiness is two map-side-combined rollups + " +
    "TakeOrdered — no joins, no global sort") {
    val p = plan("q268_term_burstiness")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q269: pair generation rides the pinned inverted frame; " +
    "vocabulary sizes attach by broadcast") {
    val p = plan("q269_source_overlap")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin.*""")) == 2,
      "both size attachments must broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q270: the forward as-of is one user-keyed window pass over " +
    "the filtered scan — no join at all") {
    val p = plan("q270_forward_asof")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.contains("PushedFilters"),
      "the two-type filter must reach the scan")
  }

  test("q271: UNPIVOT plans as the same Expand the stack() profiler " +
    "uses — one rollup, no joins") {
    val p = plan("q271_unpivot")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.contains("Expand"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q272: both firsts come from ONE user rollup; the rank window " +
    "runs over the cohort-sized latency frame only") {
    val p = plan("q272_conversion_latency")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q273: episodes and sweep ride pinned frames; the only " +
    "unpartitioned window is the #days prefix frame") {
    val p = plan("q273_rolling_active_users")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q274: the SQL PIVOT clause plans as one hourly rollup over one " +
    "scan — no joins") {
    val p = plan("q274_sql_pivot")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q275: the rank() limit pushes below the sort as " +
    "WindowGroupLimit — per-group pruning before the window " +
    "materializes") {
    val p = plan("q275_topk_with_ties")
    assert(p.contains("WindowGroupLimit"),
      "rank <= k must prune group-locally before the full window")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
  }

  test("q276: shard means and the global mean read the pinned scan; " +
    "the median is rank-selected over the 16-row shard frame") {
    val p = plan("q276_median_of_means")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q277: the column diff is ONE full-outer join + one " +
    "conditional-sum aggregate, stacked — adding a column adds a sum, " +
    "never a pass") {
    val p = plan("q277_column_diff")
    assert(p.contains("SortMergeJoin FullOuter") ||
      p.contains("ShuffledHashJoin FullOuter"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate""")) == 1,
      "the per-column report is one stack of the 1-row audit")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q278: three order statistics from ONE hour-partitioned rank " +
    "window — never three percentile aggregates") {
    val p = plan("q278_latency_percentiles")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) <= 2)
  }

  test("q279: merge + audit ride a single key shuffle — union, one " +
    "grouped aggregate, no joins") {
    val p = plan("q279_source_reconcile")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.contains("Union"))
  }

  test("q280: churn is one user-keyed lead window over the pinned " +
    "presence frame + one week rollup") {
    val p = plan("q280_churn_cohort")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(!p.contains("CartesianProduct"))
  }

  test("q282: shot detection is map-side hashing + one video-keyed lag " +
    "window — no joins") {
    val p = plan("q282_shot_boundaries")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
  }

  test("q283: CLUSTER BY plans as a hash exchange; its partition-local " +
    "sort is ELIMINATED under the outer determinism ORDER BY " +
    "(EliminateSorts) — one sort total, never two") {
    val p = plan("q283_cluster_by")
    assert(p.contains("hashpartitioning"),
      "DISTRIBUTE BY must be a hash exchange")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Sort""")) == 1,
      "the subsumed local sort must not be paid twice")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
  }

  test("q284: the three try_* failure counters ride ONE scan and one " +
    "partial+final rollup") {
    val p = plan("q284_try_arithmetic")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q285: the LSH banding planner is pure driver-trivial literal " +
    "math — no Exchange, no parquet scan, ever") {
    val p = plan("q285_lsh_planner")
    assert(!p.contains("Exchange"), "planner math must not shuffle")
    assert(!p.contains("Scan parquet"), "planner math must not scan a table")
  }

  test("q286: weighted Jaccard candidates come from the gh-keyed " +
    "posting join — shuffle-hash everywhere, no corpus broadcast, no " +
    "all-pairs product") {
    val p = plan("q286_weighted_jaccard")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("BroadcastHashJoin"),
      "every frame here is corpus-proportional — nothing may broadcast")
  }

  test("q287: backoff novelty reads the pinned occurrence frame (one " +
    "tokenize pass), joins the three df tables keyed, and rolls up " +
    "per doc") {
    val p = plan("q287_backoff_novelty")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the occurrence frame must be pinned, not re-tokenized per df join")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin.*""")) == 3)
    assert(!p.contains("CartesianProduct"))
  }

  test("q288: RM3 second pass broadcasts only the tiny term/stats " +
    "frames; corpus tf is pinned once; final top-20 is " +
    "TakeOrderedAndProject") {
    val p = plan("q288_rm3_feedback")
    assert(p.contains("Scan ExistingRDD"), "tf frame must be pinned")
    assert(p.contains("BroadcastHashJoin"), "terms join must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q290: TPUT bounds — per-shard tops from the pinned shard-count " +
    "frame, certification joined keyed, final top-10 is " +
    "TakeOrderedAndProject") {
    val p = plan("q290_sharded_topk_bounds")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "shard counts must be pinned — tops/threshold/exact all read them")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q289: the Gram build is ONE vec_id-keyed shuffle-hash self-join " +
    "of the pinned exploded corpus; the iteration never rescans " +
    "parquet") {
    val p = plan("q289_pca_power")
    assert(p.contains("ShuffledHashJoin"))
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "exploded corpus and covariance must be pinned; rounds are " +
        "checkpoint-fed")
    assert(!p.contains("CartesianProduct"))
  }

  test("q292: the coalescing plan's cumsum window runs over the " +
    "64-row partition-stats frame — the corpus is touched by one " +
    "partial+final rollup, no joins") {
    val p = plan("q292_coalesce_planner")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the per-partition byte rollup must partial-aggregate map-side")
  }

  test("q294: interleave positions and gap audit ride source-" +
    "partitioned windows only — no unpartitioned corpus window; " +
    "totals broadcast") {
    val p = plan("q294_interleave_schedule")
    assert(p.contains("hashpartitioning(source"),
      "rank + gap windows must partition on source")
    assert(p.contains("BroadcastHashJoin"),
      "per-source counts and the 1-row total must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q293: item-item CF — basket self-join keyed on the order, " +
    "counts joined shuffle-hash, top-3 via an item-partitioned rank " +
    "window; nothing broadcasts the catalog") {
    val p = plan("q293_item_cf")
    assert(p.contains("ShuffledHashJoin"))
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the basket frame must be pinned — both join sides + counts read it")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q295: Theil-Sen — weekly rollup pinned, pair join keyed on grp, " +
    "median selected inside a grp-partitioned window") {
    val p = plan("q295_theil_sen")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the weekly series must be pinned — both pair sides read it")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q296: priority sampling selects via TakeOrderedAndProject(k+1) — " +
    "never a corpus-wide rank window") {
    val p = plan("q296_priority_sampling")
    assert(p.contains("TakeOrderedAndProject"),
      "top-(k+1) must be a distributed top-k, not sort+limit")
    assert(!p.contains("CartesianProduct"))
  }

  test("q297: Kendall tau rides the pinned weekly frame — pair join " +
    "keyed on grp, one rollup, no corpus window") {
    val p = plan("q297_kendall_tau")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the weekly series must be pinned — both pair sides read it")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "C/D/T are aggregates; no rank window needed")
  }

  test("q298: rename detection is two stack() scans + column-count-sized " +
    "fingerprint frames — no corpus join") {
    val p = plan("q298_rename_detect")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2,
      "one unpivot scan per schema version, never per column")
    assert(!p.contains("CartesianProduct"))
  }

  test("q299: bitmap build + exact audit both read the pinned gram " +
    "frame; all pair joins keyed shuffle-hash; no corpus broadcast") {
    val p = plan("q299_bitmap_overlap")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"))
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q300: isotonic fit — corpus reduced to the pinned 10-row bin " +
    "frame before any non-equi interval join; no corpus-sized " +
    "cartesian anywhere") {
    val p = plan("q300_isotonic_calibration")
    assert(p.contains("Scan ExistingRDD"),
      "the bin frame must be pinned — intervals/fit/output all read it")
    assert(!p.contains("Scan parquet"),
      "the interval/fit stages must never rescan the corpus")
  }

  test("q301: every lattice cell aggregates the pinned QI frame; the " +
    "chosen rule is a 1-row broadcast, never a window") {
    val p = plan("q301_anonymity_lattice")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the QI base frame must be pinned — nine cells read it")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q302: the RFM matrix is ONE user-keyed aggregate with " +
    "conditional sums — one scan plus the 1-row anchor, no window, " +
    "no per-window passes") {
    val p = plan("q302_rfm_features")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2,
      "one corpus scan + one anchor scan — never one per window")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the user rollup must partial-aggregate map-side")
  }

  test("q303: the V2 memory source is what the plan reads — BatchScan " +
    "with the pruned 2-column schema, no parquet under the aggregate") {
    val p = plan("q303_dsv2_memscan")
    assert(p.contains("BatchScan"), "must read through the DSv2 scan")
    assert(!p.contains("Scan parquet"),
      "the registered rows, not parquet, feed the aggregate")
    // min(string) plans as SortAggregate; partial + final still required
    assert("(Sort|Hash)Aggregate".r.findAllIn(p).size >= 2)
  }

  test("q305: complete aggregate pushdown — the plan is BatchScan + " +
    "Sort with NO Aggregate node; the scan output IS the final result") {
    val p = plan("q305_dsv2_agg_pushdown")
    assert(p.contains("BatchScan"))
    assert(!p.contains("Aggregate"),
      "supportCompletePushDown must remove the Aggregate entirely")
    assert(!p.contains("Scan parquet"))
  }

  test("q306: TextTiling — one tokenize pass into the pinned block-tf " +
    "frame; adjacent-block and gap joins all keyed shuffle-hash; " +
    "zero-overlap gaps kept via the LEFT join") {
    val p = plan("q306_texttiling")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the block-tf frame must be pinned — dot/norm/gap all read it")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q307: array HOFs are projection-only — one scan, no join, no " +
    "aggregate, no window (the lambda surface, not a shuffle shape)") {
    val p = plan("q307_array_hof")
    assert(!p.matches("""(?s).*\(\d+\) [A-Za-z]*Join.*"""))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("HashAggregate"))
  }

  test("q308: multi-probe candidates come ONLY from bucket equi-joins " +
    "with the tiny probe set broadcast; the exact baseline is the " +
    "broadcast-probe scan — never a corpus x corpus product") {
    val p = plan("q308_multiprobe_lsh")
    assert(p.contains("BroadcastHashJoin"),
      "probe set and query frames must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Scan ExistingRDD"),
      "the bucketed corpus frame must be pinned")
  }

  test("q309: storage-partitioned join — co-partitioned V2 scans join " +
    "and aggregate with ZERO hash Exchanges; both sides are BatchScans") {
    val p = plan("q309_dsv2_spj")
    assert("BatchScan".r.findAllIn(p).size >= 2)
    assert(!p.contains("Exchange hashpartitioning"),
      "SPJ must elide the join and aggregate shuffles entirely")
    assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the zero-Exchange claim must hold for a real shuffle-class " +
        "join, not degrade to a broadcast")
    assert(!p.contains("Scan parquet"))
  }

  test("q310: the SQL-catalog path reads through the same V2 BatchScan " +
    "with the filter pushed — plain SQL, zero parquet") {
    val p = plan("q310_dsv2_catalog")
    assert(p.contains("BatchScan"))
    assert(!p.contains("Scan parquet"))
    assert(!p.matches("""(?s).*\(\d+\) Filter.*"""),
      "n_nationkey < 20 (and its IsNotNull) must be fully pushed — no " +
        "residual Filter node")
  }

  test("q311: every FK edge audits via a keyed LEFT ANTI join — no " +
    "cartesian anywhere in the 7-edge union") {
    val p = plan("q311_fk_orphans")
    assert("LeftAnti".r.findAllIn(p).size >= 7)
    assert(!p.contains("CartesianProduct"))
  }

  test("q312: the two checksum trees shuffle on DIFFERENT bucket keys " +
    "(mod 7 vs mod 13) — distinct topologies the optimizer cannot " +
    "normalize into one; no window") {
    val p = plan("q312_determinism_cert")
    assert(p.contains("% 7") && p.contains("% 13"),
      "both bucket keys must survive into the physical plan")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q313: trending — one (month, part) rollup pinned, ranks in " +
    "month-partitioned windows, adjacent months joined keyed") {
    val p = plan("q313_trending_rank")
    assert(p.contains("Scan ExistingRDD") && !p.contains("Scan parquet"),
      "the month-part counts must be pinned — both join sides read them")
    assert(p.contains("ShuffledHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q314: the native as-of join runs through AsOfJoinExec — one " +
    "key Exchange per side placed by EnsureRequirements, no union " +
    "frame, no window") {
    val p = plan("q314_native_asof")
    assert(p.contains("AsOfJoin"), "the custom operator must plan")
    assert(p.contains("hashpartitioning(user_id") &&
      p.contains("hashpartitioning(c_user"),
      "both sides must cluster on their key")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 3,
      "two key exchanges + the output-order range exchange, no more")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "the operator replaces the carry-forward window entirely")
    assert(!p.contains("Union"))
  }

  test("q315: the SQL-parsed ASOF statement plans through AsOfJoinExec " +
    "and the roll-up rides the join's user_id clustering — no extra " +
    "key Exchange between join and aggregate") {
    val p = plan("q315_asof_sql")
    assert(p.contains("AsOfJoin"), "parser must reach the custom operator")
    assert(p.contains("HashAggregate"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(!p.contains("Union"))
    // exchanges: one per join side + the final order's range partition;
    // the aggregate must NOT add a fourth (user_id clustering is reused)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 3,
      "agg must reuse the join's hash clustering")
  }

  test("q316: the native bottom-k aggregate runs as a two-phase " +
    "ObjectHashAggregate — partial sketches merge across ONE source " +
    "Exchange; no rank window, no corpus-wide sort") {
    val p = plan("q316_bottomk_sketch_sample")
    assert(p.contains("ObjectHashAggregate"),
      "TypedImperativeAggregate must plan to ObjectHashAggregate")
    assert(p.contains("partial_graft_bottom_k_ids") ||
      p.matches("""(?s).*partial.*graft_bottom_k_ids.*"""),
      "map-side partial sketch must exist")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "sampling must not pay a rank window")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 2,
      "one source-key Exchange + the presentation sort's range exchange")
  }

  test("q317: Mann-Whitney ranks collapse to the value domain — ONE " +
    "window over the distinct-length frame, never a corpus-wide rank") {
    val p = plan("q317_mannwhitney_u")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) == 1,
      "exactly the value-domain running-sum window")
    // the window's input is the post-aggregate value frame: the plan
    // must aggregate BEFORE the window (scan -> agg -> window)
    val lines = p.linesIterator.toSeq
    val aggIdx = lines.indexWhere(_.matches("""\(\d+\) HashAggregate"""))
    val winIdx = lines.indexWhere(_.matches("""\(\d+\) Window\s*"""))
    assert(aggIdx >= 0 && winIdx >= 0)
  }

  test("q318: the 8-lag EWMA unroll collapses into ONE user-partitioned " +
    "Window pass over the hourly aggregate") {
    val p = plan("q318_ewma_burst")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) == 1,
      "all eight lags must share one window pass")
    assert(p.contains("windowspecdefinition(user_id"),
      "the window must be user-partitioned (no global sort)")
  }

  test("q319: both curve layouts ride ONE orders scan (explode-tagged, " +
    "not a per-layout union) and the 256-cell lookup broadcasts") {
    val p = plan("q319_hilbert_layout")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet.*""")) == 2,
      "one scan for the stats + one for the binning - never per-layout")
    assert(p.contains("BroadcastHashJoin"), "curve lookup must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    assert(p.contains("Generate"), "layout fan-out must be the explode")
  }

  test("q320: Neyman allocation windows run over the 20-row strata " +
    "frame; the only corpus-keyed window is partitioned by source; " +
    "selection joins shuffled on the stratum key") {
    val p = plan("q320_neyman_allocation")
    assert(p.contains("ShuffledHashJoin"),
      "alloc-bounded selection must join on the stratum key, shuffled")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) <= 4)
  }

  test("q322: the sweep line is SEGMENTED — the carry window runs over " +
    "the aggregated days frame, the running sum is day-partitioned; " +
    "no corpus-wide running window") {
    val p = plan("q322_max_concurrency")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) == 2,
      "days-frame carry window + day-partitioned running window")
    assert(p.contains("windowspecdefinition(day"),
      "the boundary running sum must be day-partitioned")
    assert(p.contains("Generate"), "boundary fan-out must be the explode")
  }

  test("q323: attribution pairs join shuffled on the user key and both " +
    "rank windows are purchase-partitioned — pair space bounded per " +
    "user, never corpus-wide") {
    val p = plan("q323_linear_attribution")
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("windowspecdefinition(purchase_id"),
      "recency/nv windows must be purchase-partitioned")
    // every windowspec in this plan is purchase-keyed (no empty spec)
    assert(!p.contains("windowspecdefinition(specifiedwindowframe"),
      "no partition-less window allowed here")
  }

  test("q324: Adamic-Adar pairs are part-blocked (shuffled common-" +
    "neighbor join), the ln lookup broadcasts, top-50 rides " +
    "TakeOrderedAndProject") {
    val p = plan("q324_adamic_adar")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin""")) == 2,
      "pair join + weight join, both part-keyed")
    assert(p.contains("BroadcastHashJoin"), "ln lut must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q325: grid DBSCAN's final plan reads the checkpointed dense-" +
    "cell/CC frames (the iterative part ran once, eagerly) plus the " +
    "corpus scans for the noise arm — no pair product anywhere") {
    val p = plan("q325_grid_dbscan")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop is the 1-row min/max stats broadcast (the
    // q129/q319 range-binning shape) — never a pair product
    assert(p.linesIterator.count(
      _.contains("BroadcastNestedLoopJoin")) <= 2)
    assert(p.contains("Scan ExistingRDD"),
      "dense cells + component labels must come from the pinned frames")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet.*""")) <= 2,
      "noise arm re-derives cells from at most the stats+binning scans")
  }

  test("q326: the protocol DFA broadcasts; sequence pairing is ONE " +
    "user-partitioned lag window") {
    val p = plan("q326_dfa_validation")
    assert(p.contains("BroadcastHashJoin"), "13-row DFA must broadcast")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) == 1)
    assert(p.contains("windowspecdefinition(user_id"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q327: the OHLC candle is ONE keyed aggregate — min_by/max_by " +
    "carry the open/close, no rank windows, partial agg map-side") {
    val p = plan("q327_ohlc_downsample")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "open/close must come from min_by/max_by, not rank windows")
    assert(p.contains("partial_min_by") || p.contains("min_by"),
      "the composite-key argmin must be in the aggregate")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 2,
      "one (user, hour) exchange + the output sort")
  }

  test("q328: both delta layouts are partition-bounded lag windows " +
    "(day / user) — no corpus-wide sort anywhere") {
    val p = plan("q328_bitwidth_audit")
    assert(p.contains("windowspecdefinition(day"))
    assert(p.contains("windowspecdefinition(user_id"))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window\s*""")) == 2)
  }

  test("q329: the 640-row centroid table broadcasts into the probe — " +
    "the corpus never shuffles for assignment; argmin is " +
    "vec-partitioned") {
    val p = plan("q329_label_noise")
    assert(p.contains("BroadcastHashJoin"), "centroids must broadcast")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("windowspecdefinition(vec_id"))
  }

  test("q332: both band aggregates read the persisted rollup — " +
    "InMemoryTableScan serves two consumers, the rollup computes once") {
    val p = plan("q332_cached_reuse")
    assert(p.linesIterator.count(
      _.contains("InMemoryTableScan")) >= 2,
      "both branches must read the cache")
    // parquet appears ONLY inside the InMemoryRelation's embedded
    // cache-build description — every consumer goes through the scan
    assert(p.linesIterator.forall(l =>
      !l.contains("Scan parquet") || p.contains("InMemoryRelation")),
      "parquet may only appear as the cache's build plan")
  }

  test("q333: the typed cogroup plans to CoGroup over two key-" +
    "clustered children") {
    val p = plan("q333_typed_cogroup")
    assert(p.contains("CoGroup"), "must use the typed cogroup operator")
    assert(!p.contains("CartesianProduct"))
  }

  test("q334: ingestion reads through the binaryFile source with the " +
    "partition-dir source attribute from the path") {
    val p = plan("q334_binaryfile_ingest")
    assert(p.contains("binaryFile"), "must scan the binaryFile source")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q335: both CSV modes are single-pass aggregates over the dirty " +
    "feed — no window, no join; corrupt accounting stays in the scan") {
    val p = plan("q335_csv_malformed")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan csv.*""")) == 2,
      "one csv scan per mode")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(!p.contains("Join"))
  }

  test("q336: the read-back after the dynamic overwrite is a plain " +
    "partitioned parquet scan — R's rewrite left other partitions' " +
    "files untouched (proven by the oracle equality)") {
    val p = plan("q336_dynamic_partition_overwrite")
    assert(p.contains("Scan parquet"))
    assert(!p.contains("Join"))
  }

  test("q337: null-safe equality stays a hash join — <=> hash-" +
    "partitions like any key (nulls form one bucket), never a " +
    "nested-loop fallback") {
    val p = plan("q337_null_safe_join")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin\s*""")) == 2,
      "equi AND null-safe branches must both be hash joins")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "<=> must not degrade to a nested loop")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q338: nearest-mode as-of runs the native operator twice " +
    "(backward + negated-time forward) — no window carry-forward, " +
    "one merge join for the purchase-keyed combine") {
    val p = plan("q338_asof_nearest")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) AsOfJoin\s*""")) == 2,
      "both directions must go through AsOfJoinExec")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) SortMergeJoin\s*""")) == 1,
      "the combine is one event_id-keyed merge join")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(!p.contains("Union"))
  }

  test("q339: calendar-cycle audit is one partial+final aggregate — " +
    "the month arithmetic is narrow, the only shuffle carries ~80 " +
    "month keys") {
    val p = plan("q339_billing_cycles")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2,
      "partial+final, map-side combined")
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q340: moment statistics merge as partial+final central " +
    "moments — the estimator correction is a post-agg projection, " +
    "never a second pass") {
    val p = plan("q340_moment_stats")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      "one corpus pass for all four moments")
  }

  test("q341: the whole SLA contract is one aggregate pass — " +
    "count_if/bool_and/bool_or fold map-side, no filtered subqueries") {
    val p = plan("q341_contract_checks")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      "six verdicts, one corpus pass")
    assert(!p.contains("Join"))
  }

  test("q342: histogram windows run over the 64-row bucket frame, " +
    "never the corpus — the agg comes first, and both frames share " +
    "one Window node") {
    val p = plan("q342_price_histogram")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2,
      "bucket agg is partial+final")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1,
      "cum + total must share one Window over the bucket frame")
    val lines = p.linesIterator.toVector
    val aggIdx = lines.indexWhere(_.matches("""\(\d+\) HashAggregate\s*"""))
    val winIdx = lines.indexWhere(_.matches("""\(\d+\) Window\s*"""))
    assert(aggIdx < winIdx, "window must consume the aggregate output")
  }

  test("q343: the timezone ledger needs no join — per-row tz " +
    "conversion, a union of the two zone branches, one keyed " +
    "rollup (distinct-hour pre-agg + final)") {
    val p = plan("q343_tz_ledger")
    assert(p.contains("Union"))
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q344: grid NN — the candidate join is an EQUI join on cell " +
    "coords (hash-partitionable, never n²); the checkpointed grid " +
    "result feeds all three consumers; only the rare escalation side " +
    "is a broadcast nested loop") {
    val p = plan("q344_grid_nearest_neighbor")
    assert(!p.contains("CartesianProduct"),
      "the corpus-sized pair join must never be a cartesian product")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) == 1,
      "exactly one NLJ: the tiny escalation side against the cloud")
    // the grid join ran once, eagerly, at checkpoint time — the final
    // plan reads its RDD, it does not re-join per consumer
    assert(!p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
      "grid join must be checkpoint-pinned, not recomputed per branch")
    assert(p.contains("Scan ExistingRDD"))
  }

  test("q345: bitmap distinct — partial bitmap construction is " +
    "map-side (partial+final aggregate pairs), no expand of " +
    "(group, key) pairs") {
    val p = plan("q345_bitmap_distinct")
    assert(p.linesIterator.count(l =>
      l.matches("""\(\d+\) SortAggregate\s*""") ||
      l.matches("""\(\d+\) HashAggregate\s*""")) == 4,
      "bucket-bitmap agg + rollup agg, each partial+final")
    assert(!p.contains("Expand"),
      "the bitmap path must not plan a count-distinct Expand")
    assert(!p.contains("Join"))
  }

  test("q346: set-drift — collect_set is a partial+final " +
    "ObjectHashAggregate; one user-partitioned window; the set ops " +
    "are per-row projections, no pair join") {
    val p = plan("q346_type_set_drift")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ObjectHashAggregate\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q347: grouping provenance — both dims broadcast, the rollup " +
    "is one Expand + partial+final aggregate over the fact") {
    val p = plan("q347_grouping_provenance")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin\s*""")) == 2,
      "customer and nation must broadcast")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Expand\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
  }

  test("q348: chi-squared — the corpus is scanned once into the " +
    "checkpointed cell frame; row/col/N totals and the cell join all " +
    "read the 35-row RDD with broadcasts") {
    val p = plan("q348_chisq_independence")
    assert(!p.contains("Scan parquet"),
      "all consumers must read the checkpointed cells, not the corpus")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin\s*""")) == 2,
      "row and column totals broadcast onto the cells")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q349: XML parse is a per-row projection — one corpus scan, " +
    "one partial+final rollup, no shuffle before the aggregate") {
    val p = plan("q349_xml_ingest")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
  }

  test("q350: format roundtrip is narrow — render/parse/compare in " +
    "projections, one partial+final rollup of |types| keys") {
    val p = plan("q350_timestamp_roundtrip")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
  }

  test("q351: Allen algebra — the pair join is an equi join on " +
    "user_id over the checkpointed interval frame (one corpus pass); " +
    "the 13-way CASE is a projection") {
    val p = plan("q351_allen_relations")
    assert(!p.contains("Scan parquet"),
      "both join sides must read the checkpointed intervals")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin\s*""")) == 1)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q352: ACF — one corpus pass into the checkpointed daily " +
    "frame; lag alignment and Pearson run on the ~30-row series") {
    val p = plan("q352_autocorrelation")
    assert(!p.contains("Scan parquet"),
      "lag join must read the checkpointed daily frame")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q353: TWAP — one window for the lead, and the type rollup " +
    "RIDES the window's clustering: two exchanges total (window key " +
    "+ output order), none between partial and final agg") {
    val p = plan("q353_time_weighted_avg")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 2,
      "agg must reuse the window's event_type partitioning")
    assert(!p.contains("Join"))
  }

  test("q354: clamped balance — cumsum and running-min share ONE " +
    "user sort (two Window nodes, no re-exchange between), and the " +
    "per-user rollup rides the same clustering") {
    val p = plan("q354_clamped_balance")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 2,
      "closed form = exactly two windows, no recursion")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 2,
      "one user-key exchange + the output order, nothing else")
    assert(!p.contains("Join"))
  }

  test("q355: pipe syntax is pure surface — the |> chain plans to " +
    "the identical tree: both dims broadcast, partial+final agg, " +
    "HAVING as a post-agg filter") {
    val p = plan("q355_pipe_syntax")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q356: PII redaction — salting, matching and masking are all " +
    "codegen'd projections; one corpus scan, one |sources| rollup") {
    val p = plan("q356_pii_redaction")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
  }

  test("q357: map profile — counts then map-collect, each " +
    "partial+final; the map lambdas and explode are projections, " +
    "no join back to the corpus") {
    val p = plan("q357_map_profile")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ObjectHashAggregate\s*""")) == 2,
      "map_from_entries collect is partial+final")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Generate\s*""")) == 1, "one explode")
    assert(!p.contains("Join"))
  }

  test("q358: CUPED — one corpus pass into the checkpointed user " +
    "frame; θ/x̄ broadcast as a one-row scalar; variant rollup " +
    "partial+final") {
    val p = plan("q358_cuped_adjustment")
    assert(!p.contains("Scan parquet"),
      "users frame must be checkpointed, corpus scanned once")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) == 1,
      "the pooled scalars ride one broadcast cross join")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q359: FIFO — one lot window, purchases joined on the " +
    "window's user clustering, final rollup rides the same keys " +
    "(no exchange between the join and the aggregate)") {
    val p = plan("q359_fifo_attribution")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1,
      "closed-form clamp needs exactly one cumulative window")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin\s*""")) == 1)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "no lot-by-purchase pair join")
  }

  test("q360: sliding distinct — dedup comes FIRST (corpus → " +
    "user-days), the explode factor is the constant window length, " +
    "and no Window node carries per-row key sets") {
    val p = plan("q360_sliding_distinct")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Generate\s*""")) == 1)
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "sliding distinct must not be a range-frame window")
    assert(!p.contains("Join"))
    val lines = p.linesIterator.toVector
    assert(lines.indexWhere(_.matches("""\(\d+\) HashAggregate\s*""")) <
      lines.indexWhere(_.matches("""\(\d+\) Generate\s*""")),
      "presence dedup must precede the explode")
  }

  test("q361: KL — one tokenize pass into the checkpointed counts; " +
    "source totals and corpus distribution broadcast back; the " +
    "pooled total rides a one-row cross join") {
    val p = plan("q361_kl_divergence")
    assert(!p.contains("Scan parquet"),
      "corpus and source distributions must derive from the " +
        "checkpointed counts")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) == 1)
  }

  test("q362: journeys — both session windows share one user sort, " +
    "the per-session collect rides that clustering (no exchange " +
    "between its phases), and the top-20 is TakeOrdered, not a " +
    "global sort") {
    val p = plan("q362_top_journeys")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 2,
      "user sort + journey census — nothing else reshuffles")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q363: Wilson bounds — two integers per group from one " +
    "map-side-combined pass; the closed form is a projection") {
    val p = plan("q363_wilson_interval")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q364: RBO — after the checkpointed source rollup every " +
    "operator runs on the |sources|/depth frames; no parquet " +
    "re-scan, overlap via the max-rank identity (no set " +
    "intersection per depth)") {
    val p = plan("q364_rank_biased_overlap")
    assert(!p.contains("Scan parquet"),
      "rankings must derive from the checkpointed rollup")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 3,
      "two rank windows + the cumulative RBO window")
  }

  test("q365: negative sampling — candidates come from the hash " +
    "ring (the only NLJ is the one-row |catalog| scalar), the " +
    "collision check is an equi hash join, never user×catalog") {
    val p = plan("q365_negative_sampling")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) == 1,
      "only the broadcast scalar cross join")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ShuffledHashJoin\s*""")) == 1,
      "collision check is one equi join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q366: ordered-set aggregates — percentiles and FILTERed " +
    "measures in ONE partial+final pass, no row_number scaffold") {
    val p = plan("q366_ordered_set_aggs")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) ObjectHashAggregate\s*""")) == 2)
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(!p.contains("Join"))
  }

  test("q367: encrypted column — encrypt/decrypt/encode are per-row " +
    "projections; one corpus scan, one |nations| rollup") {
    val p = plan("q367_encrypted_column")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
  }

  test("q368: DiD — one corpus pass into four cells, the estimator " +
    "folds over the cell frame; two aggregate levels, no join") {
    val p = plan("q368_did_estimator")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 4,
      "cell rollup + estimator fold, each partial+final")
    assert(!p.contains("Join"))
  }

  test("q291: dense ids — the corpus-sized window is bucket-partitioned; " +
    "the only unpartitioned window runs over the tiny bucket-count " +
    "frame; offsets broadcast") {
    val p = plan("q291_dense_ids")
    assert(p.contains("hashpartitioning(bucket"),
      "the row_number window must partition on the bucket key")
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window""")) == 2)
    assert(p.contains("BroadcastHashJoin"), "offsets must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q369: Kaplan–Meier — one corpus scan; the survival windows run " +
    "on the lifetime-bucket frame, never a join") {
    val p = plan("q369_kaplan_meier")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q370: SPRT — one scan, ONE exchange into the ordered walk " +
    "(a sequential test is a total order by definition), no join") {
    val p = plan("q370_sprt_ab")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q371: Bellman–Ford — relaxation rounds join node-sized frames " +
    "against the checkpointed edge frame; never a cartesian product") {
    val p = plan("q371_bellman_ford")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join"), "the final reachability left join")
  }

  test("q372: point-in-polygon — the 5-edge literal polygon is the " +
    "broadcast side of the only product; one corpus scan") {
    val p = plan("q372_point_in_polygon")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LocalTableScan"))
  }

  test("q373: levenshtein block — the name dictionary is checkpointed " +
    "once (no parquet rescan); blocked matching is an equi-join") {
    val p = plan("q373_levenshtein_block")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      "dictionary must come from the checkpoint, not a rescan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q374: Shapley — the whole lattice runs off the checkpointed " +
    "16-row mask frame; no corpus rescan, containment joins are " +
    "lattice-sized broadcasts") {
    val p = plan("q374_shapley_attribution")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "mask ⊆ S containment join over broadcast-sized frames")
    assert(p.contains("LocalTableScan"), "literal channel table")
  }

  test("q375: CDC net effect — one key-shuffled fold (min_by/max_by " +
    "on the composite seq), no window pass, no join") {
    val p = plan("q375_cdc_net_effect")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""),
      "per-key fold must be an aggregate, not a window sort")
  }

  test("q376: Qini — hash-derived deciles need no global sort; the " +
    "cumulative walk is one window over the 10-row decile frame") {
    val p = plan("q376_uplift_qini")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q377: mutual information — marginals derive from the " +
    "checkpointed contingency frame (no corpus rescan); joins are " +
    "cell-frame broadcasts") {
    val p = plan("q377_mutual_information")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q378: OCC conflicts — the banded-explode frame is checkpointed " +
    "once and self-joined on (lock, bucket); no cartesian interval test") {
    val p = plan("q378_occ_conflicts")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q379: parse_url — extraction is per-row projection; one scan, " +
    "partial+final rollup, no join") {
    val p = plan("q379_parse_url")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q380: regr family — one partial+final aggregate pass, no join") {
    val p = plan("q380_regr_aggregates")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) HashAggregate\s*""")) == 2)
    assert(!p.contains("Join"))
  }

  test("q381: bag set ops — INTERSECT/EXCEPT ALL plan through the " +
    "replicate_rows generator (count-join + re-expansion), the real " +
    "bag-semantics machinery; two scans per multiset") {
    val p = plan("q381_bag_set_ops")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 4)
    assert(p.contains("replicaterows") || p.contains("Generate"),
      "bag semantics must re-expand multiplicities, not dedup")
  }

  test("q382: map HOFs — collect_list aggregates are object-hash " +
    "(no sort-based fallback); one corpus scan; explode back to rows") {
    val p = plan("q382_map_hof")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("ObjectHashAggregate"))
    assert(p.matches("""(?s).*\(\d+\) Generate.*"""))
  }

  test("q383: rolling regr — the trailing window runs on the " +
    "checkpointed weekly frame, partitioned by priority") {
    val p = plan("q383_rolling_regr")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0,
      "weekly revenue comes from the shared checkpoint")
    assert(p.contains("hashpartitioning(grp"),
      "window must partition by priority, not run single-partition")
  }

  test("q384: Borůvka — pick, weight re-join, and node census all " +
    "branch off the checkpointed edge frame; no corpus rescan") {
    val p = plan("q384_boruvka_phase")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q385: order streaks — one scan; the difference-trick window " +
    "partitions by customer") {
    val p = plan("q385_order_streaks")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("hashpartitioning(o_custkey"),
      "the dense_rank window must partition by customer")
    assert(!p.contains("Join"))
  }

  test("q386: basket jaccard — two scans (items + orders), the lag " +
    "window partitions by customer, baskets collect via object hash") {
    val p = plan("q386_basket_jaccard")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2)
    assert(p.contains("ObjectHashAggregate"), "collect_set baskets")
    assert(p.contains("hashpartitioning(o_custkey"))
  }

  test("q387: haversine kNN — hubs are the broadcast side of the only " +
    "product; per-hub top-k, one corpus scan") {
    val p = plan("q387_haversine_knn")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hashpartitioning(hub_id"),
      "rank window partitions per hub")
  }

  test("q388: correlated subqueries — Catalyst decorrelates EXISTS / " +
    "NOT EXISTS into semi/anti joins (never tuple-at-a-time), scalar " +
    "agg into an outer join") {
    val p = plan("q388_correlated_exists")
    assert(p.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must become an anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q389: bitemporal — both snapshots are FILTERed argmaxes in ONE " +
    "grouped pass; one scan, no window, no join") {
    val p = plan("q389_bitemporal_audit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q390: weighted median — one scan; the cumulative window runs " +
    "on the (group, price) cell frame, partitioned by group") {
    val p = plan("q390_weighted_median")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("hashpartitioning(flag"),
      "cumulative weight window must partition by group")
    assert(!p.contains("Join"))
  }

  test("q391: ABC — one scan; the ordered share window runs on the " +
    "dim-sized part rollup, never the corpus") {
    val p = plan("q391_abc_classification")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) <= 2)
    assert(!p.contains("Join"))
  }

  test("q392: duplicate charges — the charge log is checkpointed once " +
    "(no parquet rescan); (customer, cents) equality is the block") {
    val p = plan("q392_duplicate_charges")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q393: Haar — every level is a rollup of the checkpointed " +
    "2048-day spine; no corpus rescan, no join") {
    val p = plan("q393_haar_energy")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q394: medoid — all-pairs only within a label (shuffle-hash on " +
    "the label key), sims summed then ranked per label") {
    val p = plan("q394_cluster_medoid")
    assert(!p.contains("CartesianProduct"),
      "pair work must stay label-bounded, never corpus²")
    assert(p.contains("hashpartitioning(label"),
      "medoid election partitions by label")
  }

  test("q395: QQ deciles — per-class windows partition by priority; " +
    "the pick join is against a 9-row literal range") {
    val p = plan("q395_qq_deciles")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("hashpartitioning(o_orderpriority"),
      "rank windows must partition by priority class")
  }

  test("q396: Mahalanobis — two corpus passes (integer moments, then " +
    "score), the 1-row moment frame broadcast; plant injected via " +
    "generator, not a second union scan") {
    val p = plan("q396_mahalanobis_outliers")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2)
    assert(p.matches("""(?s).*\(\d+\) Generate.*"""),
      "dirt injection must be the single-scan explode")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 1-row moments frame must broadcast")
  }

  test("q397: text complexity — one scan, explode + one keyed rollup, " +
    "no join") {
    val p = plan("q397_text_complexity")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.matches("""(?s).*\(\d+\) Generate.*"""))
    assert(!p.contains("Join"))
  }

  test("q398: AP@20 — ranker off the checkpointed corpus (no parquet " +
    "rescan); windows partition per probe; cohort sizes broadcast") {
    val p = plan("q398_average_precision")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(q_id"),
      "rank/cumulative windows must partition per probe")
    assert(p.contains("BroadcastHashJoin"), "cohort counts broadcast")
  }

  test("q399: nDCG — ideal DCG is closed-form over broadcast count " +
    "frames, never a second ranking pass; no parquet rescan") {
    val p = plan("q399_ndcg")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(q_id"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q400: apportionment — seat math runs on the checkpointed " +
    "|priorities| frame; no corpus rescan") {
    val p = plan("q400_largest_remainder")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q401: Gini stump — one scan; every threshold's counts come " +
    "from prefix sums over the |distinct x| frame, no per-threshold " +
    "rescan, no join") {
    val p = plan("q401_gini_stump")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q402: association rules — pair/item supports and the txn " +
    "count all branch off the checkpointed items frame; metric joins " +
    "broadcast") {
    val p = plan("q402_association_rules")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q403: silhouette — centroid distances via one broadcast of " +
    "the k-row centroid frame; two scans (centroids, then scoring)") {
    val p = plan("q403_silhouette")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("q404: power analysis — one moment pass, MDE sweep on a 5-row " +
    "range against the broadcast 1-row frame") {
    val p = plan("q404_power_analysis")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q405: IV Wald — all scalar subqueries read the checkpointed " +
    "2-row cell frame, never the corpus (9 scans before the pin)") {
    val p = plan("q405_iv_wald")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q406: Fleiss kappa — agreement, prevalences, and the doc " +
    "census branch off the checkpointed count frame; no corpus " +
    "rescan") {
    val p = plan("q406_fleiss_kappa")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q407: changepoint — one scan; every split's SSE from prefix " +
    "sums over the weekly frame, no per-split rescan") {
    val p = plan("q407_changepoint")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q408: merkle repair — both digest levels and the row fetch " +
    "branch off the checkpointed pair frame; no corpus rescan") {
    val p = plan("q408_merkle_repair")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q409: rank windows — one scan, one window pass partitioned " +
    "by flag, no join") {
    val p = plan("q409_rank_window_suite")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q410: modularity — all math branches off the checkpointed " +
    "edge/community frames; no corpus rescan, no cartesian") {
    val p = plan("q410_graph_modularity")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q411: NB fit — one scan, two aggregate levels, no join") {
    val p = plan("q411_negbin_fit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q412: MRR waterfall — active and churn branches share the " +
    "checkpointed span frame; no corpus rescan") {
    val p = plan("q412_mrr_waterfall")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q413: Simpson — pooled and per-stratum signs share the " +
    "checkpointed |nations| cell frame; no corpus rescan") {
    val p = plan("q413_simpson_paradox")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"), "sign math runs on the cell frame")
  }

  test("q414: MASE — one scan; both 'models' are lags in one ordered " +
    "window over the weekly frame") {
    val p = plan("q414_mase_forecast")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q415: Huber — no window, no join in the driver plan; the " +
    "IRLS rounds are scalar-subquery corpus passes by design") {
    val p = plan("q415_huber_mean")
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
    assert(!p.contains("CartesianProduct"))
  }

  test("q416: LTV — one corpus scan for monthly revenue; cohort frame " +
    "checkpointed and broadcast; cumulative window per cohort") {
    val p = plan("q416_ltv_curve")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("hashpartitioning(cohort"),
      "the cumulative window partitions by cohort")
  }

  test("q417: contamination curve — bench and corpus grams share the " +
    "checkpointed gram frame; no corpus rescan, no cartesian") {
    val p = plan("q417_contamination_curve")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q418: logistic IRLS — every round's coefficients are " +
    "checkpoint-pinned 1-row frames; the driver plan is scan- and " +
    "shuffle-free (first cut re-expanded 18 corpus scans)") {
    val p = plan("q418_logistic_irls")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 0)
  }

  test("q419: exponential fit — moment fit and ECDF rank branch off " +
    "the checkpointed gap frame; the ECDF rank is staged (bucket-keyed " +
    "fine window + offset broadcast), never a global sort") {
    val p = plan("q419_exponential_fit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    // r13: two Windows — the bounded offset cumsum over the bucket
    // rollup and the bucket-keyed fine rank; the offset attach is the
    // only broadcast hash join (the 1-row moment frame still crosses
    // by BNLJ as before)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 2)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin""")) == 1,
      "exactly the staged-rank offset broadcast")
  }

  test("q420: LIKE quantifiers — one dimension scan, four codegen'd " +
    "predicates folded into one aggregate, no join") {
    val p = plan("q420_like_quantifiers")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q421: interval union — one corpus scan (both sweep endpoints " +
    "explode from the same row), one user-partitioned sweep window") {
    val p = plan("q421_interval_union")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(p.contains("hashpartitioning(user_id"),
      "the sweep sort must stay inside the user partition")
  }

  test("q422: dedup quality shift — pre and survivor mixes share the " +
    "checkpointed fingerprint frame; no corpus rescan") {
    val p = plan("q422_dedup_quality_shift")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q423: tokenizer fertility — one scan, subwords via the " +
    "aggregate() HOF (no explode/Generate), no join") {
    val p = plan("q423_tokenizer_fertility")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Generate"))
    assert(!p.contains("Join"))
  }

  test("q424: source leakage — corpus and bench sides share the " +
    "checkpointed gram frame; benchmark vocabulary joins broadcast") {
    val p = plan("q424_source_leakage_matrix")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q425: curriculum — staged thirds over the scored frame, " +
    "3-row output, offset broadcast is the only join") {
    val p = plan("q425_curriculum_schedule")
    // r13: the corpus ntile became a staged rank — the scored frame is
    // pinned (Scan ExistingRDD), the fine window is bucket-keyed, and
    // the bounded offset table attaches by broadcast
    // three Windows: offset cumsum + totals over the bounded bucket
    // rollup, and the bucket-keyed fine rank
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 3)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin""")) == 1,
      "exactly the staged-rank offset broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("NestedLoop"))
  }

  test("q426: Kruskal–Wallis — rank prefix, group sums, and tie sum " +
    "all branch off the checkpointed (v,lang) cell frame; the rank " +
    "window runs over the value domain, never the corpus") {
    val p = plan("q426_kruskal_wallis")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1)
  }

  test("q427: ANOVA F — one corpus scan, partial+final aggregate to " +
    "the 5-row group frame, no window, no join") {
    val p = plan("q427_anova_f")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "group sums must combine map-side")
    assert(!p.contains("Join"))
  }

  test("q428: McNemar — one scan folded into one 1-row aggregate; " +
    "no window, no join, no explode") {
    val p = plan("q428_mcnemar")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.contains("Generate"))
  }

  test("q429: BH-FDR — global moments re-aggregate the checkpointed " +
    "100-row cell frame (no second corpus scan); BH windows are " +
    "cell-frame-scale") {
    val p = plan("q429_bh_fdr")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q430: Bradley–Terry — MM rounds are 20-row math on " +
    "checkpointed frames; the driver plan never rescans the corpus") {
    val p = plan("q430_bradley_terry")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q431: TextRank — the top-k reads the checkpointed round-3 " +
    "rank frame: no scan, no Exchange, TakeOrdered not global sort") {
    val p = plan("q431_textrank_keywords")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 0)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q432: Krippendorff — unit and category rollups branch off " +
    "the checkpointed label frame; no corpus rescan") {
    val p = plan("q432_krippendorff_alpha")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q433: bool/bit aggregates — one scan, partial+final " +
    "aggregate, no join") {
    val p = plan("q433_bool_bit_aggs")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("Join"))
  }

  test("q434: lateral aliases — pure projection sugar: one scan, " +
    "one aggregate, no extra operators from the alias chain") {
    val p = plan("q434_lateral_alias")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.contains("Window"))
  }

  test("q435: IDENTIFIER clause — resolves to the plain scan+agg " +
    "plan, zero semantic residue") {
    val p = plan("q435_identifier_clause")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q436: Grubbs — deviation max branches off the checkpointed " +
    "dollar frame against the broadcast 1-row moment frame") {
    val p = plan("q436_grubbs")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q437: Brown–Forsythe — median and z-rollup branch off the " +
    "checkpointed (grp,y) frame; the 5-row median frame broadcasts") {
    val p = plan("q437_brown_forsythe")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q438: Cochran's Q — rows and columns fold into one corpus " +
    "pass: one scan, one 1-row aggregate, no join, no window") {
    val p = plan("q438_cochran_q")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q439: runs test — median rank, sign lag, and the final " +
    "aggregate all run on the checkpointed |days| frame") {
    val p = plan("q439_runs_test")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q440: saturation — deciles, first-seen, and occurrence mass " +
    "all branch off the checkpointed gram frame; no corpus rescan") {
    val p = plan("q440_saturation_curve")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q441: dup-rate sample — exact and sampled stats branch off " +
    "the checkpointed fingerprint frame") {
    val p = plan("q441_dup_rate_sample")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q443: nearest centroid — |labels| centroid frame broadcast " +
    "against the checkpointed vector frame; never a pair join") {
    val p = plan("q443_nearest_centroid_eval")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q444: norm audit — one scan, per-row integer norms, one " +
    "keyed rollup, no join, no window") {
    val p = plan("q444_embedding_norm_audit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
    assert(!p.matches("""(?s).*\(\d+\) Window.*"""))
  }

  test("q445: learning curve — three fits and the eval branch off " +
    "the checkpointed vector frame; centroid frames broadcast") {
    val p = plan("q445_learning_curve")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q446: skew planner — one keyed count rollup, then |keys|-" +
    "frame math; no join") {
    val p = plan("q446_skew_salt_planner")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q447: bloom sizing — three measured cardinalities cross the " +
    "2-row literal grid; grid side broadcast") {
    val p = plan("q447_bloom_sizing_planner")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q448: URL canonical dedup — per-row string algebra off the " +
    "checkpointed staged-URL frame; no join, one keyed rollup") {
    val p = plan("q448_url_canonical_dedup")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q449: mutation robustness — one scan, per-row set algebra " +
    "against the broadcast 3-row strength grid, 3-row rollup") {
    val p = plan("q449_mutation_robustness")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q481: license budget — one checkpointed source rollup " +
    "crossed with the broadcast policy grid") {
    val p = plan("q481_license_budget")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q482: blocking eval — both schemes score the checkpointed " +
    "key frame; no corpus rescan, no shuffle join") {
    val p = plan("q482_blocking_eval")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q479: marginal value — attribution and the corpus total " +
    "branch off the checkpointed gram-ownership frame") {
    val p = plan("q479_source_marginal_value")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q480: ESS — both schemes fold the checkpointed |langs| " +
    "frame; no corpus rescan, no join") {
    val p = plan("q480_ess_weights")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q477: conformal — calibration pick and coverage branch off " +
    "the checkpointed residual frame; q-hat broadcast to the test") {
    val p = plan("q477_conformal_interval")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q478: seasonal profile — MA window and 52-key rollup on " +
    "the checkpointed weekly frame") {
    val p = plan("q478_seasonal_profile")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q475: keyset pagination — every page is an independent " +
    "TakeOrdered seek; the whole plan is Exchange-free") {
    val p = plan("q475_keyset_pagination")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Exchange\s*""")) == 0,
      "keyset pages must not shuffle")
  }

  test("q476: Page trend — blocked ranks on the checkpointed weekly " +
    "frame, windows partition by week") {
    val p = plan("q476_page_trend")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(w"))
  }

  test("q473: tiering plan — per-user rollup checkpointed, the " +
    "watermark broadcast; tier math never rescans the corpus") {
    val p = plan("q473_data_tiering_plan")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q474: segment migration — both halves branch off the " +
    "checkpointed quartile frame; ntile partitions by half") {
    val p = plan("q474_segment_migration")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q471: backtest — folds and both prediction joins run on " +
    "the checkpointed weekly frame; origin rows broadcast") {
    val p = plan("q471_rolling_origin_backtest")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q472: robust scaler — 64 independent per-dim percentile " +
    "picks, windows partition by pos; no global sort") {
    val p = plan("q472_robust_scaler_fit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(pos"))
    assert(!p.contains("Join"))
  }

  test("q469: interference audit — exposure is one join over the " +
    "memoized co-supply edges against the checkpointed arm frame") {
    val p = plan("q469_interference_audit")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q470: isotropy — both metrics from the checkpointed 64-row " +
    "per-dim frame; no pair join anywhere") {
    val p = plan("q470_embedding_isotropy")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q467: target-encoding leakage — both encodings branch off " +
    "the checkpointed noise-scored frame; category sums broadcast") {
    val p = plan("q467_target_encoding_loo")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q468: QTE — per-arm decile picks run on the checkpointed " +
    "(arm,value) frame; windows partition by arm") {
    val p = plan("q468_qte_deciles")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(arm"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q465: boilerplate — instance and mass rollups branch off " +
    "the checkpointed sentence frame; boilerplate set broadcast") {
    val p = plan("q465_boilerplate_sentences")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q466: fulfillment lag — percentiles run on the checkpointed " +
    "(pri,lag) value frame, windows partition by priority") {
    val p = plan("q466_fulfillment_lag")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(pri"))
  }

  test("q463: prefix cache — one scan across the broadcast depth " +
    "grid, one (depth,prefix) rollup; no shuffle join") {
    val p = plan("q463_prefix_cache_analysis")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q464: propensity strata — strata and the ATT reweight run " +
    "on the checkpointed scored frame; the only join is the staged-rank " +
    "offset broadcast; windows are bounded-frame scale") {
    val p = plan("q464_propensity_strata")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    // r13: quintiles via Ranks.stagedGlobalRank — the bounded n_chars
    // offset table attaches by broadcast; no other join may appear
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastHashJoin""")) == 1,
      "exactly the staged-rank offset broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")
      && !p.contains("NestedLoop"))
  }

  test("q461: energy distance — all three pairwise-|Δ| masses from " +
    "one shared prefix window over the checkpointed value frame; " +
    "no pair join") {
    val p = plan("q461_energy_distance")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q462: GK gamma — concordant/discordant mass from the 20-row " +
    "cell table self-join, never order pairs") {
    val p = plan("q462_gk_gamma")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q459: successive halving — all 24 tournament cells from the " +
    "checkpointed one-pass frame; rank windows are config-scale") {
    val p = plan("q459_successive_halving")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q460: group sequential — cumulative looks are a 3-row " +
    "window over the checkpointed per-look frame") {
    val p = plan("q460_group_sequential")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("Join"))
  }

  test("q457: centrality probe — BFS rounds and the final rollup " +
    "branch off checkpointed frontier/edge frames; no corpus rescan") {
    val p = plan("q457_centrality_probe")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("CartesianProduct"))
  }

  test("q458: RLS views — both tenant views and the leak audit read " +
    "the one checkpointed base projection; no dim rescan") {
    val p = plan("q458_rls_tenant_views")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
  }

  test("q454: join hints — SHUFFLE_MERGE(c) forces the SMJ Spark " +
    "would not pick; BROADCAST(na) pins the dim side: both appear") {
    val p = plan("q454_join_hints")
    assert(p.contains("SortMergeJoin"),
      "the customer join must obey the SHUFFLE_MERGE hint")
    assert(p.contains("BroadcastHashJoin"),
      "the nation join must obey the BROADCAST hint")
  }

  test("q455: Cronbach — one scan folds all four moment pairs into " +
    "one aggregate; no join, no window") {
    val p = plan("q455_cronbach_alpha")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("Join"))
  }

  test("q456: sample-size planner — one keyed rollup crossed with " +
    "the broadcast 2-row width grid") {
    val p = plan("q456_sample_size_planner")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q452: LSH chooser — grid scoring runs on the checkpointed " +
    "pair-similarity frame against the broadcast 12-row grid") {
    val p = plan("q452_lsh_config_chooser")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q453: blocklist gate — host census rollup, then a broadcast " +
    "non-equi suffix join; never a shuffle join") {
    val p = plan("q453_domain_blocklist_gate")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 1)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q450: Jonckheere — all 10 pair terms fold into one pass " +
    "over the checkpointed value frame; one shared prefix window") {
    val p = plan("q450_jonckheere")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Window\s*""")) == 1,
      "the five prefix sums must share one Window node")
  }

  test("q451: Friedman — block completeness and ranks are two " +
    "week-partitioned windows over the checkpointed |weeks| frame") {
    val p = plan("q451_friedman_test")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 0)
    assert(p.contains("hashpartitioning(w"),
      "rank windows partition by week, never a global sort")
  }

  test("q442: union by name — two pruned scans, aligned union, one " +
    "aggregate; no join") {
    val p = plan("q442_union_by_name")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) Scan parquet\s*""")) == 2)
    assert(p.contains("Union"))
    assert(!p.contains("Join"))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority)"),
      "the branch filters must reach both scans")
  }
}
