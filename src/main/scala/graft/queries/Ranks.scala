package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANK without a single-partition window (r13).
  *
  * `row_number().over(Window.orderBy(...))` on a corpus-sized frame pushes
  * every row through ONE task — locally invisible (5 000 docs sort in
  * milliseconds), at 100 TB a straggler that serializes the whole stage.
  * The standard fix is the two-stage rank (the q141 exact-percentile /
  * q209 prefix-sum shape, generalized here):
  *
  *   1. COARSE: per-bucket row counts, where the caller supplies a bucket
  *     expression MONOTONE in the order (a truncation/prefix of the first
  *      order key). The bucket-count frame is bounded by the bucket
  *      domain — broadcastable at any corpus size — so ITS global window
  *      (the running offset) is the documented bounded exception.
  *   2. FINE: row_number PARTITIONED BY bucket (a keyed shuffle, fully
  *      parallel) ordered by the caller's keys; global rank = bucket
  *      offset + within-bucket rank.
  *
  * Identical output to the single-partition form for any total order
  * (callers must pass tie-breaking order keys, as they already did).
  */
object Ranks {

  /** Adds `rankCol` (1-based global rank) and `totalCol` (total row
    * count) to `df`. `bucket` MUST be monotone non-decreasing along
    * `order` (e.g. order = n_chars asc, doc_id → bucket = n_chars DIV 64;
    * order = score DESC → bucket = -floor(score·1000)). */
  def stagedGlobalRank(df: DataFrame, bucket: Column, order: Seq[Column],
      rankCol: String, totalCol: String): DataFrame = {
    // The input feeds BOTH the coarse count and the fine rank — pin it so
    // its derivation runs once (unpinned, Catalyst re-expands the whole
    // upstream subtree per reference: q152's gram pipeline planned 4
    // scans). Per-query scratch, torn down by the bench between queries;
    // at 100 TB the equivalent is the cached/bucketed intermediate any
    // two-pass rank materializes.
    val b = df.withColumn("_rk_bkt", bucket).localCheckpoint()
    val offs = b.groupBy("_rk_bkt").agg(count(lit(1)).as("_rk_nb"))
      .withColumn("_rk_off", coalesce(sum("_rk_nb").over(
        Window.orderBy("_rk_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum("_rk_nb").over(Window.partitionBy()))
      .select(col("_rk_bkt"), col("_rk_off"), col(totalCol))
    val wb = Window.partitionBy("_rk_bkt").orderBy(order: _*)
    // NULL-SAFE bucket join (r14, ADVICE): a plain equi-join drops any row
    // whose bucket evaluates to NULL while the offset frame still counts it
    // (the null group survives the groupBy and is summed into the running
    // offset) — ranks would shift and rows silently vanish. `<=>` keeps the
    // null-bucket rows, and since the offset window's ASC order puts nulls
    // FIRST, they get offset 0 — exactly the NULLS FIRST placement of the
    // single-partition row_number() this helper replaces. Still a broadcast
    // hash join: EqualNullSafe is an equi-join key.
    val offsR = offs.withColumnRenamed("_rk_bkt", "_rk_bkt_o")
    b.join(broadcast(offsR), col("_rk_bkt") <=> col("_rk_bkt_o"))
      .withColumn(rankCol, col("_rk_off") + row_number().over(wb))
      .drop("_rk_bkt", "_rk_bkt_o", "_rk_off")
  }

  /** Per-group NTILE(t) COUNTS without ranking every row (r14).
    *
    * Equivalent to
    * {{{
    *   stagedGlobalRank(df, bucket, order, "r", "n")
    *     .withColumn(tileCol, ntileFromRank(col("r"), col("n"), t))
    *     .groupBy(groupCols :+ tileCol).count()
    * }}}
    * but the only rows that ever see a row_number are those in buckets a
    * tile boundary cuts THROUGH (at most t−1 buckets): a bucket wholly
    * inside one tile contributes its per-group counts wholesale from the
    * coarse (bucket × group) aggregate — the keyed, map-side-combined
    * pass the caller's own final groupBy already implies. r13's general
    * staged rank paid a corpus checkpoint + broadcast join + keyed window
    * to assign per-row ranks the caller's groupBy immediately discarded
    * (q460 0.32→0.79 s, q462 0.39→0.85 s local); this shape is cheaper
    * than BOTH the general helper and the single-partition window it
    * replaced, and at scale the fine window touches only the straddler
    * buckets' rows (a pushdown-able bucket filter on the re-scan).
    *
    * Bit-identity: a row's tile depends only on its global rank; in a
    * non-straddler bucket every rank maps to the same tile, so those
    * counts are order-free; straddler rows get the exact
    * (bucket offset + within-bucket row_number over `order`) rank of the
    * general helper. Callers pass total tie-breaking order keys, as they
    * already did. Null buckets follow stagedGlobalRank's NULLS FIRST
    * placement (range-frame offsets order nulls first; the straddler
    * filter and offset literals carry explicit isNull branches).
    *
    * Returns one row per (groupCols…, tileCol) with `cntCol` (BIGINT);
    * tiles with zero rows for a group are absent, as with the groupBy
    * form. `bucket` must be monotone non-decreasing along `order`, and
    * `groupCols` must name existing columns of `df`.
    *
    * DETERMINISM CONTRACT (r15, ADVICE): `df` and `bucket` must be
    * deterministic. The straddler pass re-scans the UNPINNED input —
    * deliberately: pinning `b` would reintroduce the corpus-sized
    * checkpoint this helper exists to remove, and the re-scan arrives
    * with a literal bucket filter that pushes to the source — so a
    * nondeterministic source expression (rand, monotonically_increasing_
    * id, a table mutated mid-query) could make the re-scanned bucket
    * masses disagree with the collected offsets and silently skew the
    * straddler tiles. stagedGlobalRank pins its input and has no such
    * contract; every current caller feeds parquet scans + deterministic
    * projections, which is the intended usage. */
  def stagedNtileCounts(df: DataFrame, bucket: Column, order: Seq[Column],
      t: Int, groupCols: Seq[String], tileCol: String,
      cntCol: String): DataFrame = {
    val gCols = groupCols.map(col)
    val b = df.withColumn("_nt_bkt", bucket)
    // coarse cells: (bucket × group) counts — bounded by the bucket/group
    // domain at any corpus size; pinned because the straddler probe, the
    // whole-bucket emission, and the final union all branch off it.
    // coalesce(1): every downstream stage over this bounded frame becomes
    // a single task — at local bench scale the fold's cost is pure stage
    // machinery, and 32 tasks per tiny stage dominated the corpus work.
    val cells = b.groupBy(col("_nt_bkt") +: gCols: _*)
      .agg(count(lit(1)).as("_nt_c")).coalesce(1).localCheckpoint()
    // Bucket offset/total/size via RANGE-frame windows DIRECTLY on cells
    // (no bucket-grain groupBy + join back): the offset is the mass of
    // strictly smaller buckets — rangeBetween(…, -1) over the bucket
    // value; nulls order first, so a null bucket gets offset 0 and its
    // mass precedes every non-null bucket — stagedGlobalRank's NULLS
    // FIRST placement (pinned in RanksSpec).
    // (for the null bucket itself a RANGE frame spans its own peer group
    // — measured — so it is pinned to offset 0 explicitly)
    val ann = cells
      .withColumn("_nt_off", when(col("_nt_bkt").isNull, lit(0L))
        .otherwise(coalesce(sum("_nt_c").over(
          Window.orderBy("_nt_bkt")
            .rangeBetween(Window.unboundedPreceding, -1)), lit(0L))))
      .withColumn("_nt_nb",
        sum("_nt_c").over(Window.partitionBy("_nt_bkt")))
      .withColumn("_nt_n", sum("_nt_c").over(Window.partitionBy()))
      .withColumn("_nt_t1",
        ntileFromRank(col("_nt_off") + 1, col("_nt_n"), t))
      .withColumn("_nt_t2",
        ntileFromRank(col("_nt_off") + col("_nt_nb"), col("_nt_n"), t))
    // whole buckets: first and last row share a tile → every row does —
    // their cells pass straight through, no join, no ranking
    val whole = ann.filter(col("_nt_t1") === col("_nt_t2"))
      .select(gCols :+ col("_nt_t1").as(tileCol)
        :+ col("_nt_c").as(cntCol): _*)
    // straddler buckets (≤ t−1 BY CONSTRUCTION — bounded by the literal
    // t, the bench's bounded-small collect class): collect (bucket,
    // offset, total) and inline them as literals, so the re-scan gets a
    // literal bucket filter that commutes BELOW the caller's projection
    // (q460's per-row md5 arm runs only for surviving rows — without
    // this the second pass re-paid the projection corpus-wide) and the
    // fine rank needs no broadcast join at all.
    val straddle = ann.filter(col("_nt_t1") =!= col("_nt_t2"))
      .select("_nt_bkt", "_nt_off", "_nt_n").distinct().collect()
    // Invariant, not a tunable: the t−1 tile boundaries each fall inside
    // exactly one bucket's contiguous rank interval, so >t−1 straddlers
    // means the offset/interval arithmetic itself broke (e.g. a bucket
    // expression whose value changed between the cells agg and this
    // probe — see the determinism contract above). Name the caller's
    // expressions so a production failure points at the query, not here.
    require(straddle.length < t,
      s"stagedNtileCounts(t=$t, bucket=`$bucket`, order=${
        order.mkString("[", ", ", "]")}, groups=${
        groupCols.mkString("[", ", ", "]")}, tileCol=$tileCol): " +
        s"${straddle.length} straddler buckets exceed the t-1=${t - 1} " +
        "bound — bucket/offset invariant violated (nondeterministic " +
        "bucket or input?)")
    val out = if (straddle.isEmpty) whole else {
      val keys = straddle.map(_.get(0))
      val nonNullKeys = keys.filter(_ != null).toSeq
      val bktFilter = {
        val in =
          if (nonNullKeys.isEmpty) lit(false)
          else col("_nt_bkt").isInCollection(nonNullKeys)
        if (keys.contains(null)) in || col("_nt_bkt").isNull else in
      }
      val offExpr = straddle.foldLeft(lit(0L)) { (acc, r) =>
        val cond = if (r.get(0) == null) col("_nt_bkt").isNull
          else col("_nt_bkt") === lit(r.get(0))
        when(cond, lit(r.getLong(1))).otherwise(acc)
      }
      val nTotal = lit(straddle.head.getLong(2))
      val wf = Window.partitionBy("_nt_bkt").orderBy(order: _*)
      val cut = b.filter(bktFilter)
        .withColumn(tileCol, ntileFromRank(
          offExpr + row_number().over(wf), nTotal, t))
        .groupBy(gCols :+ col(tileCol): _*)
        .agg(count(lit(1)).as(cntCol))
        .select(gCols :+ col(tileCol) :+ col(cntCol): _*)
      whole.unionByName(cut)
    }
    out.groupBy(gCols :+ col(tileCol): _*).agg(sum(cntCol).as(cntCol))
  }

  /** ANSI NTILE(t) from a 1-based global rank and the total count —
    * "first n MOD t tiles get ⌈n/t⌉ rows", bit-matching Spark's and
    * DuckDB's NTile so oracles replay it. Evaluated as t−1 exact integer
    * boundary comparisons (tile k ends at k·⌊n/t⌋ + min(k, n MOD t)) —
    * no column division in the comparisons, so no float-rounding edge
    * exists FOR n < 2^53: the one double op is the quotient n/t, and an
    * IEEE double holds every integer up to 2^53 exactly, so its floor is
    * the exact integer quotient in that range (any real corpus — 10^12
    * rows ≈ 2^40 — is far inside it; past 2^53 the floor could land one
    * off and shift a tile boundary). */
  def ntileFromRank(r: Column, n: Column, t: Int): Column = {
    val bs = floor(n / t).cast("bigint") // exact for n < 2^53, see scaladoc
    val rem = n - bs * t
    (1 until t).foldLeft(lit(1L)) { (acc, k) =>
      acc + when(r > lit(k.toLong) * bs + least(lit(k.toLong), rem), 1L)
        .otherwise(0L)
    }
  }
}
