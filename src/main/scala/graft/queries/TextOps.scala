package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.ld

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline surface (beyond the reference, which has no
  * string processing at all: `unary.rs:97-106` is all todo!()).
  *
  * All expressions are Catalyst built-ins (codegen'd higher-order functions,
  * no UDFs), so they pipeline inside WholeStageCodegen and scale linearly
  * with input splits: per-doc ops are embarrassingly parallel; the pairwise
  * ops (jaccard, minhash-LSH) join on shingle/bucket keys so the shuffle is
  * keyed and bounded by candidate pairs, never a full cross product.
  */
object TextOps {

  import org.apache.spark.sql.expressions.Window

  /** Distinct word-3-gram shingles per doc, 64-bit-hashed, built MAP-SIDE:
    * posexplode the token array while carrying the array itself through the
    * Generate, then fetch the two following tokens by index (`get`, 0-based,
    * NULL past the end — exactly `lead()`'s semantics). Scan → Generate →
    * Project → partial-agg is ONE whole-stage-codegen'd pipeline with no
    * exchange: r1-r14 built the leads with a doc_id window instead, which
    * shuffled and sorted the full exploded token stream just to see two
    * tokens ahead — at 100 TB that was a corpus-wide shuffle (guide §2.4,
    * removed r15; measured sf0.1 q45 1.26→0.9 s class, plan 1 Exchange
    * fewer on every shingle consumer). The OTHER declarative alternative —
    * transform/array lambdas — stays rejected: higher-order functions
    * evaluate interpreted, measured ~8 s per pass at sf0.1. Gram strings
    * are identical to the window build, so every downstream hash and every
    * oracle matches bit-for-bit.
    */
  private[queries] def shingles(s: SparkSession, d: String): DataFrame =
    shinglesBy(s, d, (t0, t1, t2) => xxhash64(t0, t1, t2))

  /** [[shingles]] with an engine-portable 32-bit md5 gram hash, for queries
    * whose DuckDB oracle must reproduce the hash bit-for-bit (q46): Spark
    * `conv(substr(md5(g),1,8),16,10)` == DuckDB
    * `('0x'||substr(md5(g),1,8))::BIGINT` over the same "t0 t1 t2" gram
    * string. 32 bits is enough because BOTH engines compute the identical
    * value — a collision collides identically on each side. */
  private def shinglesPortable(s: SparkSession, d: String): DataFrame =
    shinglesBy(s, d, (t0, t1, t2) =>
      conv(substring(md5(concat_ws(" ", t0, t1, t2)), 1, 8), 16, 10)
        .cast("long"))

  /** Stopword-count language scores + argmax prediction per doc — the
    * q43 classifier, shared with q230's confusion-matrix evaluation. */
  private def langIdScored(docs: DataFrame): DataFrame = {
    def occ(w: String): String = {
      val l = w.length
      s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$w', ''))) / $l"
    }
    docs
      .selectExpr("doc_id", "lang",
        s"${occ(" the ")} + ${occ(" a ")} + ${occ(" of ")} AS s_en",
        s"${occ(" le ")} + ${occ(" la ")} + ${occ(" et ")} AS s_fr",
        s"${occ(" der ")} + ${occ(" die ")} + ${occ(" und ")} AS s_de",
        s"${occ(" el ")} + ${occ(" los ")} + ${occ(" y ")} AS s_es")
      .selectExpr("doc_id", "lang", "s_en", "s_fr", "s_de", "s_es",
        """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang""")
  }

  private def shinglesBy(s: SparkSession, d: String,
      gramHash: (Column, Column, Column) => Column): DataFrame =
    ld(s, d, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("source"), col("tok"),
        get(col("toks"), col("pos") + 1).as("t1"),
        get(col("toks"), col("pos") + 2).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("source"),
        gramHash(col("tok"), col("t1"), col("t2")).as("gh"))
      .distinct()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content digest; at 100 TB this is one
    // shuffle keyed on the digest — the canonical scalable exact-dedup plan.
    "q40_dedup_exact" -> ((s, d) =>
      ld(s, d, "documents")
        .groupBy(md5(col("text")).as("fp")).agg(
          min("doc_id").as("canonical_id"),
          count(lit(1)).as("dup_count"))
        .select("fp", "canonical_id", "dup_count")
        .orderBy("canonical_id")),

    "q41_text_tokens" -> ((s, d) =>
      ld(s, d, "documents").selectExpr(
        "doc_id",
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens",
        "cast(size(array_distinct(split(text, ' '))) AS int) AS n_uniq",
        """round(length(replace(text, ' ', '')) /
           cast(length(text) - length(replace(text, ' ', '')) + 1 AS double), 4)
           AS avg_tok_len""",
        "length(text) = n_chars AS chars_ok")
        .orderBy("doc_id")),

    "q42_text_quality" -> ((s, d) =>
      ld(s, d, "documents").selectExpr(
        "doc_id",
        "length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens",
        """round(size(array_distinct(split(text, ' '))) /
           cast(length(text) - length(replace(text, ' ', '')) + 1 AS double), 4)
           AS uniq_ratio""",
        """round(least(cast(1.0 AS double),
                 cast(length(text) - length(replace(text, ' ', '')) + 1 AS double) / 100)
           * (size(array_distinct(split(text, ' '))) /
              cast(length(text) - length(replace(text, ' ', '')) + 1 AS double)), 4)
           AS quality""",
        "n_chars < 100 AS too_short")
        .orderBy("doc_id")),

    // Stopword-marker language ID. On this synthetic corpus (shared
    // English-ish vocabulary for every lang label) accuracy is what it is —
    // the point is the deterministic, fully-pushed-down scoring plumbing.
    "q43_lang_id" -> ((s, d) =>
      langIdScored(ld(s, d, "documents"))
        .selectExpr("doc_id", "lang", "s_en", "s_fr", "s_de", "s_es",
          "pred_lang", "pred_lang = lang AS correct")
        .orderBy("doc_id")),

    // Content fingerprints: whole-doc digest prefix + min-shingle digest
    // (a 1-permutation MinHash — the degenerate but portable case).
    // Tokenize once into `w`, build shingles by index — the naive inline
    // form re-split the text per sub-expression and cost ~8 s at sf0.1.
    "q44_fingerprint" -> ((s, d) =>
      ld(s, d, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("w"))
        .selectExpr(
          "doc_id",
          "substr(md5(text), 1, 16) AS fp16",
          "substr(md5(text), 1, 2) AS band",
          """CASE WHEN size(w) >= 3
               THEN array_min(transform(sequence(0, size(w) - 3),
                      i -> md5(concat(w[i], ' ', w[i+1], ' ', w[i+2]))))
               ELSE NULL END AS min_gram_fp""")
        .orderBy("doc_id")),

    // Exact n-gram Jaccard between same-source doc pairs. Scale shape:
    // explode distinct shingles → shuffle keyed on shingle-hash →
    // pair-count aggregation; never materializes the doc×doc product.
    // Shingles are 64-bit-hashed BEFORE the shuffle: the exchanged rows and
    // the join comparisons are fixed-width longs instead of ~20-byte strings
    // (identical pair counts modulo 2^-64 collisions).
    //
    // r3's plan rebuilt the whole shingle pipeline FOUR times (both
    // self-join sides + both `sizes` joins — ReusedExchange only dedups
    // Exchange subtrees, and each branch's aggregation differed), measured
    // 5.0 s at sf0.1. Now the shingle frame is computed ONCE: the per-doc
    // distinct-shingle count rides along as a window count (`n`), and
    // `repartition($"gh")` plants the one Exchange both self-join sides
    // reuse — na/nb come through the join itself, so the `sizes` joins are
    // gone. PlanSpec pins "≤ 2 documents scans" so the 4× recompute can't
    // drift back in. HashPartitioning(gh) co-locates the (gh, source) join
    // keys (same gh ⇒ same partition), so the self-join adds no Exchange.
    // The shuffle_hash hint matters twice over: Catalyst's stats otherwise
    // pick a broadcast join here, which (a) rebuilds the whole pipeline
    // under the BroadcastExchange (ReusedExchange only matches IDENTICAL
    // exchange subtrees) and (b) is the wrong plan at scale anyway — both
    // sides are corpus-sized.
    "q45_ngram_jaccard" -> ((s, d) => {
      val sh = shingles(s, d)
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy("doc_id")).cast("int"))
        .repartition(col("gh"))
      val inter = sh.as("a").join(sh.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"),
          max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      inter
        // 4-decimal Jaccard rounded in exact integer space — (2a·10⁴+b) div
        // 2b — because round(double,4) splits across engines at .xxxx5
        // boundaries (the q70/q95 class; n_inter and the union size are
        // exact integers, so the quotient can land exactly on one).
        .select(col("da"), col("db"), col("n_inter"),
          expr("""CAST((2 * n_inter * 10000 + (na + nb - n_inter))
                       DIV (2 * (na + nb - n_inter)) AS DOUBLE)
                  / 10000""").as("jac"))
        .orderBy("da", "db")
    }),

    // MinHash + LSH near-dup candidates (3-gram shingles, 16 hashes, 4
    // bands of 4). Candidates come only from band-bucket joins — the 100 TB
    // path: shuffle keyed on (band_idx, band minhashes), cross product never
    // formed. Two r4 upgrades:
    //  * Every hash is engine-portable (gram hash via [[shinglesPortable]];
    //    permutations are the (a·x+b) mod p universal family in plain
    //    BIGINT arithmetic), so the DuckDB oracle reproduces the signatures
    //    bit-for-bit and this query moved from property-checked to a REAL
    //    hash-matched row. The oracle's candidate set is the brute-force
    //    "shares ≥ 1 band" pair scan, so the green row also proves banding
    //    lost nothing.
    //  * The 16 minhashes ride THROUGH the band explode, so the estimate is
    //    computed inside the one self-join — r3 re-joined the corpus-sized
    //    signature table twice, and broadcast it to boot (the round's one
    //    scale-killer). Now there is no signature re-join at all: 4 band
    //    rows × (4 key + 16 payload) longs per doc, keyed shuffle, linear.
    //    PlanSpec pins "no BroadcastExchange" so neither can regress.
    "q46_minhash_lsh" -> ((s, d) => {
      // 3-gram shingles, not bare tokens: this corpus has a ~31-word
      // vocabulary, so token-level minhash is degenerate (every doc contains
      // the globally-minimal token → all signatures collide and the band
      // join approaches the full cross product). Shingles span a ~vocab³
      // space and make the signature actually discriminative.
      // min() per permutation inside one codegen'd groupBy is the
      // map-side-combined minhash. The permutations are the classic
      // universal-hash family (a·x + b) mod p — pure integer arithmetic
      // both engines compute identically (a < 2^30, x < 2^32 ⇒ the product
      // stays under 2^62, no BIGINT overflow on either side), measured
      // ~2× faster than 16 per-row md5 re-hashes.
      val minhashes = minhashPerms.zipWithIndex.map { case ((a, b), j) =>
        min((lit(a) * col("gh") + lit(b)) % lit(MinhashP)).as(s"m$j") }
      val sig = shinglesPortable(s, d).groupBy("doc_id")
        .agg(minhashes.head, minhashes.tail: _*)
      // Band key = the band's 4 raw minhashes (k0..k3), not a hash of them:
      // tuple equality is exactly "all 4 match", so the Spark candidate set
      // is collision-free and the oracle's OR-of-band-equalities replays it
      // exactly. The 16 m's are carried as payload for the estimate.
      val stackRows = (0 until 4).map(b =>
        s"$b, m${4 * b}, m${4 * b + 1}, m${4 * b + 2}, m${4 * b + 3}")
        .mkString(", ")
      val buckets = sig.selectExpr(
        ("doc_id" +: (0 until 16).map(j => s"m$j")) :+
          s"stack(4, $stackRows) AS (band_idx, k0, k1, k2, k3)": _*)
      val est = (0 until 16).map(j =>
        when(col(s"x.m$j") === col(s"y.m$j"), 1).otherwise(0)).reduce(_ + _)
      // shuffle_hash: the bucket table is 4 rows per corpus document, so
      // Catalyst's broadcast choice would be a corpus-sized broadcast —
      // key the shuffle on the band tuple instead.
      buckets.as("x").join(buckets.as("y").hint("shuffle_hash"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.k0") === col("y.k0") && col("x.k1") === col("y.k1") &&
            col("x.k2") === col("y.k2") && col("x.k3") === col("y.k3") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          round(est.cast("double") / 16.0, 4).as("est_jac"))
        .distinct() // a pair can share several bands
        .orderBy("da", "db")
    }),

    // SimHash (32-bit, token-frequency weighted via duplicate tokens) —
    // see the relational `simhash` helper below.
    "q47_simhash" -> ((s, d) =>
      simhash(ld(s, d, "documents")).orderBy("doc_id")),

    // SimHash near-dup pairs by Hamming distance ≤ 6. Banding was measured
    // and REJECTED here: 4-bit bands of the 32-bit simhash put >50% of this
    // corpus in a single bucket (similar docs share band values — that is
    // the point of simhash), yielding 22.4M candidate rows vs 12.5M brute
    // pairs. All-pairs with a broadcast build side (signatures are 2 longs
    // per doc) is the faster exact plan on THIS small corpus; q67 is the
    // 100 TB variant (64-bit simhash, 8-bit bands, keyed bucket join) and
    // produces exactly the 64-bit analogue of this output.
    "q48_simhash_neardup" -> ((s, d) => {
      val sim = simhash(ld(s, d, "documents"))
      sim.as("a").join(broadcast(sim.as("b")), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("da", "db")
    }),

    // The SCALE-SAFE exact near-dup: 64-bit simhash, 8 bands of 8 bits,
    // bucket equi-join for candidates, exact Hamming re-rank. Recall is
    // GUARANTEED 100% for threshold ≤ 7 by pigeonhole: two signatures with
    // ≤ 7 differing bits cannot differ in all 8 disjoint bytes, so every
    // qualifying pair shares at least one (band_idx, band_val) bucket.
    // Measured on this corpus at sf0.1: 5.09M candidate rows vs 12.5M brute
    // pairs (0.41×), and the shuffle is KEYED on the band value — at 100 TB
    // this is a bucket join, never a broadcast of a corpus-sized build side
    // (q48's plan dies when the signature table outgrows the broadcast
    // limit; this one just adds reducers). The token hash is md5-derived
    // (not xxhash64) so DuckDB computes the identical signature: the oracle
    // is the BRUTE-FORCE pair scan over the same simhash, i.e. the green
    // row also proves the banding lost nothing.
    //
    // Band-width scaling math: fixed 8-bit bands prune the pair space by a
    // CONSTANT — random pairs collide on a given band with p = 2^-8, so
    // candidates ~ 8·n²/2·2^-8 ≈ n²/64 — still Θ(n²). Measured here: 0.41×
    // brute. For the pigeonhole recall guarantee (ham ≤ k needs ≥ k+1
    // disjoint bands) at growing n, hold bands at k+1 and WIDEN them so
    // 2^-width · n stays O(1) per bucket: e.g. 4×16-bit bands guarantee
    // ham ≤ 3 with p = 2^-16 collisions (n can grow 256× for the same
    // candidate density); beyond that, shard on a second signature tier
    // and re-rank, as q68 does for embeddings.
    "q67_simhash_banded" -> ((s, d) =>
      simhashBandedPairs(ld(s, d, "documents")).orderBy("da", "db")),

    // q67's band-width-scaling math, DEMONSTRATED: 4 bands of 16 bits over
    // the same 64-bit signature. Pigeonhole gives guaranteed 100% recall at
    // hamming ≤ 3 (≤3 flipped bits cannot touch all 4 disjoint 16-bit
    // bands), and random band collisions drop from 2^-8 to 2^-16 — the
    // corpus can grow 256× before per-bucket candidate density returns to
    // q67's level. Measured at sf0.1 (5000 docs, 12.50M brute pairs):
    // 191,241 bucket-join candidates (0.015× brute) vs q67's 5.09M
    // (0.41×) — 27× fewer pairs re-ranked for the tighter threshold.
    // Same plan shape: keyed (band_idx, band_val) bucket
    // equi-join, exact Hamming re-rank, never a corpus broadcast. The
    // oracle is the brute-force ham≤3 pair scan over the identical
    // signature, so a green row PROVES the wider banding lost nothing.
    "q105_simhash_banded16" -> ((s, d) => {
      val sig = simhash64(ld(s, d, "documents"))
      val bandCols = (0 until 4).map(j =>
        s"$j, cast(shiftright(sim64, ${16 * j}) & 65535 as int)")
        .mkString(", ")
      val buckets = sig.selectExpr("doc_id", "sim64",
        s"stack(4, $bandCols) AS (band_idx, band_val)")
      buckets.as("x").join(buckets.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_val") === col("y.band_val") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          bit_count(col("x.sim64").bitwiseXOR(col("y.sim64"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct() // a pair can share several bands
        .orderBy("da", "db")
    }),
  )

  /** BPE-ish regex tokenizer: letter runs, digit runs, single punctuation —
    * the pre-tokenization split most BPE vocabularies assume. Pure
    * projection, pushed down to the scan's output, linear at any scale. */
  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Near-dup CLUSTERING: connected components over the banded-simhash
    // candidate edges (q67's pipeline) — the step that turns pairwise
    // near-dup HITS into per-document CANONICAL assignments, the actual
    // fuzzy-dedup unit of work (keep cluster_id == doc_id, drop the rest;
    // transitivity matters because A≈B and B≈C must collapse to ONE kept
    // doc even when A,C share no band). The loop lives in
    // `connectedComponents` below; the oracle is a DuckDB recursive-CTE
    // transitive closure over the SAME (brute-force-equivalent) pair set,
    // so a green row proves the distributed propagation reached the exact
    // closure fixpoint.
    "q101_dedup_components" -> ((s, d) => {
      // checkpoint BEFORE the symmetrizing union inside the helper: a
      // union's branches are separate plan subtrees, so without it both
      // recompute the whole simhash pipeline (the r3 q45 recompute
      // lesson — measured 2× here)
      val edges = queries("q67_simhash_banded")(s, d).select("da", "db")
        .localCheckpoint()
      ld(s, d, "documents").select("doc_id")
        .join(GraphOps.connectedComponents(edges), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    // Vocabulary build + per-document coverage — the tokenizer-prep op:
    // rank tokens by global frequency, keep the top 20 as the vocab (ties
    // broken by token so the cut is deterministic in both engines), then
    // score every document by how much of it the vocab covers. Coverage is
    // integer BASIS POINTS, not a rounded double: k/n then round(,4)
    // disagrees across engines exactly at .xxxx5 boundaries (the r4 q70
    // lesson), while (10000·k) div n is exact in both. Scale shape: ONE
    // (doc_id, tok) explode+agg subtree feeds all three branches (its
    // Exchange is stage-cache-dedup'd at runtime); the vocab is tiny by
    // construction (top-K of a keyed agg) → broadcast into the coverage
    // join; per-doc counts are keyed aggs. At 100 TB only K grows.
    "q106_vocab_coverage" -> ((s, d) => {
      val perTok = ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val vocab = perTok.groupBy("tok").agg(sum("c").as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20).select("tok")
      val perDoc = perTok.groupBy("doc_id").agg(sum("c").as("n_tok"))
      val inVocab = perTok.join(broadcast(vocab), "tok")
        .groupBy("doc_id").agg(sum("c").as("nv"))
      perDoc.join(inVocab, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tok"),
          coalesce(col("nv"), lit(0L)).as("n_vocab_tok"))
        .withColumn("cov_bp", expr("(10000 * n_vocab_tok) div n_tok"))
        .orderBy("doc_id")
    }),

    // Near-dup clustering over the MINHASH edge source: the same
    // connected-components primitive as q101 (simhash edges) and q102
    // (embedding edges), fed by q46's banded minhash candidates — the
    // third rung proving the CC step is similarity-source-agnostic. The
    // oracle is an exact recursive-CTE closure over the full-replay
    // minhash pair set (q46's own oracle CTEs, shared verbatim).
    "q107_minhash_components" -> ((s, d) => {
      // checkpoint before the helper's symmetrizing union — else both
      // union branches recompute the whole minhash pipeline (r3 lesson)
      val edges = queries("q46_minhash_lsh")(s, d).select("da", "db")
        .localCheckpoint()
      ld(s, d, "documents").select("doc_id")
        .join(GraphOps.connectedComponents(edges), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),

    // LEAKAGE-AWARE dataset split — q142's md5 split with the key moved
    // from the DOCUMENT to its NEAR-DUP CLUSTER: a doc-keyed split puts
    // near-identical docs on both sides of the train/test fence, and the
    // eval set silently scores memorization (the classic contamination
    // path that survives doc-level dedup audits). Group-wise splitting —
    // sklearn's GroupShuffleSplit posture, with q101's connected
    // components as the groups — makes straddling IMPOSSIBLE by
    // construction: the split is a pure function of cluster_id, so every
    // member lands together. Singletons (docs in no near-dup edge) fall
    // back to their own id — the same md5 stream, so the corpus-level
    // 80/10/10 proportions hold. The audit reports, per (split, source):
    // docs, distinct clusters, chars, and n_moved = docs whose doc-keyed
    // split would have differed — the rows this fix actually relocated
    // (≈ non-canonical cluster members, ~11 % of the fence). Scale: one
    // CC run over edge-sized frames + a map-only split expression — the
    // same md5 bucket is the frozen write's partition column at 100 TB.
    "q181_leakage_split" -> ((s, d) => {
      // checkpoint before the symmetrizing union (the q101 lesson)
      val edges = queries("q67_simhash_banded")(s, d).select("da", "db")
        .localCheckpoint()
      def bucket(c: String) =
        expr(s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 8), 16," +
          s" 10) AS BIGINT) % 100")
      def splitOf(b: Column) =
        when(b < 80, "train").when(b < 90, "val").otherwise("test")
      ld(s, d, "documents").select("doc_id", "source", "n_chars")
        .join(GraphOps.connectedComponents(edges), Seq("doc_id"), "left")
        .withColumn("cluster_id",
          coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("split", splitOf(bucket("cluster_id")))
        .withColumn("doc_split", splitOf(bucket("doc_id")))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum("n_chars").as("tot_chars"),
          sum(when(col("doc_split") =!= col("split"), 1L).otherwise(0L))
            .as("n_moved"))
        .orderBy("split", "source")
    }),

    // WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    // the MOSS algorithm): from every window of w=4 consecutive 3-gram
    // hashes, keep the RIGHTMOST MINIMUM — a position-robust ~2/(w+1)
    // subsample of the gram stream that GUARANTEES any shared run of
    // ≥ w+2 tokens leaves at least one shared fingerprint (the winnowing
    // theorem), unlike uniform sampling which can miss arbitrarily long
    // overlaps. The min-with-rightmost-tie-break is ONE window min over
    // an integer encoding v = h·2²⁰ + (2²⁰−1−pos): the hash occupies the
    // high bits so min(v) orders by hash first, and the negated position
    // in the low bits makes the rightmost occurrence win ties — no
    // struct ordering, no min_by, engine-portable (the oracle computes
    // the identical encoding; the constant 1-position offset between
    // Spark's 0-based and DuckDB's 1-based token index shifts every v in
    // a doc equally, so the argmin gram — and hence the fingerprint SET
    // — is unaffected). Docs with fewer than w grams keep their single
    // truncated start window, so every ≥3-token doc fingerprints.
    // Overlap then rides the q182 posting-list shape: fingerprint sets
    // self-join on h (shuffle keyed on the fingerprint, never n²),
    // shared counts meet the two set sizes, similarity in half-up basis
    // points of the SMALLER side (MOSS's containment-style score), with
    // a ≥25%-of-min emission gate. Measured at sf0.01: 10,095
    // fingerprints from 26,165 grams — 38.6%, right at the 2/(w+1)=40%
    // theoretical density — emitting 88 pairs. At 100 TB: the
    // fingerprint table is ~2/5 the gram table, the pair shuffle is
    // bounded by fingerprint collisions, and the same set powers
    // q98-style decontamination at a fraction of full-gram cost.
    "q188_winnow_fingerprint" -> ((s, d) => {
      val winw = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, 3)
      val doc = Window.partitionBy("doc_id")
      // map-side gram build (see shingles; r15): the rolling-min window
      // below still sorts by (doc_id, pos) — this removes the SEPARATE
      // lead-window pass over the wider token rows, not that sort.
      val fp = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), col("pos"),
          (conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long") * lit(1048576L) +
            (lit(1048575L) - col("pos"))).as("v"))
        .withColumn("minv", min("v").over(winw))
        .withColumn("maxp", max("pos").over(doc))
        .withColumn("minp", min("pos").over(doc))
        .filter(col("pos") + 3 <= col("maxp") ||
          (col("pos") === col("minp") && col("maxp") - col("minp") < 3))
        .selectExpr("doc_id", "minv DIV 1048576 AS h")
        .distinct()
        .localCheckpoint() // both join sides + the size aggregate read it
      val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      fp.as("a")
        .join(fp.as("b").hint("shuffle_hash"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.select(col("doc_id").as("da"), col("nf").as("na"))
          .hint("shuffle_hash"), "da")
        .join(sizes.select(col("doc_id").as("db"), col("nf").as("nb"))
          .hint("shuffle_hash"), "db")
        .filter(expr("4 * shared >= least(na, nb)"))
        .selectExpr("da", "db", "shared", "na", "nb",
          "(2 * shared * 10000 + least(na, nb))" +
            " DIV (2 * least(na, nb)) AS sim_bp")
        .orderBy("da", "db")
    }),

    // DISTINCT-n DIVERSITY (the corpus-health twin of q109's per-doc
    // repetition signals): per source, the distinct-to-total n-gram
    // ratio for n = 1, 2, 3 — the standard generation-diversity /
    // template-detection metric (a boilerplate-heavy source shows high
    // distinct-1 but collapsing distinct-3). Two-level aggregation by
    // design: groupBy(source, gram) → groupBy(source), so the first
    // shuffle map-side combines on the (source, gram) key and the
    // second sees only distinct grams — COUNT(DISTINCT) over a 100 TB
    // gram stream via expand would send every occurrence to one
    // per-source reducer. The token expansion (posexplode + two window
    // leads) is computed ONCE and checkpoint-pinned; all three widths
    // read it. Ratios in half-up basis points — integer-exact, order-
    // independent under parallel aggregation.
    "q190_distinct_ngram_diversity" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15);
      // `get` is NULL past the end exactly like lead(), so the level-2/3
      // validity filters see identical NULLs.
      val base = ld(s, d, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
        .select(col("source"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("source"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .localCheckpoint()
      def level(n: Int, gram: Column, valid: Column) = base.filter(valid)
        .groupBy(col("source"), gram.as("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("total_g"), count(lit(1)).as("distinct_g"))
        .select(col("source"), lit(n).as("n"), col("total_g"),
          col("distinct_g"),
          expr("(2 * distinct_g * 10000 + total_g) DIV (2 * total_g)")
            .as("diversity_bp"))
      level(1, col("tok"), lit(true))
        .unionByName(level(2, concat_ws(" ", col("tok"), col("t1")),
          col("t1").isNotNull))
        .unionByName(level(3, concat_ws(" ", col("tok"), col("t1"),
          col("t2")), col("t2").isNotNull))
        .orderBy("source", "n")
    }),

    // FEATURE HASHING (the hashing trick — Weinberger et al. 2009,
    // sklearn's HashingVectorizer): tokens map to a FIXED 256-bucket
    // feature space through md5, with a second hash bit choosing the
    // sign so colliding tokens cancel in expectation instead of piling
    // up — the property that lets the vectorizer run with NO vocabulary
    // pass, no dictionary broadcast, no OOV handling: exactly why it is
    // the default text featurizer at corpus scale (a learned vocab is a
    // second full scan plus a fleet-wide artifact to version). Buckets
    // whose signed counts cancel to zero are DROPPED — the sparse
    // representation the trick actually produces. Per doc: nnz, the L1
    // mass, and an md5 fingerprint of the bucket:value run serialized
    // in bucket order (the q177 ordered-serialization recipe), so the
    // oracle proves the full sparse VECTOR matches, not just its
    // summary stats. Shape: one (doc, bucket)-keyed map-side-combined
    // aggregate, then a doc-keyed one — the q190 two-level shape; sign
    // and bucket come from the same md5 call per token.
    "q199_feature_hashing" -> ((s, d) => {
      val sgn = "CASE WHEN substring(md5(tok), 9, 1) IN" +
        " ('8','9','a','b','c','d','e','f') THEN -1 ELSE 1 END"
      ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .selectExpr("doc_id",
          "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)" +
            " % 256 AS b",
          s"$sgn AS sgn")
        .groupBy("doc_id", "b").agg(sum("sgn").as("v"))
        .filter(col("v") =!= 0)
        .groupBy("doc_id").agg(
          count(lit(1)).as("nnz"),
          sum(abs(col("v"))).as("l1"),
          expr("md5(array_join(transform(array_sort(collect_list(" +
            "struct(b, v))), x -> concat(CAST(x.b AS STRING), ':'," +
            " CAST(x.v AS STRING))), ','))").as("vec_fp"))
        .orderBy("doc_id")
    }),

    // Dedup keeping the best representative per content key (lowest doc_id
    // here; in production, highest quality score): one window pass keyed on
    // the fingerprint — the "canonicalize duplicates" pipeline stage, as
    // opposed to q40 which only counts them.
    "q55_dedup_keep_best" -> ((s, d) => {
      val w = Window.partitionBy("fp").orderBy("doc_id")
      ld(s, d, "documents")
        .withColumn("fp", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // MinHash calibration: exact 3-gram Jaccard vs the 16-perm minhash
    // estimate over every same-source pair sharing ≥ 1 shingle, bucketed
    // by exact-Jaccard decile with the mean absolute estimation error —
    // the validation pass that JUSTIFIES a minhash threshold before a
    // production run trusts q46's candidates at 100 TB. Everything stays
    // in exact integer basis points: jac_bp is the (2a·10⁴+u) div 2u
    // round-half-up identity, est_bp = matches·625 is exact because 16
    // divides 10⁴, and the per-bucket mean applies the same integer
    // identity — no float summation order anywhere, so both engines emit
    // identical doubles. Scale shape: the portable gram pipeline feeds
    // both the pair join (keyed on gram hash, same-source bound, as q45)
    // and the signature aggregate; the per-pair estimate attaches via two
    // doc_id-keyed shuffle_hash joins against the corpus-sized signature
    // table — never broadcast.
    "q112_minhash_calibration" -> ((s, d) => {
      val sh = shinglesPortable(s, d)
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy("doc_id")).cast("int"))
        .repartition(col("gh"))
      val inter = sh.as("a").join(sh.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"),
          max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
        .withColumn("jac_bp",
          expr("""(2 * n_inter * 10000 + (na + nb - n_inter))
                  DIV (2 * (na + nb - n_inter))"""))
      val minhashes = minhashPerms.zipWithIndex.map { case ((a, b), j) =>
        min((lit(a) * col("gh") + lit(b)) % lit(MinhashP)).as(s"m$j") }
      val sig = shinglesPortable(s, d).groupBy("doc_id")
        .agg(minhashes.head, minhashes.tail: _*)
      val matches = (0 until 16).map(j =>
        when(col(s"sa.m$j") === col(s"sb.m$j"), 1).otherwise(0))
        .reduce(_ + _)
      inter
        .join(sig.as("sa").hint("shuffle_hash"),
          col("da") === col("sa.doc_id"))
        .join(sig.as("sb").hint("shuffle_hash"),
          col("db") === col("sb.doc_id"))
        .select(col("jac_bp"), (matches * lit(625)).as("est_bp"))
        .groupBy(expr("CAST(jac_bp DIV 1000 AS INT)").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("est_bp") - col("jac_bp"))).as("sum_abs"))
        .selectExpr("bucket", "n_pairs",
          """CAST((2 * sum_abs * 10000 + n_pairs) DIV (2 * n_pairs)
                  AS DOUBLE) / 10000 AS mean_abs_err_bp""")
        .orderBy("bucket")
    }),

    // Quality gate by percentile: keep docs whose length is at or above
    // the corpus's 25th percentile. Two-pass shape: tiny exact-percentile
    // aggregate broadcast into the filter — at 100 TB the percentile comes
    // from a sketch (q38) and the filter plan is unchanged.
    "q56_quality_gate" -> ((s, d) => {
      val docs = ld(s, d, "documents")
      val p25 = docs.agg(expr("percentile(n_chars, 0.25)").as("p25"))
      docs.crossJoin(broadcast(p25))
        .filter(col("n_chars") >= col("p25"))
        .groupBy("source").agg(
          count(lit(1)).as("n_kept"),
          round(avg("n_chars"), 4).as("avg_len"))
        .orderBy("source")
    }),

    // Deterministic hash-style sampling: a keyed arithmetic hash mod 100
    // picks a reproducible ~10% sample — no RNG state, stable across
    // executors, retries, and engines (unlike df.sample).
    "q57_det_sample" -> ((s, d) =>
      ld(s, d, "documents")
        .filter((col("doc_id") * 48271L) % 100 < 10)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    "q51_bpe_tokens" -> ((s, d) => {
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
      ld(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_bpe"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
          .as("n_word"),
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
          .as("n_num"))
        .orderBy("doc_id")
    }),

    // BPE merge INDUCTION — the tokenizer-TRAINING counterpart of q51's
    // tokenizer-application: one merge round of byte-pair encoding,
    // computed the way it scales to 100 TB. The only corpus-scale work is
    // the word-frequency aggregate (map-side combined, shuffled on the
    // word); everything after runs on the VOCABULARY — each distinct word
    // is char-exploded once and its adjacent-symbol pairs weighted by the
    // word's corpus frequency, so a word appearing a billion times costs
    // one row, not a billion. That vocab-not-corpus pivot is exactly how
    // production BPE trainers make merge counting tractable; q124 closes
    // the loop (K training rounds re-tokenizing the vocab, driver loop
    // like connectedComponents — this query is round 1's candidates). Output:
    // the top-20 merge candidates (count desc, pair asc — the
    // deterministic tie order both engines share).
    "q121_bpe_merges" -> ((s, d) => {
      val wfreq = ld(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val wp = Window.partitionBy("w").orderBy("p")
      // unpartitioned window is safe HERE only because its input is the
      // symbol-pair space (alphabet², a few hundred rows after the
      // vocab-level aggregate) — never the corpus
      val rk = Window.orderBy(col("pair_cnt").desc, col("a"), col("b"))
      wfreq
        .select(col("w"), col("freq"),
          posexplode(split(col("w"), "")).as(Seq("p", "ch")))
        .select(col("w"), col("freq"), col("ch").as("a"),
          lead("ch", 1).over(wp).as("b"))
        .filter(col("b").isNotNull)
        .groupBy("a", "b").agg(sum("freq").as("pair_cnt"))
        .withColumn("rank", row_number().over(rk))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("a"), col("b"), col("pair_cnt"))
        .orderBy("rank")
    }),

    // BPE TRAINING loop — q121 closed to a fixpoint-style driver loop
    // (the connectedComponents shape): K=5 rounds of [count adjacent
    // symbol pairs weighted by word frequency → adopt the argmax pair as
    // a merge rule → apply it to the vocabulary], emitting the learned
    // merge table in training order. Everything after the one corpus-
    // scale word-frequency aggregate runs on the VOCABULARY — the 100 TB
    // invariant q121 establishes: a billion-occurrence word costs one
    // row per round, and the per-round cost is vocab-sized regardless of
    // corpus size. The merge APPLICATION is fully relational (so the
    // DuckDB oracle replays it verbatim): BPE's greedy left-to-right
    // non-overlap is "within each run of consecutive candidate
    // positions, keep alternating positions from the run head" — a
    // row_number run-id + a per-run min window, no per-element scan UDF.
    // Each round's vocab is localCheckpoint'd (vocab-sized, bounds the
    // 5-round lineage exactly like the CC loop's label frame). Oracle:
    // the same K rounds as generated chained CTEs.
    // r15 (§2.4/§2.6): the adjacent-pair view fetches `nxt` by ARRAY
    // INDEX (get(syms, p+1) — NULL past the end, exactly lead()'s
    // semantics) instead of a per-round Window.partitionBy(w) — that
    // window cost one Exchange+Sort of the exploded symbol stream per
    // round per consumer; now adj is pure map-side work fused into its
    // consumers. And the 1-row argmax is no longer its own eager
    // checkpoint (was: 2 actions/round): it is deterministic
    // (cnt desc, a, b — total order) over the ROUND's checkpointed
    // vocab, so the rewrite's broadcast computes it in-plan and the
    // final merges union replays each round's argmax from its still-
    // pinned vocab frame — one eager job per round instead of two,
    // 63 jobs → ~30 measured (ProfileSome).
    "q124_bpe_train" -> ((s, d) => {
      val K = 5
      var vocab = ld(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("syms", split(col("w"), ""))
        .localCheckpoint()
      // r16 argmax fold + map-side merge application (§2.4/§2.6, VERDICT
      // item 4). Two changes, output bit-identical (oracle replays the
      // same chained CTEs):
      //
      // 1. The winning pair comes to the DRIVER as one 1-row head() per
      //    round — the same driver-steers-the-loop pattern as the CC
      //    loop's observed convergence metric (a merge table is
      //    driver-resident in every real BPE trainer). This kills the
      //    in-plan broadcast(best) build inside each round's checkpoint
      //    AND the old final merges action, which replayed all K argmaxes
      //    as a Union of K TakeOrdered+Exchange branches over the pinned
      //    vocabs (10 exchanges at K=5) — the merge table is now a
      //    LocalRelation of the already-collected rows.
      //
      // 2. With (a, b) as driver literals, the merge APPLICATION needs no
      //    relational machinery at all: the r15 form paid one row_number
      //    window + two (w, p)-keyed joins + one collect_list groupBy per
      //    round (~5 exchanges over the exploded symbol stream). BPE's
      //    greedy left-to-right non-overlap over a known pair is a pure
      //    per-WORD array rewrite — an aggregate() scan over syms that
      //    merges (a, b) when not consumed by the previous merge — so
      //    each round's new vocab is a ZERO-exchange projection of the
      //    pinned previous vocab. Equivalence to the relational rule
      //    ("within each run of consecutive candidate positions, keep
      //    alternating positions from the run head") is exactly the
      //    greedy-scan characterization the r8 comment derived the rule
      //    FROM; the end-to-end oracle (5 rows whose counts depend on
      //    every intermediate vocab) pins it at both sf.
      //    The lambda is interpreted, but it runs on the VOCABULARY (the
      //    100 TB invariant: vocab-sized, not corpus-sized) and replaces
      //    per-round corpus-wide exchanges — the q127 trade, measured.
      val merged = Seq.newBuilder[(Int, String, String, Long)]
      for (k <- 1 to K) {
        // 1-row argmax, deterministic total order (cnt desc, then the
        // pair itself — (a,b) is unique post-group)
        val bestRow = vocab
          .select(col("freq"), col("syms"),
            posexplode(col("syms")).as(Seq("p", "s")))
          .withColumn("nxt", get(col("syms"), col("p") + 1))
          .filter(col("nxt").isNotNull)
          .groupBy(col("s").as("a"), col("nxt").as("b"))
          .agg(sum("freq").as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
          .head()
        val (ba, bb, bc) =
          (bestRow.getString(0), bestRow.getString(1), bestRow.getLong(2))
        merged += ((k, ba, bb, bc))
        // greedy left-to-right merge of (ba, bb): one pass over syms.
        // acc = (res: rewritten prefix, skip: next symbol already
        // consumed by the merge just emitted). get() is 0-based and NULL
        // past the end (safe under ANSI, unlike element_at).
        val newSyms = aggregate(
          sequence(lit(1), size(col("syms"))),
          struct(array().cast("array<string>").as("res"),
            lit(false).as("skip")),
          (acc, i) => {
            val cur = get(col("syms"), i - 1)
            val nxt = get(col("syms"), i)
            when(acc("skip"),
              struct(acc("res").as("res"), lit(false).as("skip")))
              .when(cur === lit(ba) && nxt === lit(bb),
                struct(concat(acc("res"), array(concat(cur, nxt)))
                  .as("res"), lit(true).as("skip")))
              .otherwise(struct(concat(acc("res"), array(cur)).as("res"),
                lit(false).as("skip")))
          },
          acc => acc("res"))
        vocab = vocab.select(col("w"), col("freq"), newSyms.as("syms"))
          .localCheckpoint()
      }
      import s.implicits._
      merged.result()
        .toDF("round", "sym_a", "sym_b", "pair_cnt")
        .orderBy("round")
    }),

    // Corpus vocabulary statistics: top-10 terms per source by TF-IDF —
    // the "what characterizes each source" report every curation pipeline
    // runs before weighting/filtering sources. The corpus is scanned and
    // token-exploded ONCE: both term frequency (per source) and document
    // frequency (corpus-wide) derive from a shared per-(doc,token) count
    // whose scan→Generate→partial-agg→Exchange subtree is identical in
    // both branches, so ReusedExchange/AQE dedups it — at 100 TB that is
    // the difference between one corpus pass and two. The explosion never
    // materializes (it flows straight into map-side-combined partial
    // aggregation); everything after the shared exchange is
    // vocabulary-sized, not corpus-sized, and the final join + top-k
    // window run on those small frames. The corpus size N is a 1-row
    // scalar aggregate. Ranking uses the ROUNDED score (both engines
    // order by the same 6-decimal value, token tiebreak), so the top-k
    // cut is bit-stable cross-engine.
    "q104_tfidf_terms" -> ((s, d) => {
      val docs = ld(s, d, "documents")
      // Corpus size N stays IN the plan as a 1-row count aggregate
      // broadcast-cross-joined into the scorer — exactly the oracle's
      // `n AS (SELECT count(*))` CTE. A driver-side docs.count() (r6) was
      // a separate eager action = a full extra corpus scan at 100 TB.
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      // one (doc_id, source, tok) row per distinct token per document —
      // doc_id determines source, so (doc_id, tok) is unique here
      val perDoc = docs.select(col("doc_id"), col("source"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("tok"))
        .groupBy("doc_id", "source", "tok").agg(count(lit(1)).as("c"))
      val tf = perDoc.groupBy("source", "tok").agg(sum("c").as("tf"))
      val dfreq = perDoc.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("source")
        .orderBy(col("score").desc, col("tok"))
      tf.join(dfreq, "tok")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          round(col("tf") *
            log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("tok"), col("tf"), col("df"),
          col("score"))
        .orderBy("source", "rk")
    }),

    // Char-bigram LM typicality scoring — the CCNet/KenLM perplexity-
    // filter rung in its relational shape: TRAIN a corpus language model
    // (one explode→map-side-combined agg pass; the explosion never
    // materializes), broadcast the vocab-sized model, then SCORE every
    // document by aggregating its own bigrams' model statistics. The
    // production scorer sums log-probabilities; this query scores in the
    // model's integer domain — per-doc bigram count + sum of corpus
    // bigram frequencies (typical text scores high, line noise low) — so
    // the DuckDB oracle is hash-exact (ln() would differ in the last ulp
    // between JVM and C runtimes and a sum of ~600 logs amplifies that
    // past any safe rounding). Swapping the score to sum(ln(c/N)) changes
    // one agg expression, not the plan. At 100 TB: the model is
    // charset²-bounded (≪ broadcast threshold) so scoring is a
    // broadcast-join over a single corpus scan; train and score are two
    // passes here because they read the same snapshot — production trains
    // once (often on a reference corpus: CCNet scores against Wikipedia,
    // not against the crawl itself) and amortizes the model over every
    // scoring run.
    "q127_lm_score" -> ((s, d) => {
      // Bigram build: slice the text into its 2-char array ONCE per doc
      // (transform lambda), then explode the array. The index-explode
      // alternative (explode char positions, substring after) makes
      // Generate copy the FULL text into every per-char output row —
      // n_chars× string duplication before the substring projection.
      // Measured at sf0.1: 6.3 s index-explode → 3.9 s transform → 2.6 s
      // with the gram frame checkpoint-pinned (train + score both read
      // it). The lambda is interpreted (the usual HOF caveat), but it
      // replaces per-row text duplication, not codegen'd arithmetic —
      // the rare case where the HOF form wins.
      // r15 (§2.2): the sf corpora are single-row-group parquet — the
      // scan is ONE task, so the interpreted per-char gram build (and
      // the checkpointed gram frame's downstream consumers) ran on one
      // core (ProfileSome: 8 tasks, coreUtil 0.03). Spread the DOCS
      // across the session's cores before the build: one linear shuffle
      // of the text buys a parallel build and a parallel checkpoint
      // layout for both consumers. Guarded: a no-op at production scale
      // where the scan already splits into ≥ cores partitions.
      val docs0 = ld(s, d, "documents")
        .filter(length(col("text")) >= 2) // sequence(1,0) would step -1
      val para = s.sparkContext.defaultParallelism
      val docs = if (docs0.rdd.getNumPartitions < para)
        docs0.repartition(para, col("doc_id")) else docs0
      val grams = docs
        .select(col("doc_id"),
          explode(expr("transform(sequence(1, length(text) - 1)," +
            " i -> substring(text, i, 2))")).as("bg"))
        .localCheckpoint() // train + score both read it; build once
      val lm = grams.groupBy("bg").agg(count(lit(1)).as("c"))
      grams.join(broadcast(lm), "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("c").as("sum_freq"))
        .orderBy("doc_id")
    }),

    // Sparse TF-weighted cosine similarity via an inverted-index
    // (posting-list) self-join — the classic MapReduce all-pairs
    // similarity design: dimensions are word-3-gram counts (the 31-word
    // synthetic vocabulary makes single tokens degenerate — median token
    // df is 388 of 500 docs; 3-grams give a 16k vocab with max df 7),
    // join keyed on the gram so the shuffle is bounded by candidate
    // pairs, and df-pruning (2 ≤ df ≤ 20) caps per-key join fan-out at
    // maxdf² — the standard stopword/high-df bound that keeps the
    // quadratic term away from corpus-frequency dimensions (production
    // adds prefix filtering / ppjoin on top). Differs from q45 (distinct-
    // gram Jaccard, within-source) in being tf-WEIGHTED and corpus-wide.
    // Everything stays integer-exact: dot products and norms² are BIGINT
    // sums, the cos ≥ 0.4 cut is the cross-multiplied 25·dot² ≥ 4·|a|²|b|²
    // (no sqrt), and cos² is reported in half-up basis points. Gram keys
    // are the 32-bit portable md5 prefix (DuckDB computes the identical
    // value, so a collision collides identically on both sides); at
    // 100 TB the same plan runs with xxhash64 keys. Measured here: 11,533
    // candidate pairs from 6,817 shared grams → 25 survivors.
    // COST PINNED (r13 adjudication of the r12 "memo-clearing quintet"):
    // isolated median 2.78 s / ratio 4.9 at sf0.1 (BENCH_DETAIL_r13_iso,
    // cal 0.561) — the sparse Gram self-join IS the serving cost; no
    // durable-artifact claim applies (unlike the PQ family, the posting
    // frame is per-query scratch here), so this is the honest number.
    "q128_sparse_cosine" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15)
      val tf = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long").as("gh"))
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("tf"))
      // every frame below is corpus-proportional (posting lists, vocab,
      // per-doc norms) — shuffle_hash-hinted like this file's other pair
      // joins so the toy-scale plan never pins a corpus broadcast
      val dfq = tf.groupBy("gh").agg(count(lit(1)).as("df"))
      val keep = tf.join(
        dfq.filter(col("df").between(2, 20)).select("gh")
          .hint("shuffle_hash"), "gh")
      val norm = keep.groupBy("doc_id").agg(sum(col("tf") * col("tf"))
        .as("n2"))
      keep.as("a").join(keep.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
        .join(norm.select(col("doc_id").as("da"), col("n2").as("na2"))
          .hint("shuffle_hash"), "da")
        .join(norm.select(col("doc_id").as("db"), col("n2").as("nb2"))
          .hint("shuffle_hash"), "db")
        .filter(col("dot") * col("dot") * 25 >= col("na2") * col("nb2") * 4)
        .select(col("da"), col("db"), col("dot"), col("na2"), col("nb2"),
          expr("(2 * dot * dot * 10000 + na2 * nb2) DIV (2 * na2 * nb2)")
            .as("cos2_bp"))
        .orderBy("da", "db")
    }),

    // BM25 ranked retrieval — the SEARCH-side rung over q128's inverted-
    // index infrastructure: score every document against a query and
    // return the top-20. Terms are word-3-grams (the 31-word synthetic
    // vocabulary makes single-token idf degenerate, q128's measurement);
    // the query is itself derived deterministically from the corpus (the
    // 10 highest-df grams inside the discriminative 2..20 df band — a
    // genuinely tiny frame, so ITS broadcast is honest, unlike a corpus
    // frame). BM25 (k1 = 1.2, b = 0.75) is computed ENTIRELY in integer
    // arithmetic so the DuckDB oracle hash-matches: idf is the rational
    // Robertson form ((N - df + 1)·10⁴) DIV (df + 1) in basis points (no
    // ln — libm doubles differ across engines, the q127 lesson), the
    // length norm folds k1(1 - b + b·dl/avgdl) into one micro-unit
    // denominator with a single floor, and per-term contributions are
    // floored to milli-units BEFORE the sum, so the total is an
    // order-free BIGINT sum. Plan: tf/df/dl aggs are map-side combined;
    // scoring is one broadcast of the 10-row query + a doc_id-keyed join
    // for dl + the 1-row stats cross; top-20 rides TakeOrderedAndProject.
    // At 100 TB the posting lists are bucketed by gh and this exact plan
    // serves each query with one shuffle-free probe per term.
    "q133_bm25" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15)
      val tf = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long").as("gh"))
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("total"))
      val qterms = tf.groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 20))
        .orderBy(col("df").desc, col("gh")).limit(10)
      tf.join(broadcast(qterms), "gh")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          expr("""((nd - df + 1) * 10000 DIV (df + 1)) * 22 * tf * 100000
                  DIV (tf * 1000000 + 300000 + (900000 * dl * nd) DIV total)
               """).as("contrib"))
        .groupBy("doc_id")
        .agg(sum("contrib").as("score_milli"), count(lit(1)).as("n_terms"))
        .orderBy(col("score_milli").desc, col("doc_id")).limit(20)
    }),

    // EXACT Jaccard similarity join (τ = 1/2) via PREFIX FILTERING — the
    // exact counterpart of q46's MinHash-LSH (probabilistic recall) and
    // q45's within-source pair scan: full-corpus, zero false negatives,
    // WITHOUT the all-pairs product. Under any global token order, two
    // sets with J ≥ τ share ≥ α = ceil(τ/(1+τ)·(|a|+|b|)) grams, and the
    // α-th largest common gram must sit in the first |x| − ceil(τ|x|) + 1
    // positions of BOTH sets (since B ≥ τA for any qualifying pair,
    // α ≥ ceil(τ|x|) — the Xiao/Vernica prefix lemma); so candidates are
    // generated by equi-joining only those PREFIXES, ordered rarest-first
    // ((df, gh) — the order that makes prefixes selective) and pruned by
    // the LENGTH filter (J ≥ τ forces τ|a| ≤ |b| ≤ |a|/τ — free in the
    // join condition), and exact |a∩b| is counted just for candidate
    // pairs. Every verify join stays keyed (pair → member grams),
    // shuffle_hash-pinned like this file's other corpus joins. Measured
    // at sf0.01: 773 candidate pairs (969 before the length filter) vs
    // 124,750 doc pairs all-pairs — 0.6 % of the pair space — and recall
    // verified 25/25 against the brute all-pairs exact scan (guaranteed
    // 1.0 by the lemma; measured anyway). The gram-set frame is
    // localCheckpoint-pinned: it feeds four downstream references (sizes,
    // df, prefix, both verify sides), and unpinned Catalyst re-runs the
    // tokenize+window shingle build per reference (isolated medians
    // 4.3 s unpinned → ~3.2 s pinned at sf0.1, noisy host; in production
    // `sets` is the persisted posting table). 310 k candidates at sf0.1.
    // COST PINNED (r13, the q19/q32/q113 precedent): isolated median
    // 2.62-2.69 s / cal 0.36-0.51 at sf0.1 after the r13 verify rewrite
    // (was 4.52 s with the posting-join verify; r12 full-run 7.81 s).
    // The remainder is candidate generation + per-pair intersection at
    // recall 1.0 — the operator's price. Compare future rounds here.
    "q136_jaccard_prefix" -> ((s, d) => {
      // Pinned frame: see the Scaladoc above on re-expansion cost.
      val sets = shinglesPortable(s, d).select("doc_id", "gh")
        .localCheckpoint()
      val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val dfq = sets.groupBy("gh").agg(count(lit(1)).as("df"))
      val wd = Window.partitionBy("doc_id").orderBy(col("df"), col("gh"))
      val prefix = sets.join(dfq.hint("shuffle_hash"), "gh")
        .join(sz.hint("shuffle_hash"), "doc_id")
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") <= col("sz") - expr("(sz + 1) DIV 2") + 1)
        .select("doc_id", "gh", "sz")
      val cand = prefix.as("a").join(prefix.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") <= col("b.sz") * 2 && col("b.sz") <= col("a.sz") * 2)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.sz").as("sza"), col("b.sz").as("szb"))
        .distinct()
      // VERIFY AS PER-PAIR ARRAY INTERSECTION (r13): the old posting-join
      // verify (cand ⋈ sets on da, then ⋈ sets on (db, gh), count) built
      // a Σ|grams(da)| intermediate — 310 k candidates × ~150 grams ≈
      // 46 M rows through an Exchange + HashAggregate at sf0.1. The sets
      // are DISTINCT per (doc_id, gh) by construction, so |A ∩ B| ==
      // size(array_intersect(ga, gb)) exactly: collapse each doc's grams
      // to one array row (doc-count-sized frame), hand each candidate its
      // two arrays through two keyed joins, and intersect per row — no
      // corpus-scale shuffle, no 46 M-row aggregate. At 100 TB the
      // doc-array frame is the standard verify-side set store of every
      // similarity-join system (PPJoin's verify carries sets the same
      // way); the joins stay keyed on da/db.
      val docArr = sets.groupBy("doc_id")
        .agg(collect_list("gh").as("gs"))
      cand
        .join(docArr.select(col("doc_id").as("da"), col("gs").as("ga")),
          "da")
        .join(docArr.select(col("doc_id").as("db"), col("gs").as("gb")),
          "db")
        .select(col("da"), col("db"), col("sza"), col("szb"),
          size(array_intersect(col("ga"), col("gb")))
            .cast("long").as("inter"))
        .filter(col("inter") * 3 >= col("sza") + col("szb"))
        .select(col("da"), col("db"), col("sza"), col("szb"), col("inter"),
          expr("""(2 * inter * 10000 + (sza + szb - inter))
                  DIV (2 * (sza + szb - inter))""").as("jacc_bp"))
        .orderBy("da", "db")
    }),

    // TOKEN-DISTRIBUTION DRIFT between two corpus slices — the dataset-
    // MONITORING rung: every production pipeline diffs each new crawl/
    // shard against the accepted corpus before admission (tokenizer-rate
    // shifts are the cheapest early warning for scraper regressions,
    // boilerplate floods, language mix changes). Slices = sources split
    // by the engine-portable md5 hash (md5(source) % 2 — the q57 ticket
    // recipe applied to group assignment). Per-token occurrence RATES in
    // integer parts-per-billion (cnt·10⁹ DIV slice_total — exact; BIGINT
    // holds to ~9·10⁹ occurrences per token per slice, past that compute
    // the rate in DECIMAL), drift = |rate_A − rate_B|, report the top-15
    // drifting tokens. Chi-square/KL would need cross-engine logs or
    // n⁵-magnitude rationals (the q134 lesson); the micro-rate delta IS
    // the metric dashboards threshold on. Plan: one corpus-scale
    // (side, tok) groupBy (map-side combined, vocab-sized output);
    // everything after runs on vocab-sized frames; totals are a 1-row
    // broadcast; top-15 rides TakeOrderedAndProject.
    "q158_token_drift" -> ((s, d) => {
      val toks = ld(s, d, "documents")
        .select((conv(substring(md5(col("source")), 1, 8), 16, 10)
            .cast("long") % 2).as("side"),
          explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      // vocab-sized; pin it (q148's pattern) so the corpus-scale tokenize
      // + combine runs ONCE for its three consumers (sides A, B, totals)
      val cnt = toks.groupBy("side", "tok").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val tots = cnt.agg(
        sum(when(col("side") === 0, col("c")).otherwise(0L)).as("ta"),
        sum(when(col("side") === 1, col("c")).otherwise(0L)).as("tb"))
      val a = cnt.filter(col("side") === 0)
        .select(col("tok"), col("c").as("ca"))
      val b = cnt.filter(col("side") === 1)
        .select(col("tok"), col("c").as("cb"))
      a.join(b, Seq("tok"), "full_outer")
        .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
        .crossJoin(broadcast(tots))
        .selectExpr("tok", "ca", "cb",
          "ca * 1000000000 DIV ta AS rate_a_ppb",
          "cb * 1000000000 DIV tb AS rate_b_ppb")
        .withColumn("drift_ppb", abs(col("rate_a_ppb") - col("rate_b_ppb")))
        .orderBy(col("drift_ppb").desc, col("tok")).limit(15)
    }),

    // DETECTOR CALIBRATION: precision/recall of the deployed fuzzy
    // detector (q67's banded simhash, hamming ≤ 6) against EXACT
    // ground truth (q136's Jaccard ≥ ½ pair set) — q112 calibrated the
    // minhash ESTIMATOR against exact Jaccard per pair; this scores the
    // DECISION: of the pairs simhash flags, how many are true near-dups
    // (precision), and how many true near-dups does it miss (recall)?
    // The number every dedup rollout needs before deleting data at
    // 100 TB — simhash and Jaccard measure DIFFERENT similarities
    // (bit-vote cosine vs set overlap), so neither 100 % is expected;
    // the report quantifies the gap in exact half-up basis points (the
    // r4 recipe). Both pair sets come from the inventory queries
    // themselves (the deployed artifacts, not re-derivations); the
    // oracle recomputes BOTH sides brute-force over the portable
    // signatures/shingles. Plan: two edge-list-sized frames, one keyed
    // full-outer merge, a 1-row rollup.
    "q164_detector_calibration" -> ((s, d) => {
      val det = simhashBandedPairs(ld(s, d, "documents"))
        .select(col("da"), col("db"), lit(1).as("in_det"))
      val truth = queries2("q136_jaccard_prefix")(s, d)
        .select(col("da"), col("db"), lit(1).as("in_truth"))
      det.join(truth, Seq("da", "db"), "full_outer")
        .agg(
          sum(when(col("in_det").isNotNull && col("in_truth").isNotNull,
            1L).otherwise(0L)).as("tp"),
          sum(when(col("in_det").isNotNull && col("in_truth").isNull,
            1L).otherwise(0L)).as("fp"),
          sum(when(col("in_det").isNull && col("in_truth").isNotNull,
            1L).otherwise(0L)).as("fn"))
        .selectExpr("tp", "fp", "fn",
          "CAST((2 * tp * 10000 + (tp + fp)) DIV (2 * (tp + fp))" +
            " AS BIGINT) AS precision_bp",
          "CAST((2 * tp * 10000 + (tp + fn)) DIV (2 * (tp + fn))" +
            " AS BIGINT) AS recall_bp")
    }),

    // Inverted-index construction — the retrieval-serving artifact a BM25
    // (q133) or hybrid (q152) stack actually ships: one posting-list row
    // per term with document frequency, collection frequency, and the
    // head of the doc_id-sorted posting list (capped at 8, rendered as a
    // CSV string so the compare is representation-stable; real postings
    // are written whole, the cap keeps the oracle row bounded). Two-level
    // aggregation: per-(term, doc) counts first — map-side combine
    // shrinks the token stream to the per-doc vocabulary BEFORE the
    // term-keyed shuffle — then one term-keyed agg builds df/cf/postings
    // together. At 100 TB this is the textbook index build: both aggs
    // are partial-aggregated, nothing corpus-sized crosses the wire
    // twice, and the posting sort is per-term (no global order).
    "q167_inverted_index" -> ((s, d) => {
      val td = ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("c"))
      td.groupBy("term").agg(
          count(lit(1)).as("df"),
          sum("c").as("cf"),
          array_join(slice(sort_array(collect_list(col("doc_id"))), 1, 8),
            ",").as("postings_head"))
        .orderBy("term")
    }),

    // Collocation mining via PMI lift — "which word pairs co-occur far
    // more than chance" — the phrase-extraction pass (think "new york",
    // "machine learning") a tokenizer-training pipeline runs to decide
    // merge candidates. PMI's log is monotone in its argument, so rank
    // by the EXACT rational lift N·c(a,b) / (c(a)·c(b)) instead, scaled
    // to micro-units by integer division (half-up, the r4 recipe in
    // micro space): no logs, no doubles, bit-identical across engines.
    // Adjacent-pair counts ride one posexplode + lead window; unigram
    // counts reuse the same exploded frame (shared scan). Pairs are
    // thresholded (cnt ≥ 5) BEFORE the two broadcast-sized unigram joins
    // — at 100 TB the pair table is the big one and the filter cuts it
    // first; unigram totals are vocabulary-sized (broadcast).
    "q171_pmi_collocations" -> ((s, d) => {
      // map-side adjacent-pair build — no window, no exchange (see
      // shingles; r15); unigram counts reuse the same exploded frame.
      val toks = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
      val pairs = toks
        .withColumn("nxt", get(col("toks"), col("pos") + 1))
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("a"), col("nxt").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)
      val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      val tot = toks.agg(count(lit(1)).as("nt"))
      pairs
        .join(broadcast(uni.withColumnRenamed("tok", "a")
          .withColumnRenamed("cu", "ca")), "a")
        .join(broadcast(uni.withColumnRenamed("tok", "b")
          .withColumnRenamed("cu", "cb")), "b")
        .crossJoin(broadcast(tot))
        .selectExpr("a", "b", "cnt",
          "CAST((2 * cnt * nt * 1000000 + (ca * cb)) DIV (2 * (ca * cb))" +
            " AS BIGINT) AS lift_micro")
        .orderBy(desc("lift_micro"), col("a"), col("b"))
        .limit(50)
    }),

    // KMV (k-minimum-values) distinct sketches + pairwise corpus-overlap
    // estimation — the sketch a fleet exchanges to answer "how much does
    // source A's shingle space overlap source B's?" WITHOUT shipping
    // either corpus: per source, keep only the k=128 smallest 32-bit md5
    // gram hashes (a uniform sample of the hashed distinct space). The
    // KMV estimator D̂ = (k−1)·2³²/h₍ₖ₎ gives each source's distinct-gram
    // count; merging two sketches and re-taking the 128 smallest gives
    // the union's sketch for free, and the fraction of union-sketch
    // members present in BOTH input sketches estimates Jaccard (Beyer et
    // al., SIGMOD'07). Everything after the md5 is exact integer
    // arithmetic — estimator divisions are integer DIV, so the estimate
    // is bit-replayable. The exact branch (full distinct-gram self-join)
    // rides one gh-keyed shuffle and exists to score the estimator:
    // err_bp is the calibration number a rollout thresholds on. At
    // 100 TB only the exact branch grows; the sketch branch moves
    // |sources|·k rows regardless of corpus size — that asymmetry is the
    // entire point of the operator.
    "q213_kmv_overlap" -> ((s, d) => {
      val sg = shinglesPortable(s, d).select("source", "gh").distinct()
        .localCheckpoint() // shared by the sketch AND exact branches
      val wS = Window.partitionBy("source").orderBy("gh")
      val sk = sg.withColumn("rn", row_number().over(wS))
        .filter(col("rn") <= 128).drop("rn").localCheckpoint()
      val srcs = sk.select("source").distinct()
      val pairs = srcs.select(col("source").as("sa"))
        .crossJoin(srcs.select(col("source").as("sb")))
        .filter(col("sa") < col("sb"))
      val mA = pairs.join(sk.select(col("source").as("sa"), col("gh")), "sa")
        .select(col("sa"), col("sb"), col("gh"),
          lit(1L).as("inA"), lit(0L).as("inB"))
      val mB = pairs.join(sk.select(col("source").as("sb"), col("gh")), "sb")
        .select(col("sa"), col("sb"), col("gh"),
          lit(0L).as("inA"), lit(1L).as("inB"))
      val uni = mA.unionByName(mB).groupBy("sa", "sb", "gh")
        .agg(max("inA").as("inA"), max("inB").as("inB"))
      val wP = Window.partitionBy("sa", "sb").orderBy("gh")
      val est = uni.withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= 128)
        .groupBy("sa", "sb")
        .agg(count(lit(1)).as("ku"), max("gh").as("hku"),
          sum(expr("inA * inB")).as("c"))
        .selectExpr("sa", "sb",
          "CASE WHEN ku < 128 THEN ku" +
            " ELSE (127 * 4294967296L) DIV hku END AS est_union",
          "c", "(2 * c * 10000 + ku) DIV (2 * ku) AS est_jacc_bp")
      val exN = sg.groupBy("source").agg(count(lit(1)).as("n"))
      val exI = sg.select(col("source").as("sa"), col("gh"))
        .join(sg.select(col("source").as("sb"), col("gh")), "gh")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("inter"))
      est
        .join(exI, Seq("sa", "sb"), "left")
        .na.fill(0L, Seq("inter"))
        .join(broadcast(exN.select(col("source").as("sa"),
          col("n").as("na"))), "sa")
        .join(broadcast(exN.select(col("source").as("sb"),
          col("n").as("nb"))), "sb")
        .selectExpr("sa", "sb", "est_union",
          "na + nb - inter AS exact_union", "c AS sketch_overlap",
          "est_jacc_bp",
          "(2 * inter * 10000 + (na + nb - inter))" +
            " DIV (2 * (na + nb - inter)) AS exact_jacc_bp")
        .withColumn("err_bp",
          abs(col("est_jacc_bp") - col("exact_jacc_bp")))
        .orderBy("sa", "sb")
    }),

    // Heaps-law vocabulary-growth curve: cumulative distinct-type count as
    // the corpus is consumed in doc_id order, bucketed into deciles — the
    // diagnostic that tells a tokenizer-training run whether more data
    // still buys vocabulary (V(n) ~ K·n^β flattening) or the corpus has
    // saturated. The scale-shape insight: "first time each type appears"
    // is NOT a scan-in-order problem — it's min(doc_id) per type (one
    // map-side-combined groupBy), and because the decile is monotonic in
    // doc_id, first-seen decile = decile of min(doc_id). The only window
    // is the 10-row decile cumsum. The max-doc_id bound arrives as a
    // 1-row broadcast; everything else is exact integers.
    "q215_heaps_law" -> ((s, d) => {
      val docs = ld(s, d, "documents")
      val mx = docs.agg(max("doc_id").as("mx"))
      // ONE corpus scan: collapse occurrences to (decile, tok, cnt) —
      // map-side combined on a key far smaller than the token stream —
      // then pin it; the occurrence totals AND the first-seen-type counts
      // both derive from this frame instead of re-scanning the corpus
      // (the unpinned shape ran the explode+crossJoin subtree twice).
      val g = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .crossJoin(broadcast(mx))
        .groupBy(expr("(doc_id * 10) DIV (mx + 1)").as("decile"),
          col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val occ = g.groupBy("decile").agg(sum("cnt").as("n_occurrences"))
      val fresh = g.groupBy("tok").agg(min("decile").as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_types"))
      val nd = docs.crossJoin(broadcast(mx))
        .groupBy(expr("(doc_id * 10) DIV (mx + 1)").as("decile"))
        .agg(count(lit(1)).as("n_docs"))
      nd.join(occ, "decile").join(fresh, Seq("decile"), "left")
        .na.fill(0L, Seq("new_types"))
        .withColumn("cum_types", sum("new_types").over(
          Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("decile", "n_docs", "n_occurrences", "new_types",
          "cum_types")
        .orderBy("decile")
    }),

    // Gini–Simpson lexical concentration per source — the
    // frequency-SENSITIVE diversity number beside q190's distinct/total
    // ratio (which can't tell "10k types used evenly" from "10k types,
    // one of them 90 % of mass"): λ = Σ nᵢ(nᵢ−1) / (N(N−1)) is the
    // probability two occurrences drawn without replacement are the same
    // type; 10⁴(1−λ) is the diversity. The unbiased finite-sample form
    // keeps everything in exact integer arithmetic — per-type counts,
    // then ONE more keyed agg of nᵢ(nᵢ−1) — so the result is independent
    // of partitioning (no float entropy logs, the q70 lesson). Two
    // map-side-combined shuffles at any scale: (source, tok) then source.
    "q216_token_gini" -> ((s, d) =>
      ld(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(sum("n").as("n_occ"), count(lit(1)).as("n_types"),
          sum(expr("n * (n - 1)")).as("same2"))
        .selectExpr("source", "n_occ", "n_types",
          "(2 * same2 * 10000 + (n_occ * (n_occ - 1)))" +
            " DIV (2 * n_occ * (n_occ - 1)) AS simpson_bp")
        .withColumn("gini_simpson_bp", lit(10000L) - col("simpson_bp"))
        .orderBy("source")),

    // Top-p (nucleus) vocabulary truncation per source: the smallest
    // frequency-ranked type set covering ≥ 90 % of token occurrences —
    // how a tokenizer/vocab build decides what becomes a type and what
    // falls through to bytes, and the per-source coverage audit that goes
    // with it. Rule: keep a type iff the cumulative mass BEFORE it is
    // under 90 % of the source total — integer comparison (cum−n)·10 <
    // tot·9, rank ties broken lexically, so the kept set is bit-stable.
    // One (source, tok) count shuffle, then windows WITHIN each source
    // partition (never global), then the per-source rollup. At 100 TB
    // the per-type count frame is vocab-sized — orders smaller than the
    // corpus — and everything downstream rides its source partitioning.
    "q221_top_p_vocab" -> ((s, d) => {
      val wRank = Window.partitionBy("source")
        .orderBy(col("n").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("source")
      ld(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .withColumn("cum", sum("n").over(wRank))
        .withColumn("tot", sum("n").over(wTot))
        .withColumn("keep", (col("cum") - col("n")) * 10 < col("tot") * 9)
        .groupBy("source")
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("kept_types"),
          sum(when(col("keep"), col("n")).otherwise(0L)).as("kept_occ"),
          max("tot").as("tot_occ"))
        .selectExpr("source", "n_types", "kept_types", "kept_occ",
          "tot_occ",
          "(2 * kept_occ * 10000 + tot_occ) DIV (2 * tot_occ)" +
            " AS coverage_bp")
        .orderBy("source")
    }),

    // Transitivity audit of the simhash near-dup graph — the number that
    // decides whether q101's connected-components clustering OVER-MERGES:
    // similarity is not transitive (a~b, b~c does NOT imply a~c), and CC
    // treats every edge as an equivalence, so a low closed-wedge fraction
    // means chains of pairwise-similar docs are being glued into clusters
    // whose ends share nothing. Wedges and their closures are counted in
    // q134's degree-oriented basis (each triangle = exactly ONE wedge,
    // out-degrees arboricity-bounded — wedge volume Σoutdeg², not the
    // hub-exploding Σdeg²), over the SAME banded-candidate edge set the
    // production detector emits. transitivity_bp = closed/wedges in
    // half-up bp; the vacuous no-wedge graph reads 10000.
    "q227_neardup_transitivity" -> ((s, d) => {
      val edges = simhashBandedPairs(ld(s, d, "documents"))
        .select("da", "db").localCheckpoint()
      val und = edges.select(col("da").as("u"), col("db").as("v"))
        .unionAll(edges.select(col("db").as("u"), col("da").as("v")))
      val gdeg = und.groupBy("u").agg(count(lit(1)).as("gd"))
      val dir = und.join(gdeg.hint("shuffle_hash"), "u")
        .join(gdeg.select(col("u").as("v"), col("gd").as("gdv"))
          .hint("shuffle_hash"), "v")
        .filter(col("gd") < col("gdv") ||
          (col("gd") === col("gdv") && col("u") < col("v")))
        .select("u", "v", "gdv").localCheckpoint()
      val wedges = dir.as("e1").join(dir.as("e2").hint("shuffle_hash"),
          col("e1.u") === col("e2.u") && (col("e1.gdv") < col("e2.gdv") ||
            (col("e1.gdv") === col("e2.gdv") &&
              col("e1.v") < col("e2.v"))))
        .select(col("e1.v").as("b"), col("e2.v").as("c"))
        .localCheckpoint()
      val closed = wedges.join(
        dir.select(col("u").as("b"), col("v").as("c")).hint("shuffle_hash"),
        Seq("b", "c"), "left_semi")
      edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
        .selectExpr("n_edges", "n_wedges", "n_triangles",
          "CASE WHEN n_wedges = 0 THEN 10000L" +
            " ELSE (2 * n_triangles * 10000 + n_wedges)" +
            " DIV (2 * n_wedges) END AS transitivity_bp")
    }),

    // Hamming-threshold sweep over the simhash detector — the tuning
    // curve behind q48/q67's hardcoded cutoffs: for every threshold t,
    // how many candidate pairs fire and how much of the CORPUS gets
    // touched by dedup (docs with ≥1 pair at distance ≤ t). Both curves
    // fall out of ONE banded candidate pass: per-pair distances roll up
    // by distance (7-row cumsum), and each doc's FIRST activation is
    // min(hamming) over its pairs — a keyed agg, so the doc curve is a
    // second tiny cumsum, never a per-threshold rescan. Corpus share in
    // exact bp against the 1-row broadcast total. Reading the elbow of
    // n_pairs_cum against n_docs_cum is how the threshold gets chosen.
    "q229_hamming_sweep" -> ((s, d) => {
      val docs = ld(s, d, "documents")
      val pairs = simhashBandedPairs(docs).localCheckpoint()
      val tot = docs.agg(count(lit(1)).as("nn"))
      val wT = Window.orderBy("hamming")
        .rowsBetween(Window.unboundedPreceding, 0)
      val pc = pairs.groupBy("hamming")
        .agg(count(lit(1)).as("n_pairs"))
      val dc = pairs.select(explode(array(col("da"), col("db")))
          .as("doc_id"), col("hamming"))
        .groupBy("doc_id").agg(min("hamming").as("hamming"))
        .groupBy("hamming").agg(count(lit(1)).as("n_docs_new"))
      pc.join(dc, Seq("hamming"), "left")
        .na.fill(0L, Seq("n_docs_new"))
        .withColumn("n_pairs_cum", sum("n_pairs").over(wT))
        .withColumn("n_docs_cum", sum("n_docs_new").over(wT))
        .crossJoin(broadcast(tot))
        .selectExpr("hamming", "n_pairs", "n_pairs_cum", "n_docs_cum",
          "(2 * n_docs_cum * 10000 + nn) DIV (2 * nn)" +
            " AS corpus_share_bp")
        .orderBy("hamming")
    }),

    // Confusion matrix + per-class recall for the q43 stopword language
    // classifier against the declared `lang` labels — the evaluation a
    // pipeline runs before TRUSTING a cheap classifier to route millions
    // of docs (q43 reports per-doc correctness; routing decisions need
    // the CLASS-level failure structure: which languages bleed into
    // which). Shares q43's scorer verbatim (one helper, one oracle
    // formula), rolls up on a 16-cell key, and attaches per-class totals
    // by broadcast. Recall in exact half-up bp.
    "q230_langid_confusion" -> ((s, d) => {
      val scored = langIdScored(ld(s, d, "documents"))
        .select("lang", "pred_lang")
      val totals = scored.groupBy("lang").agg(count(lit(1)).as("n_true"))
      scored.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .join(broadcast(totals), "lang")
        .selectExpr("lang", "pred_lang", "n", "n_true",
          "(2 * n * 10000 + n_true) DIV (2 * n_true) AS recall_bp")
        .orderBy("lang", "pred_lang")
    }),

    // Spearman rank correlation between document length (n_chars) and
    // whitespace-token count, per source — the monotone-association
    // check a curation pipeline runs before substituting a cheap proxy
    // (chars) for an expensive one (tokens) in gates and mixtures. Ranks
    // are tie-broken by doc_id so each variable is an exact permutation;
    // then ρ = 1 − 6·Σd²/(n(n²−1)) is a RATIONAL in the rank-diff sum —
    // reported as (ρ+1) in half-up bp (shifting by +1 keeps the half-up
    // integer recipe out of negative-division territory, where Spark DIV
    // truncates and DuckDB // floors). Two per-source rank windows over
    // one shuffle, then a per-source rollup; nothing corpus-sized
    // crosses the wire twice.
    "q234_spearman_proxy" -> ((s, d) => {
      val docs = ld(s, d, "documents")
        .selectExpr("source", "doc_id", "n_chars",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n_toks")
      val wx = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val wy = Window.partitionBy("source").orderBy("n_toks", "doc_id")
      docs
        .withColumn("xr", row_number().over(wx).cast("long"))
        .withColumn("yr", row_number().over(wy).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(expr("(xr - yr) * (xr - yr)")).as("s_sq"))
        .filter(col("n") >= 2)
        .selectExpr("source", "n", "s_sq",
          "(2 * (2 * n * (n * n - 1) - 6 * s_sq) * 10000" +
            " + n * (n * n - 1)) DIV (2 * n * (n * n - 1))" +
            " AS rho_plus1_bp")
        .orderBy("source")
    }),

    // Cohen's kappa for the q43 stopword classifier against the declared
    // labels — chance-corrected agreement, the one number that exposes a
    // classifier that "agrees" only because one class dominates (raw
    // accuracy, q43's `correct`, can't). Kappa is RATIONAL in the
    // confusion matrix: κ = (D·n − P)/(n² − P) with D = diagonal mass,
    // P = Σ_c rowtot_c·coltot_c — so the report is exact integers, no
    // doubles: po/pe in half-up bp and κ shifted +1 (κ ∈ [−1,1]; the
    // shift keeps the half-up recipe out of negative division, the q234
    // stance). One 16-cell confusion rollup; every later frame is 1-row
    // or |classes|-row, combined by cross joins of broadcast scalars.
    "q238_cohens_kappa" -> ((s, d) => {
      val cm = langIdScored(ld(s, d, "documents"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_cell"))
        .localCheckpoint() // n, diag, and both marginals share one rollup
      val n = cm.agg(sum("n_cell").as("n"))
      val diag = cm.filter(col("lang") === col("pred_lang"))
        .agg(coalesce(sum("n_cell"), lit(0L)).as("dg"))
      val pe = cm.groupBy("lang").agg(sum("n_cell").as("r"))
        .join(cm.groupBy("pred_lang").agg(sum("n_cell").as("cc")),
          col("lang") === col("pred_lang"))
        .agg(coalesce(sum(expr("r * cc")), lit(0L)).as("p"))
      n.crossJoin(broadcast(diag)).crossJoin(broadcast(pe))
        .selectExpr("n", "dg AS diag_n", "p AS pe_weight",
          "(2 * dg * 10000 + n) DIV (2 * n) AS po_bp",
          "(2 * p * 10000 + n * n) DIV (2 * n * n) AS pe_bp",
          "(2 * (dg * n + n * n - 2 * p) * 10000 + (n * n - p))" +
            " DIV (2 * (n * n - p)) AS kappa_plus1_bp")
    }),

    // Lorenz curve + exact Gini of the token-mass distribution over
    // documents — "what share of the corpus' tokens live in the shortest
    // k/10 of documents": the inequality profile that decides whether
    // length-stratified sampling (q97) is needed or uniform sampling
    // suffices. Both stats ride the DISTINCT-VALUE histogram, never a
    // corpus-wide rank: Gini's Σ(2i−n−1)xᵢ collapses per tied-value run
    // to x·c·(2·cum − c − n) (one cumulative window over |values| rows),
    // and each decile boundary rank is located in its run by a range
    // join against the 10-row decile frame (the q224 histogram-space
    // stance — at 100 TB |distinct lengths| ≪ |docs|, and the only
    // corpus-sized op is the length rollup). Exact half-up bp; ranks
    // within a run interpolate by whole tokens, so cum_tokens is exact.
    "q239_lorenz_gini" -> ((s, d) => {
      val h = ld(s, d, "documents")
        .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS x")
        .groupBy("x").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(
          Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cumtok", sum(expr("x * c")).over(
          Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)))
        .localCheckpoint() // gini + 10 decile lookups share one histogram
      val tot = h.agg(max("cum").as("n"), max("cumtok").as("s"))
      val gini = h.crossJoin(broadcast(tot))
        .agg(coalesce(sum(expr("x * c * (2 * cum - c - n)")), lit(0L))
          .as("num"))
      val dec = ld(s, d, "documents").sparkSession.range(1, 11)
        .select(col("id").as("decile"))
        .crossJoin(broadcast(tot))
        .withColumn("r", expr("(decile * n) DIV 10"))
      dec.join(broadcast(h),
          expr("r > cum - c AND r <= cum"), "left")
        .crossJoin(broadcast(gini))
        .selectExpr("decile",
          "r AS boundary_rank",
          "cumtok - (cum - r) * x AS cum_tokens",
          "(2 * (cumtok - (cum - r) * x) * 10000 + s) DIV (2 * s)" +
            " AS lorenz_bp",
          "(2 * num * 10000 + n * s) DIV (2 * n * s) AS gini_bp")
        .orderBy("decile")
    }),

    // Sparse random projection (Achlioptas ±1 signs) with a measured JL
    // distortion audit — dimensionality reduction for the token-count
    // space WITHOUT training or a vocabulary pass: proj[d][j] =
    // Σ_tok c(d,tok)·sign_j(tok), signs drawn from md5 so both engines
    // build the IDENTICAL matrix and everything stays exact integers
    // (the no-RNG stance of q135/q151). E[‖proj(a)−proj(b)‖²] =
    // k·‖a−b‖² — the audit measures that ratio per doc pair in half-up
    // bp (ideal 10000). Plan shape: the projection is ONE doc-keyed agg
    // with k=8 conditional sums (map-side combined; at 100 TB this is a
    // single corpus pass emitting |docs|×k cells — the standard trick
    // when a learned embedding is too expensive); BOTH audit distances
    // come from the (pair, side) trick — signed sums then squares —
    // so the original-space distance needs no per-pair token join.
    "q242_random_projection" -> ((s, d) => {
      def sgn(j: Int) =
        s"(CASE WHEN CAST(conv(substring(md5(concat('$j:', tok)), 1, 8)," +
          s" 16, 10) AS BIGINT) % 2 = 0 THEN 1L ELSE -1L END)"
      val tc = ld(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .withColumn("pair", expr("doc_id DIV 2"))
        .withColumn("sd", expr("CASE WHEN doc_id % 2 = 0 THEN 1L" +
          " ELSE -1L END"))
        .localCheckpoint() // projection + exact distances share one agg
      val pcols = (0 until 8).map(j =>
        sum(expr(s"c * sd * ${sgn(j)}")).as(s"p$j"))
      val projD = tc.groupBy("pair").agg(pcols.head, pcols.tail: _*)
        .selectExpr("pair",
          (0 until 8).map(j => s"p$j * p$j").mkString(" + ") + " AS d2_proj")
      val orig = tc.groupBy("pair", "tok")
        .agg(sum(expr("c * sd")).as("diff"))
        .groupBy("pair").agg(sum(expr("diff * diff")).as("d2_orig"))
      projD.join(orig, "pair")
        .selectExpr("pair", "d2_orig", "d2_proj",
          "(2 * d2_proj * 10000 + 8 * d2_orig) DIV (16 * d2_orig)" +
            " AS distortion_bp")
        .orderBy("pair")
    }),

    // Golden-record survivorship — the MERGE half of entity resolution
    // that q146 (match) and q101 (cluster) stop short of: once a
    // duplicate cluster exists, ONE surviving record must be assembled
    // field by field under explicit rules. Clusters here are the
    // corpus's near-dup families blocked by an 8-token-prefix
    // fingerprint (exact-text md5 finds zero families in this corpus —
    // the near-dups differ mid-text, which is exactly why survivorship
    // rules exist). Rules, each a separate relational pick: canonical
    // id = min member; best text = longest (tie → smallest id) via one
    // cluster-partitioned rank window; source and lang = cluster mode
    // (tie → alphabetical) via count-then-rank. Scale shape: the
    // 128-bit fingerprint is the ONLY shuffle key, text never moves
    // past the fingerprint scan (picks carry ids and counts), and every
    // window is cluster-sized. Singleton clusters are dropped — golden
    // records exist only where there is something to merge.
    "q249_golden_record" -> ((s, d) => {
      val m = ld(s, d, "documents")
        .withColumn("ck",
          md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))))
        .select("ck", "doc_id", "source", "lang", "n_chars")
        .localCheckpoint() // base rollup + three picks share one scan
      val base = m.groupBy("ck").agg(
          min("doc_id").as("canonical_doc_id"),
          count(lit(1)).as("n_members"),
          countDistinct("source").as("n_sources"))
        .filter(col("n_members") >= 2)
      val wB = Window.partitionBy("ck")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val best = m.withColumn("rn", row_number().over(wB))
        .filter(col("rn") === 1)
        .select(col("ck"), col("doc_id").as("best_doc_id"),
          col("n_chars").as("best_n_chars"))
      def pick(f: String, as: String) = {
        val wP = Window.partitionBy("ck")
          .orderBy(col("n").desc, col(f))
        m.groupBy("ck", f).agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(wP))
          .filter(col("rn") === 1)
          .select(col("ck"), col(f).as(as))
      }
      base.join(best, "ck").join(pick("source", "src_pick"), "ck")
        .join(pick("lang", "lang_pick"), "ck")
        .select("canonical_doc_id", "n_members", "n_sources",
          "best_doc_id", "best_n_chars", "src_pick", "lang_pick")
        .orderBy("canonical_doc_id")
    }),

    // Zipf rank-frequency audit — the third corpus-law screen beside
    // Heaps growth (q215) and Benford digits (q231): rank the vocabulary
    // by frequency and compare each frequency against the Zipf
    // prediction f(1)/rank. Deviation is reported SIGNED in half-up bp,
    // computed q183-style (half-up on the absolute gap, sign reattached
    // by integer comparison — no signed division, whose floor-vs-
    // truncate differs across engines). A law-abiding natural corpus
    // sits near 0; this synthetic corpus's near-uniform frequencies
    // FAIL loudly — which, as with Benford, is the audit working. Scale
    // shape: one map-side-combined token rollup, a distributed top-50
    // (TakeOrdered, never a global sort), and the rank window + f(1)
    // broadcast touch only the 50-row shortlist.
    "q250_zipf_audit" -> ((s, d) => {
      val tf = ld(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("tok")).limit(50)
        .localCheckpoint() // ranks + f(1) share the shortlist
      val ranked = tf.withColumn("rank",
        row_number().over(Window.orderBy(col("f").desc, col("tok")))
          .cast("long"))
      // f(1) is simply the max frequency — no second rank window
      val f1 = tf.agg(max("f").as("f1"))
      ranked.crossJoin(broadcast(f1))
        .withColumn("pred_milli",
          expr("(2 * f1 * 1000 + rank) DIV (2 * rank)"))
        .withColumn("ad", abs(col("f") * 1000 - col("pred_milli")))
        .selectExpr("rank", "tok", "f", "pred_milli",
          "CASE WHEN f * 1000 >= pred_milli" +
            " THEN (2 * ad * 10000 + pred_milli) DIV (2 * pred_milli)" +
            " ELSE -((2 * ad * 10000 + pred_milli) DIV (2 * pred_milli))" +
            " END AS dev_bp")
        .orderBy("rank")
    }),

    // PPJoin POSITIONAL filter on top of q136's prefix filter (Xiao et
    // al. '08): a shared prefix token proves a pair COULD reach J ≥ ½;
    // its POSITIONS prove how much overlap is still possible — at the
    // first shared prefix token (positions i, j in the global (df, gh)
    // token order; "first" has both-minimal positions BECAUSE the order
    // is global, and no common token can precede it in both docs), the
    // overlap is bounded by 1 + min(|a|−i, |b|−j). Pairs whose bound
    // can't reach α = ⌈(|a|+|b|)/3⌉ are pruned BEFORE the intersection
    // join — the expensive verify stage shrinks while recall stays
    // exactly 1.0, and this audit MEASURES both claims: candidate
    // counts before/after (pruned_bp) and finals down both paths
    // (n_final_pos = n_final_prefix is the soundness proof in data; the
    // production pipeline would verify only the kept pairs). Measured
    // at sf0.01: 773 prefix candidates → 25 positional survivors
    // (96.8 % pruned, a 31× smaller verify stage) with finals 25 = 25 —
    // recall exactly 1.0. Same pinned-frame plan as q136: min-position
    // rollup rides the prefix self-join, both audits share one
    // checkpointed candidate frame and ONE intersection pass.
    // COST PINNED (r13): isolated median 2.07 s / cal 0.36 at sf0.1
    // after the array-intersect verify rewrite (was 4.68 s; the dual-path
    // soundness audit still verifies EVERY prefix candidate down both
    // paths — that breadth is the query's declared shape).
    "q257_ppjoin_positional" -> ((s, d) => {
      val sets = shinglesPortable(s, d).select("doc_id", "gh")
        .localCheckpoint()
      val sz = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val dfq = sets.groupBy("gh").agg(count(lit(1)).as("df"))
      val wd = Window.partitionBy("doc_id").orderBy(col("df"), col("gh"))
      val prefix = sets.join(dfq.hint("shuffle_hash"), "gh")
        .join(sz.hint("shuffle_hash"), "doc_id")
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") <= col("sz") - expr("(sz + 1) DIV 2") + 1)
        .select("doc_id", "gh", "sz", "rn")
        .localCheckpoint() // both sides of the self-join read it
      val shared = prefix.as("a").join(prefix.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") <= col("b.sz") * 2 && col("b.sz") <= col("a.sz") * 2)
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.sz").as("sza"), col("b.sz").as("szb"),
          col("a.rn").as("ra"), col("b.rn").as("rb"))
      val cand = shared.groupBy("da", "db", "sza", "szb")
        .agg(min("ra").as("i"), min("rb").as("j"))
        .withColumn("keep", expr(
          "1 + least(sza - i, szb - j) >= (sza + szb + 2) DIV 3"))
        .localCheckpoint() // audit + verify share the candidate frame
      // per-pair array intersection (r13, q136's verify rewrite): sets
      // are distinct per (doc_id, gh), so size(array_intersect) == the
      // old posting-join count — without the Σ|grams| intermediate
      val docArr = sets.groupBy("doc_id").agg(collect_list("gh").as("gs"))
      val inter = cand
        .join(docArr.select(col("doc_id").as("da"), col("gs").as("ga")),
          "da")
        .join(docArr.select(col("doc_id").as("db"), col("gs").as("gb")),
          "db")
        .select(col("da"), col("db"), col("sza"), col("szb"), col("keep"),
          size(array_intersect(col("ga"), col("gb")))
            .cast("long").as("inter"))
        .withColumn("fin", col("inter") * 3 >= col("sza") + col("szb"))
      val a1 = cand.agg(count(lit(1)).as("n_cand_prefix"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_cand_pos"))
      val a2 = inter.agg(
        sum(when(col("fin"), 1L).otherwise(0L)).as("n_final_prefix"),
        sum(when(col("fin") && col("keep"), 1L).otherwise(0L))
          .as("n_final_pos"))
      a1.crossJoin(broadcast(a2))
        .selectExpr("n_cand_prefix", "n_cand_pos",
          "(2 * (n_cand_prefix - n_cand_pos) * 10000 + n_cand_prefix)" +
            " DIV (2 * n_cand_prefix) AS pruned_bp",
          "n_final_prefix", "n_final_pos")
    }),

    // Greedy max-coverage selection — the submodular data-selection
    // primitive (facility location / DEITA-style diversity picking):
    // choose K = 5 documents that together cover the most distinct
    // 5-gram shingles. Greedy is (1 − 1/e)-optimal for coverage, and
    // each of the K rounds is exactly one corpus pass: anti-join the
    // shingle table against the covered set, per-doc gain rollup, and
    // a 1-row argmax (named_struct max with smallest-id tie-break, the
    // q214 recipe — never a sort). The covered set advances by the
    // pick's shingles only. Because each round's gain counts ONLY new
    // shingles, cumulative coverage is the running sum of gains — a
    // closed form over the 5-row pick frame, no per-round corpus
    // recount. At 100 TB: K anti-join passes of a partitioned-in-place
    // shingle table against a broadcastable covered set (bounded by
    // K · max-doc-shingles, not the corpus). Phantom-swing record
    // (r12): one full-session sample printed 6.9 s (ratio 11.5) after
    // a 2.9 s warm run; the isolated median the same hour is 2.18 s
    // (runs 2.82/2.18/1.93) — in-session load spike, not the plan.
    "q261_greedy_coverage" -> ((s, d) => {
      val sets = shinglesPortable(s, d).select("doc_id", "gh")
        .localCheckpoint()
      var covered = sets.filter(lit(false)).select("gh")
      var out: DataFrame = null
      for (r <- 1 to 5) {
        val gains = sets.join(covered, Seq("gh"), "left_anti")
          .groupBy("doc_id").agg(count(lit(1)).as("gain"))
        val pick = gains
          .agg(expr("max(named_struct('g', gain, 'nid', -doc_id))")
            .as("m"))
          .select(lit(r.toLong).as("round"),
            (col("m.nid") * -1).as("pid"), col("m.g").as("gain"))
          .localCheckpoint() // consumed by output AND the covered union
        out = if (out == null) pick else out.unionByName(pick)
        covered = covered.unionByName(
            sets.join(broadcast(pick.select(col("pid").as("doc_id"))),
              "doc_id").select("gh"))
          .distinct().localCheckpoint()
      }
      out.withColumn("cum_covered", sum("gain").over(
          Window.orderBy("round")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select("round", "pid", "gain", "cum_covered")
        .orderBy("round")
    }),

    // Phrase search over a POSITIONAL index — the adjacency query
    // ("hash join" as consecutive tokens) that q167's position-free
    // posting lists cannot answer: a doc containing both words in the
    // wrong order is a bag-of-words hit but a phrase miss, and this
    // query counts exactly that gap. The positional index is the
    // (doc, term, position) explode; the phrase probe filters it to the
    // two query terms BEFORE any join (term-selective, the posting-list
    // probe shape), then adjacency is an EQUI-join on
    // (doc_id, pos + 1 = pos). Per matching doc: occurrence count;
    // the summary row (-1) carries phrase docs vs bag-of-words docs —
    // the false-positive mass a phrase-blind retriever would return.
    // Scale: positions shuffle only for the two probed terms; the
    // bag-of-words twin rides the same filtered frame.
    "q264_phrase_search" -> ((s, d) => {
      val tp = ld(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .filter(col("tok").isin("hash", "join"))
        .localCheckpoint() // phrase join + bag twin share the probe scan
      val a = tp.filter(col("tok") === "hash")
        .select(col("doc_id"), (col("pos") + 1).as("nxt"))
      val b = tp.filter(col("tok") === "join")
        .select(col("doc_id"), col("pos").as("nxt"))
      val perDoc = a.join(b, Seq("doc_id", "nxt"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
        .localCheckpoint() // doc rows + summary share the phrase join
      val bag = tp.groupBy("doc_id")
        .agg(countDistinct("tok").as("nt"))
        .filter(col("nt") === 2)
        .agg(count(lit(1)).as("n_bag_docs"))
      val summary = perDoc.agg(count(lit(1)).as("n_occ"))
        .crossJoin(broadcast(bag))
        .select(lit(-1L).as("doc_id"),
          col("n_occ"), col("n_bag_docs"))
      perDoc.withColumn("n_bag_docs", lit(0L))
        .unionByName(summary)
        .orderBy("doc_id")
    }),

    // Spark 4's LISTAGG ... WITHIN GROUP — the ANSI ordered string
    // aggregation surface (SPARK-42746), pinned against DuckDB's
    // string_agg ORDER BY: the WITHIN GROUP clause makes the
    // concatenation order part of the QUERY CONTRACT instead of
    // partition luck (the same nondeterminism q252 neutralizes manually
    // with sort_array — here the engine carries it). DISTINCT + ordered
    // concat per group; group count rides the same rollup.
    "q265_listagg" -> ((s, d) => {
      graft.Tables.view(s, d, "orders")
      s.sql("""SELECT o_orderpriority,
                      listagg(DISTINCT o_orderstatus, ',')
                        WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
                      count(*) AS n
               FROM orders
               GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")
    }),

    // Term BURSTINESS (Church & Gale's adaptation): P(a term repeats in
    // a doc | it appears at all) — the statistic that separates bursty
    // content words (one mention begets more) from evenly-sprinkled
    // function words, and the empirical basis for BM25's tf SATURATION
    // (a second occurrence carries less evidence than the first —
    // quantified here per term, in half-up bp). Two rollups: per-(doc,
    // term) counts, then per-term df / df₂₊ / total occurrences; the
    // top-20 by document frequency ride TakeOrdered. At 100 TB both
    // rollups are map-side-combined keyed aggregates, output
    // vocabulary-sized then top-k.
    "q268_term_burstiness" -> ((s, d) => {
      ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("tok")
        .agg(count(lit(1)).as("df"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df_rep"),
          sum("c").as("cf"))
        .selectExpr("tok", "df", "df_rep", "cf",
          "(2 * df_rep * 10000 + df) DIV (2 * df) AS adapt_bp")
        .orderBy(col("df").desc, col("tok")).limit(20)
    }),

    // Pairwise source VOCABULARY overlap — the exact twin of q213's KMV
    // sketch estimate, feasible because |sources| is bounded while the
    // corpus is not: an inverted (term → distinct sources) frame
    // generates per-term source pairs (fanout ≤ C(|sources|, 2), never
    // corpus-sized), shared-term counts roll up per pair, and Jaccard
    // closes with the broadcast per-source vocabulary sizes via
    // |A∪B| = |A| + |B| − |A∩B|. The 190-row matrix is the
    // which-crawls-duplicate-each-other heat map a mixture planner
    // reads next to q158's rate drift. All integer, half-up bp.
    "q269_source_overlap" -> ((s, d) => {
      val st = ld(s, d, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
        .localCheckpoint() // sizes + pair generation share one frame
      val sz = st.groupBy("source").agg(count(lit(1)).as("nv"))
      val shared = st.as("a")
        .join(st.as("b").hint("shuffle_hash"),
          col("a.tok") === col("b.tok") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter"))
      shared
        .join(broadcast(sz.select(col("source").as("s1"),
          col("nv").as("n1"))), "s1")
        .join(broadcast(sz.select(col("source").as("s2"),
          col("nv").as("n2"))), "s2")
        .selectExpr("s1", "s2", "inter", "n1", "n2",
          "(2 * inter * 10000 + (n1 + n2 - inter))" +
            " DIV (2 * (n1 + n2 - inter)) AS jacc_bp")
        .orderBy("s1", "s2")
    }),

    // Exact WEIGHTED (tf) Jaccard near-dup join — the frequency-aware
    // rung beside q136's set Jaccard and q128's tf-weighted cosine:
    // J_w(a,b) = Σ_t min(tf_a, tf_b) / Σ_t max(tf_a, tf_b), which a
    // tf-aware dedup prefers over set Jaccard when duplication shows up
    // as REPEATED spans (set semantics saturate at 1 occurrence; the
    // weighted form keeps counting). Identity used: Σmax = ΣA + ΣB −
    // Σmin, and min contributes only on SHARED terms — so one
    // gram-keyed candidate join computing Σmin(shared) plus two tiny
    // per-doc total joins yields the exact score with no all-pairs
    // product. Same df-band (2..20) candidate bound as q128 (per-key
    // fan-out ≤ maxdf²); everything integer-exact, J_w ≥ 1/4 via the
    // cross-multiplied 4·Σmin ≥ Σmax, score in half-up basis points.
    // Measured at sf0.01: 11,533 candidate pairs → 25 survivors (the
    // same near-dup cluster q128's cosine finds — two detectors, one
    // truth). At 100 TB: posting-list shuffle keyed on gh, per-doc
    // totals map-side combined — never a corpus broadcast.
    "q286_weighted_jaccard" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15)
      val tf = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long").as("gh"))
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy("gh").agg(count(lit(1)).as("df"))
      val keep = tf.join(
        dfq.filter(col("df").between(2, 20)).select("gh")
          .hint("shuffle_hash"), "gh")
      val tot = keep.groupBy("doc_id").agg(sum("tf").as("st"))
      keep.as("a").join(keep.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(sum(least(col("a.tf"), col("b.tf"))).as("minsum"))
        .join(tot.select(col("doc_id").as("da"), col("st").as("sa"))
          .hint("shuffle_hash"), "da")
        .join(tot.select(col("doc_id").as("db"), col("st").as("sb"))
          .hint("shuffle_hash"), "db")
        .filter(col("minsum") * 4 >= col("sa") + col("sb") - col("minsum"))
        .select(col("da"), col("db"), col("minsum"),
          (col("sa") + col("sb") - col("minsum")).as("maxsum"),
          expr("(2 * minsum * 10000 + (sa + sb - minsum))" +
            " DIV (2 * (sa + sb - minsum))").as("jw_bp"))
        .orderBy("da", "db")
    }),

    // Stupid-backoff NOVELTY profile — the LM-surprise quality screen:
    // for every word-trigram occurrence, which backoff level would a
    // stupid-backoff trigram LM need? level 0 = the full trigram occurs
    // in ≥2 docs (corpus-attested), level 1 = only the (w2,w3) bigram
    // does, level 2 = only the unigram w3, level 3 = OOV. A document
    // whose occurrences skew to high levels is NOVEL relative to the
    // corpus (or garbled — both deserve review before training); docs
    // that are all level 0 are templated/duplicated. No logs, no
    // floats: the per-doc profile is four integer counts plus a half-up
    // novelty rate in bp (share of occurrences needing any backoff).
    // Doc-level distinctness (df, not tf) attests a gram so a doc
    // cannot self-attest by repeating itself. Plan: one tokenize pass
    // fans into the occurrence frame and three df aggregates, then
    // three gram-keyed joins (shuffle_hash — corpus-proportional df
    // frames, never broadcast) and one doc_id rollup. At 100 TB the df
    // frames are the LM's count tables — the exact shape a distributed
    // KenLM build materializes. Measured at sf0.01: 16,733 / 9,422 /
    // 10 / 0 occurrences at levels 0-3.
    "q287_backoff_novelty" -> ((s, d) => {
      def h(c: Column): Column =
        conv(substring(md5(c), 1, 8), 16, 10).cast("long")
      // map-side gram build — no window, no exchange (see shingles; r15)
      val occ = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          h(concat_ws(" ", col("tok"), col("t1"), col("t2"))).as("h3"),
          h(concat_ws(" ", col("t1"), col("t2"))).as("h2"),
          h(col("t2")).as("h1"))
        // pinned: the occurrence frame feeds the three df aggregates AND
        // the final join chain — unpinned, Catalyst re-runs the
        // tokenize+window pass four times (the q136 re-expansion lesson)
        .localCheckpoint()
      def dfOf(key: String): DataFrame = occ
        .select(col("doc_id"), col(key)).distinct()
        .groupBy(key).agg(count(lit(1)).as(s"d$key"))
      occ
        .join(dfOf("h3").hint("shuffle_hash"), "h3")
        .join(dfOf("h2").hint("shuffle_hash"), "h2")
        .join(dfOf("h1").hint("shuffle_hash"), "h1")
        .select(col("doc_id"),
          when(col("dh3") >= 2, 0).when(col("dh2") >= 2, 1)
            .when(col("dh1") >= 2, 2).otherwise(3).as("level"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tri"),
          sum(when(col("level") === 0, 1L).otherwise(0L)).as("n_l0"),
          sum(when(col("level") === 1, 1L).otherwise(0L)).as("n_l1"),
          sum(when(col("level") === 2, 1L).otherwise(0L)).as("n_l2"),
          sum(when(col("level") === 3, 1L).otherwise(0L)).as("n_l3"))
        .select(col("doc_id"), col("n_tri"), col("n_l0"), col("n_l1"),
          col("n_l2"), col("n_l3"),
          expr("(2 * (n_tri - n_l0) * 10000 + n_tri) DIV (2 * n_tri)")
            .as("novelty_bp"))
        .orderBy("doc_id")
    }),

    // RM3-style PSEUDO-RELEVANCE FEEDBACK — the query-expansion rung on
    // q133's BM25 stack: run the original 10-term query, take the
    // top-10 documents as pseudo-relevant, mine the 5 heaviest
    // df-band terms from them (excluding the originals), and re-score
    // with original terms at weight 2, expansion at weight 1 — the
    // classic two-pass retrieval that buys recall for queries whose
    // vocabulary is narrower than the corpus's. Same integer BM25
    // contribution as q133 (rational Robertson idf in bp, milli-unit
    // floor per term), so the expanded score is an order-free BIGINT
    // sum and hash-matches DuckDB. Plan: the feedback doc set (10
    // rows) and both term frames (10 + 5 rows) are honest broadcasts;
    // the corpus-side tf/dl frames shuffle keyed on gh/doc_id exactly
    // once and serve BOTH passes. At 100 TB this is two bucketed
    // posting-list probes, not two corpus scans per query.
    "q288_rm3_feedback" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15)
      val tf = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long").as("gh"))
        .groupBy("doc_id", "gh").agg(count(lit(1)).as("tf"))
        .localCheckpoint() // serves pass 1 scoring, expansion mining, pass 2
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("nd"), sum("dl").as("total"))
      val dfq = tf.groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 20))
      val qterms = dfq.orderBy(col("df").desc, col("gh")).limit(10)
      val contrib = expr(
        """((nd - df + 1) * 10000 DIV (df + 1)) * 22 * tf * 100000
           DIV (tf * 1000000 + 300000 + (900000 * dl * nd) DIV total)""")
      val pass1 = tf.join(broadcast(qterms), "gh")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), contrib.as("c"))
        .groupBy("doc_id").agg(sum("c").as("s1"))
        .orderBy(col("s1").desc, col("doc_id")).limit(10)
      val expand = tf.join(broadcast(pass1.select("doc_id")), "doc_id")
        .join(dfq.hint("shuffle_hash"), "gh")
        .join(broadcast(qterms.select(col("gh"))), Seq("gh"), "left_anti")
        .groupBy("gh", "df").agg(sum("tf").as("ftf"))
        .orderBy(col("ftf").desc, col("gh")).limit(5)
      val terms = qterms.select(col("gh"), col("df"), lit(2L).as("wt"))
        .unionByName(expand.select(col("gh"), col("df"), lit(1L).as("wt")))
      tf.join(broadcast(terms), "gh")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), (col("wt") * contrib).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("score_milli"), count(lit(1)).as("n_terms"))
        .orderBy(col("score_milli").desc, col("doc_id")).limit(20)
    }),

    // Distributed TOP-K WITH PROVABLE BOUNDS (TPUT-style) — the
    // communication-frugal top-k every 1000-executor aggregation
    // wants: each of 8 doc-shards ships only its local top-20 gram
    // counts plus its local threshold (the 21st count); the
    // coordinator derives, for every surfaced candidate, a LOWER bound
    // (sum of counts actually seen in shard tops) and an UPPER bound
    // (unseen shards contribute at most their threshold). The audit
    // then computes the EXACT global counts and certifies
    // lb ≤ exact ≤ ub for the top-10 — the invariant that lets a real
    // deployment prune without a second round-trip. Shards are
    // deterministic (doc_id % 8) so both engines build identical tops;
    // per-shard ranks ride one Window (WindowGroupLimit-pruned), the
    // candidate×shard grid is 160×8 literal-tiny, and the exact
    // recount is one map-side-combined groupBy. At 100 TB the
    // shipped state is k'·shards rows — independent of corpus size.
    "q290_sharded_topk_bounds" -> ((s, d) => {
      // map-side gram build — no window, no exchange (see shingles; r15)
      val sh = ld(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("tok"),
          get(col("toks"), col("pos") + 1).as("t1"),
          get(col("toks"), col("pos") + 2).as("t2"))
        .filter(col("t2").isNotNull)
        .select((col("doc_id") % 8).as("shard"),
          conv(substring(md5(concat_ws(" ", col("tok"), col("t1"),
            col("t2"))), 1, 8), 16, 10).cast("long").as("gh"))
        .groupBy("shard", "gh").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // tops + thresholds + exact recount share it
      val wr = Window.partitionBy("shard")
        .orderBy(col("cnt").desc, col("gh"))
      val ranked = sh.withColumn("rn", row_number().over(wr))
      val tops = ranked.filter(col("rn") <= 20)
        .select("shard", "gh", "cnt")
      val thr = ranked.filter(col("rn") === 21)
        .select(col("shard"), col("cnt").as("t"))
      val shards = sh.select("shard").distinct()
      val grid = tops.select("gh").distinct()
        .crossJoin(shards)
        .join(broadcast(thr), Seq("shard"), "left")
        .join(tops, Seq("shard", "gh"), "left")
        .groupBy("gh").agg(
          sum(coalesce(col("cnt"), lit(0L))).as("lb"),
          sum(coalesce(col("cnt"), coalesce(col("t"), lit(0L)))).as("ub"))
      val exact = sh.groupBy("gh").agg(sum("cnt").as("exact"))
      grid.join(exact.hint("shuffle_hash"), "gh")
        .select(col("gh"), col("lb"), col("exact"), col("ub"),
          (col("lb") <= col("exact") && col("exact") <= col("ub"))
            .as("bound_ok"))
        .orderBy(col("exact").desc, col("gh")).limit(10)
    }),

    // TEXTTILING topical segmentation — the boundary detector a RAG
    // chunking pipeline runs where q108's fixed-stride and q113's CDC
    // chunkers cut by position/content-hash: adjacent 20-token blocks
    // are compared as tf vectors, and a gap whose cosine falls below
    // the threshold is a topic boundary (Hearst's TextTiling, the
    // depth-score simplified to an absolute cut). Cosine in the
    // cross-multiplied integer cos²-bp form (q128's trick — no sqrt);
    // gaps whose blocks share NO token get dot 0 explicitly via the
    // left join (they are the strongest boundaries — an inner join
    // would silently drop exactly the rows that matter most). One
    // tokenize pass fans into the pinned (doc, block, token) tf frame;
    // the adjacent-block join is keyed on (doc, token) and the gap
    // list on (doc, block) — per-doc work is blocks·vocab, linear in
    // corpus at 100 TB. Measured at sf0.01: 1,064 gaps, cos²-bp
    // 16–6,364, 148 boundaries below 500.
    "q306_texttiling" -> ((s, d) => {
      val tf = ld(s, d, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), expr("pos DIV 20").as("blk"), col("tok"))
        .groupBy("doc_id", "blk", "tok").agg(count(lit(1)).as("tf"))
        .localCheckpoint() // adjacent-join sides + norms share it
      val nrm = tf.groupBy("doc_id", "blk")
        .agg(sum(col("tf") * col("tf")).as("n2"))
      val dot = tf.as("a").join(tf.as("b").hint("shuffle_hash"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.blk") === col("a.blk") + 1 &&
            col("a.tok") === col("b.tok"))
        .groupBy(col("a.doc_id").as("doc_id"), col("a.blk").as("blk"))
        .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
      val gaps = nrm.as("x").join(nrm.as("y").hint("shuffle_hash"),
          col("x.doc_id") === col("y.doc_id") &&
            col("y.blk") === col("x.blk") + 1)
        .select(col("x.doc_id").as("doc_id"), col("x.blk").as("blk"),
          col("x.n2").as("na2"), col("y.n2").as("nb2"))
      gaps.join(dot.hint("shuffle_hash"), Seq("doc_id", "blk"), "left")
        .select(col("doc_id"), col("blk").cast("long").as("blk"),
          expr("CAST((2 * coalesce(dot, 0) * coalesce(dot, 0) * 10000" +
            " + na2 * nb2) DIV (2 * na2 * nb2) AS BIGINT)").as("cos2_bp"))
        .withColumn("is_boundary", col("cos2_bp") < 500)
        .orderBy("doc_id", "blk")
    }),

    // ISOTONIC REGRESSION (PAVA) CALIBRATION — the monotone-fit rung
    // beside q210's raw reliability bins: the empirical rate of
    // "document is fully novel" (every 3-gram distinct) per length
    // decile is NOT monotone in length (measured: bins 0–3 and 7–9
    // violate), but the relationship is physically monotone
    // (longer → more repeats), so the calibrated curve is the
    // antitonic L2 fit — computed exactly via the minimax identity
    // ĝ(i) = max_{j≤i} min_{k≥i} avg(j..k) on the REVERSED bin index
    // (isotonic in reversed order ≡ antitonic), which equals the PAVA
    // pool-adjacent-violators solution without any sequential pass.
    // Everything after the one corpus aggregate runs on the pinned
    // 10-row bin frame: interval averages in floor micro units (all
    // operands nonnegative, so DIV and // agree), 55 intervals, two
    // tiny rollups. At 100 TB the corpus cost is one groupBy; the fit
    // is constant-size. The `pooled` column marks bins the fit
    // adjusted — the violators PAVA merged.
    "q300_isotonic_calibration" -> ((s, d) => {
      val d3 = shinglesPortable(s, d).groupBy("doc_id")
        .agg(count(lit(1)).as("d3"))
      val docs = ld(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          (size(split(col("text"), " ")) - 2).cast("long").as("n3"))
        .join(d3.hint("shuffle_hash"), "doc_id")
      val mm = docs.agg(min("n_chars").as("mn"), max("n_chars").as("mx"))
      val bins = docs.crossJoin(broadcast(mm))
        .select(
          expr("9 - least(9, (n_chars - mn) * 10 DIV (mx - mn + 1))")
            .as("rb"),
          when(col("d3") === col("n3"), 1L).otherwise(0L).as("y"))
        .groupBy("rb").agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .localCheckpoint() // 10 rows: intervals, fit, and output read it
      val jk = bins.select(col("rb").as("j"))
        .crossJoin(bins.select(col("rb").as("k")))
        .filter(col("j") <= col("k"))
      val iv = jk.join(bins.as("m"),
          col("m.rb").between(col("j"), col("k")))
        .groupBy("j", "k")
        .agg(expr("sum(pos) * 1000000 DIV sum(n)").as("r"))
      val fit = bins.select(col("rb").as("i"))
        .join(iv, col("j") <= col("i") && col("i") <= col("k"))
        .groupBy("i", "j").agg(min("r").as("mi"))
        .groupBy("i").agg(max("mi").as("iso_micro"))
      bins.join(fit, col("rb") === col("i"))
        .select((lit(9L) - col("rb")).as("bin"), col("n"), col("pos"),
          expr("pos * 1000000 DIV n").as("raw_micro"), col("iso_micro"),
          (col("iso_micro") =!= expr("pos * 1000000 DIV n")).as("pooled"))
        .orderBy("bin")
    }),

    // BITMAP-INDEX SET OPERATIONS — per-source vocabulary membership
    // packed into 64-bit words (gram hash → slot of a 65,536-bit
    // bitmap → bit_or per word): source-pair intersection/union become
    // popcounts over word-aligned AND/OR — the bitmap-join
    // acceleration every OLAP engine keeps beside its roaring bitmaps,
    // and the deterministic fixed-size counterpart of q213's KMV
    // sketch. The audit joins the bitmap estimate against the EXACT
    // shared-gram count (q269's recipe): hash collisions can only
    // inflate the intersection, and inflation_bp REPORTS that bias per
    // pair instead of assuming slots were enough (measured here: ~9 %
    // occupancy inflates small intersections by 30-45 % — the honest
    // "size your bitmap" number). Exchanged state is |sources| × 1,024
    // words at ANY corpus size; both the bitmap build and the exact
    // join ride the pinned source-distinct gram frame. Long word
    // arithmetic: Spark's signed shiftleft(1L, 63) wraps to the same
    // bit pattern DuckDB's UBIGINT shift produces, and only popcounts
    // cross the compare boundary, so signedness never leaks.
    "q299_bitmap_overlap" -> ((s, d) => {
      val st = shinglesPortable(s, d).select("source", "gh").distinct()
        .localCheckpoint() // bitmap build + both exact-join sides
      val bm = st.select(col("source"),
          expr("(gh % 65536) DIV 64").as("word"),
          expr("shiftleft(1L, CAST(gh % 64 AS INT))").as("bit"))
        .groupBy("source", "word").agg(expr("bit_or(bit)").as("bits"))
        .localCheckpoint() // both bitmap pair-join sides
      val pb = bm.as("a").join(bm.as("b").hint("shuffle_hash"),
          col("a.word") === col("b.word") &&
            col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(
          sum(expr("bit_count(a.bits & b.bits)").cast("long"))
            .as("inter_bm"),
          sum(expr("bit_count(a.bits | b.bits)").cast("long"))
            .as("union_bm"))
      val pe = st.as("a").join(st.as("b").hint("shuffle_hash"),
          col("a.gh") === col("b.gh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("inter_ex"))
      pb.join(pe.hint("shuffle_hash"), Seq("s1", "s2"))
        .select(col("s1"), col("s2"), col("inter_ex"), col("inter_bm"),
          col("union_bm"),
          expr("(2 * (inter_bm - inter_ex) * 10000 + inter_ex)" +
            " DIV (2 * inter_ex)").as("inflation_bp"))
        .orderBy("s1", "s2")
    }),

    // LSH banding PLANNER — the S-curve 1 − (1 − s^r)^b that justifies
    // every (bands × rows) choice in the minhash stack (q46's 8×8, the
    // r4 4-bit-banding rejection, q229's threshold sweep measures the
    // same trade empirically): collision probability per similarity
    // level for every 64-hash split, computed in EXACT integer micro
    // units — powers by repeated squaring with one half-up
    // requantization per squaring (b and r are powers of two, so s^r
    // and (1−s^r)^b are log₂-deep chains; both engines evaluate the
    // IDENTICAL generated arithmetic, q232's quantized-chain contract,
    // so the curve is bit-replayable and within ~log₂(64) micro of the
    // true rational). Pure planning math over a 7×4 literal grid —
    // zero corpus IO; ships as a query because the planner must be
    // ENGINE-CHECKED before its constants are trusted in q46/q67/q68.
    "q285_lsh_planner" -> ((s, d) =>
      // coalesce(1) + sortWithinPartitions instead of SQL ORDER BY: a
      // global sort over the 28-row literal grid would insert a range
      // Exchange; SinglePartition satisfies the sort's distribution, so
      // the whole planner stays exchange-free driver-trivial math
      // (PlanSpec pins this).
      s.sql(lshCurveSql("DIV", order = false))
        .coalesce(1).sortWithinPartitions("r", "s_milli")),

    // TEXTRANK KEYWORDS — unsupervised keyword extraction as
    // PageRank over the word co-occurrence graph (adjacent ≥4-char
    // words), the graph-centrality upgrade over q104's TF-IDF and
    // q171's PMI (both are pair statistics; TextRank propagates
    // importance TRANSITIVELY). Same integer fixed-point discipline
    // as q131: pr in e6 micro-units, per-neighbor terms
    // (pr_j·w_ij) DIV s_j summed exactly — no doubles, no
    // order-dependence; 3 rounds, each round's rank frame
    // checkpoint-pinned, the symmetrized edge frame built once. The
    // explicit size≥2 guard matters: Spark's sequence(2,1) counts
    // DOWN (a 2-element pair list from a 1-word doc), DuckDB's
    // range(2,2) is empty — the guard makes the engines agree by
    // never asking.
    "q431_textrank_keywords" -> ((s, d) => {
      val edges = ld(s, d, "documents")
        .select(expr("filter(split(lower(text), ' ')," +
          " w -> length(w) >= 4)").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr("transform(sequence(2, size(ws))," +
          " i -> struct(element_at(ws, i - 1) AS a," +
          " element_at(ws, i) AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
      val und = edges.select(col("a").as("i"), col("b").as("j"))
        .union(edges.select(col("b").as("i"), col("a").as("j")))
        .groupBy("i", "j").agg(count(lit(1)).as("w"))
        .localCheckpoint()
      val sj = und.groupBy("j").agg(sum("w").as("sj"))
        .localCheckpoint()
      var pr = und.select(col("i")).distinct()
        .withColumn("pr", lit(1000000L)).localCheckpoint()
      for (_ <- 1 to 3) {
        pr = und
          .join(pr.withColumnRenamed("i", "j"), "j")
          .join(sj, "j")
          .groupBy("i")
          .agg(sum(expr("(pr * w) DIV sj")).as("acc"))
          .selectExpr("i",
            "150000 + (850000 * acc) DIV 1000000 AS pr")
          .localCheckpoint()
      }
      pr.orderBy(col("pr").desc, col("i")).limit(20)
        .selectExpr("i AS word", "pr AS pr_e6")
    }),

    // NEAR-DUP MUTATION ROBUSTNESS — how much edit does the shingle
    // Jaccard signal survive? Every doc is mutated by dropping each
    // k-th word (k = 20/10/5 ≈ 5/10/20% edits, deterministic — the
    // planted-ground-truth stance of q430/q418: every (original,
    // mutant) pair IS a true duplicate), and the curve reports the
    // exact trigram Jaccard per strength plus how many true dupes
    // the q46-style 0.8 gate would still catch. Everything is
    // PER-ROW array algebra (mutant, both shingle sets, |∩|/|∪|) —
    // no self-join, no shuffle beyond the 3-row rollup; the 100 TB
    // cost is one embarrassingly-parallel pass. Index-free lambda
    // mutation (transform over a filtered index range) because
    // DuckDB's and Spark's index-lambda calling conventions differ.
    "q449_mutation_robustness" -> ((s, d) => {
      val ks = (se: SparkSession) => broadcast(se.range(0, 3)
        .selectExpr("CAST(element_at(array(20, 10, 5)," +
          " CAST(id + 1 AS INT)) AS BIGINT) AS k"))
      // r15 (§2.2/§4.1): the original-text gram set ga is k-INDEPENDENT
      // — it was rebuilt per k behind the ×3 cross join (3× the most
      // expensive lambda in the query for identical results); hoisted
      // above the cross. And the whole interpreted-lambda pass ran in
      // the ONE scan task (single-row-group parquet, the q62/q127
      // disease) — spread the docs across cores first, guarded to a
      // no-op where the scan already splits.
      val docs0 = ld(s, d, "documents")
      val para = s.sparkContext.defaultParallelism
      val docs = if (docs0.rdd.getNumPartitions < para)
        docs0.repartition(para, col("doc_id")) else docs0
      docs
        .select(expr("filter(split(lower(text), ' ')," +
          " w -> length(w) > 0)").as("ws"))
        .filter(size(col("ws")) >= 8)
        .selectExpr("ws",
          "array_distinct(transform(sequence(1, size(ws) - 2)," +
            " i -> array_join(slice(ws, i, 3), ' '))) AS ga")
        .crossJoin(ks(s))
        .selectExpr("k", "ga",
          "transform(filter(sequence(1, size(ws))," +
            " i -> i % k != 0), i -> element_at(ws, i)) AS mw")
        .selectExpr("k", "ga",
          "array_distinct(transform(sequence(1, size(mw) - 2)," +
            " i -> array_join(slice(mw, i, 3), ' '))) AS gb")
        .selectExpr("k",
          "CAST(size(array_intersect(ga, gb)) AS BIGINT) AS ni",
          "CAST(size(array_union(ga, gb)) AS BIGINT) AS nu")
        .selectExpr("k",
          "CAST((2 * ni * 10000 + nu) DIV (2 * nu) AS BIGINT)" +
            " AS jac_bp")
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          expr("CAST((2 * sum(jac_bp) + count(*))" +
            " DIV (2 * count(*)) AS BIGINT)").as("mean_jac_bp"),
          expr("count_if(jac_bp >= 8000)").as("n_caught_at_80"),
          min("jac_bp").as("min_jac_bp"))
        .selectExpr("k", "n_pairs", "mean_jac_bp", "min_jac_bp",
          "n_caught_at_80",
          "CAST((2 * n_caught_at_80 * 10000 + n_pairs)" +
            " DIV (2 * n_pairs) AS BIGINT) AS recall_bp")
        .orderBy(col("k").desc)
    }),

    // LSH CONFIG CHOOSER — q285's S-curve is pure theory over a
    // literal grid; this chooses (r,b) from MEASURED data: the
    // q449 planted 10%-mutation pairs give the real duplicate-
    // similarity distribution, and each grid config's expected
    // recall is E[1−(1−s^r)^b] over those pairs. Every power is an
    // EXPLICIT repeated-squaring multiply chain in DOUBLE (s²,s⁴,s⁸
    // and q²…q³²) — identical IEEE ops on both engines, no libm
    // pow — and per-pair catch probabilities round to e6 integers
    // BEFORE the cross-row mean (the q403 sum-order lesson). The
    // chosen config is the cheapest (min b·r, then r) whose
    // expected recall clears 99%. One corpus scan to the
    // checkpointed pair-similarity frame; the grid is a 12-row
    // broadcast.
    "q452_lsh_config_chooser" -> ((s, d) => {
      val sims = ld(s, d, "documents")
        .select(expr("filter(split(lower(text), ' ')," +
          " w -> length(w) > 0)").as("ws"))
        .filter(size(col("ws")) >= 8)
        .selectExpr("ws",
          "transform(filter(sequence(1, size(ws))," +
            " i -> i % 10 != 0), i -> element_at(ws, i)) AS mw")
        .selectExpr(
          "array_distinct(transform(sequence(1, size(ws) - 2)," +
            " i -> array_join(slice(ws, i, 3), ' '))) AS ga",
          "array_distinct(transform(sequence(1, size(mw) - 2)," +
            " i -> array_join(slice(mw, i, 3), ' '))) AS gb")
        .selectExpr("CAST(size(array_intersect(ga, gb)) AS DOUBLE)" +
          " / size(array_union(ga, gb)) AS sj")
        .selectExpr("sj", "sj * sj AS s2")
        .selectExpr("sj", "s2", "s2 * s2 AS s4")
        .selectExpr("sj", "s2", "s4", "s4 * s4 AS s8")
        .localCheckpoint()
      val grid = s.sql("SELECT * FROM VALUES" +
        " (2,4),(2,8),(2,16),(2,32),(4,4),(4,8),(4,16),(4,32)," +
        " (8,4),(8,8),(8,16),(8,32) AS t(r, b)")
      sims.crossJoin(broadcast(grid))
        .selectExpr("r", "b",
          "1.0D - CASE r WHEN 2 THEN s2 WHEN 4 THEN s4" +
            " ELSE s8 END AS q")
        .selectExpr("r", "b", "q * q AS q2")
        .selectExpr("r", "b", "q2 * q2 AS q4")
        .selectExpr("r", "b", "q4", "q4 * q4 AS q8")
        .selectExpr("r", "b", "q4", "q8", "q8 * q8 AS q16")
        .selectExpr("r", "b", "q4", "q8", "q16",
          "q16 * q16 AS q32")
        .selectExpr("r", "b",
          "CAST(round((1.0D - CASE b WHEN 4 THEN q4" +
            " WHEN 8 THEN q8 WHEN 16 THEN q16 ELSE q32 END)" +
            " * 1000000) AS BIGINT) AS catch_e6")
        .groupBy("r", "b")
        .agg(count(lit(1)).as("n_pairs"),
          expr("CAST((2 * sum(catch_e6) + count(*))" +
            " DIV (2 * count(*)) AS BIGINT)").as("mean_recall_e6"))
        .selectExpr("CAST(r AS BIGINT) AS r", "CAST(b AS BIGINT) AS b",
          "n_pairs", "mean_recall_e6",
          "mean_recall_e6 >= 990000 AS meets_99")
        .withColumn("pick_rank", row_number().over(
          Window.orderBy(expr("CASE WHEN mean_recall_e6 >= 990000" +
            " THEN 0 ELSE 1 END"), expr("b * r"), col("r"),
            col("b"))).cast("long"))
        .withColumn("chosen", col("pick_rank") === 1L)
        .orderBy("r", "b")
    }),

    // BOILERPLATE SENTENCE DETECTION — doc-level dedup (q40) can't
    // see the repeated header/footer SENTENCES that pollute
    // otherwise-unique docs; this is the sentence-granularity pass
    // every web-corpus cleaner runs: regex sentence split, ≥20-char
    // sentences fingerprinted, a sentence is boilerplate when it
    // recurs in ≥3 DISTINCT docs, and the per-source report gives
    // instance counts and the char mass a scrubber would delete.
    // One corpus scan to the checkpointed sentence frame; the
    // boilerplate set is a fingerprint-keyed semi-join (the q118
    // span-scrub shape, one level up).
    "q465_boilerplate_sentences" -> ((s, d) => {
      val sent = ld(s, d, "documents")
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), "[.!?]")).as("raw"))
        .selectExpr("doc_id", "source", "trim(raw) AS sent")
        .filter(length(col("sent")) >= 20)
        .selectExpr("doc_id", "source", "sent",
          "CAST(length(sent) AS BIGINT) AS slen",
          "md5(sent) AS fp")
        .localCheckpoint()
      val boiler = sent.groupBy("fp")
        .agg(countDistinct("doc_id").as("ndocs"))
        .filter(col("ndocs") >= 3)
        .select("fp")
      sent.join(boiler.withColumn("isb", lit(1L)), Seq("fp"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_sentences"),
          sum(coalesce(col("isb"), lit(0L))).as("n_boiler"),
          sum("slen").as("chars_total"),
          sum(expr("CASE WHEN isb = 1 THEN slen ELSE 0 END"))
            .as("chars_boiler"))
        .selectExpr("source", "n_sentences", "n_boiler",
          "chars_total", "chars_boiler",
          "CAST((2 * chars_boiler * 10000 + chars_total)" +
            " DIV (2 * chars_total) AS BIGINT) AS boiler_bp")
        .orderBy("source")
    }),
  )

  /** q285's S-curve, generated once and parameterized only by the
    * integer-division token ("DIV" for Spark, "//" for DuckDB) so both
    * engines run the identical quantized repeated-squaring chain; the
    * Spark caller orders via the DataFrame API (see q285 above), the
    * DuckDB oracle keeps the SQL-level ORDER BY. */
  private[queries] def lshCurveSql(div: String, order: Boolean = true): String = {
    def sq(e: String) = s"((2 * ($e) * ($e) + 1000000) $div 2000000)"
    def pw(base: String, exp: Int): String = {
      var e = base; var k = exp
      while (k > 1) { e = sq(e); k /= 2 }
      e
    }
    val grid = Seq((64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32),
      (1, 64))
    val rows = grid.map { case (b, r) =>
      val sr = pw("CAST(s_milli AS BIGINT) * 1000", r)
      val qb = pw(s"1000000 - ($sr)", b)
      s"SELECT $b AS b, $r AS r, s_milli, " +
        s"CAST(1000000 - ($qb) AS BIGINT) AS collide_micro " +
        "FROM (VALUES (300), (500), (700), (900)) AS sv(s_milli)"
    }.mkString(" UNION ALL ")
    val tail = if (order) " ORDER BY r, s_milli" else ""
    s"""SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
               CAST(s_milli AS BIGINT) AS s_milli, collide_micro
        FROM ($rows)$tail"""
  }

  /** doc_id + 32-bit frequency-weighted SimHash, built relationally:
    * explode tokens → codegen'd hash → one groupBy with 32 ±1-vote sums
    * (map-side combined). The filter()-over-array alternative is an
    * interpreted higher-order function — measurably slower per pass.
    * The token hash is an md5 prefix (not xxhash64) so DuckDB computes the
    * identical signature — Spark `conv(substr(md5(tok),1,8),16,10)` ==
    * DuckDB `('0x'||substr(md5(tok),1,8))::BIGINT` — which upgrades q47/q48
    * from property-checked to REAL hash-matched oracle rows. */
  private def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"v$b"))
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 32).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** 64-bit frequency-weighted SimHash over an md5-derived token hash —
    * same relational ±1-vote shape as [[simhash]] (one keyed groupBy, all
    * codegen'd), but the hash is two 32-bit md5 prefixes instead of
    * xxhash64 so the DuckDB oracle can reproduce it bit-for-bit:
    * Spark `conv(substr(md5(tok),1,8),16,10)` ==
    * DuckDB `('0x' || substr(md5(tok),1,8))::BIGINT`. */
  /** q67's banded near-dup candidate pairs over ANY (doc_id, text) frame —
    * 64-bit simhash, 8 bands of 8 bits, bucket equi-join, exact Hamming
    * re-rank at ≤ 6, distinct pairs. Extracted so q117's curation pipeline
    * can run the same edge builder over its quality/exact-dedup survivors
    * instead of the whole table; q67 and q101 consume it unchanged. */
  private[queries] def simhashBandedPairs(docs: DataFrame): DataFrame = {
    val sig = simhash64(docs)
    val bandCols = (0 until 8).map(j =>
      s"$j, cast(shiftright(sim64, ${8 * j}) & 255 as int)").mkString(", ")
    val buckets = sig.selectExpr("doc_id", "sim64",
      s"stack(8, $bandCols) AS (band_idx, band_val)")
    buckets.as("x").join(buckets.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        bit_count(col("x.sim64").bitwiseXOR(col("y.sim64"))).as("hamming"))
      .filter(col("hamming") <= 6)
      .distinct() // a pair can share several bands
  }

  /** 64-bit simhash per doc, via the native one-pass SimHash64 kernel
    * (graft.functions.TextExprs) — the plan starts at (doc_id, sim64) with
    * no token explode and no 64-column vote aggregate.
    * SimHashParitySpec pins native ≡ [[simhash64Relational]], whose
    * definition is what the DuckDB oracles replay, so the oracle's reach
    * extends to the kernel. ISOLATED MEDIANS (BenchSome, r8, calm host,
    * calibration-ratio'd, sf0.1): q67 1.67 → 0.91 s, q105 → 0.61 s,
    * q101 4.0 → 2.99 s (finally under the 3 s target — the CC loop was
    * never the fat part; the edge BUILD was), q117 7.6-7.9 → 7.11 s. */
  private def simhash64(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextExprs.simhash64(col("text")).as("sim64"))

  /** The relational vote-aggregate form — kept as the kernel's
    * cross-implementation reference (and the shape the DuckDB oracles
    * replay): explode one row per token, 64 ±1-vote sums per doc, bit set
    * iff votes > 0. */
  private[graft] def simhash64Relational(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long").as("h2"))
    def bit(b: Int) =
      if (b < 32) shiftright(col("h1"), b).bitwiseAND(1)
      else shiftright(col("h2"), b - 32).bitwiseAND(1)
    val votes = (0 until 64).map(b =>
      sum(when(bit(b) === 1, 1).otherwise(-1)).as(s"v$b"))
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    // bitwiseOR assembly: bit 63's 1L<<63 is Long.MinValue, which an
    // arithmetic sum would handle too, but OR is overflow-free by nature.
    val sim = (0 until 64).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("sim64"))
  }

  /** q46's minhash permutation family: (a·x + b) mod p with p = 2^31 − 1.
    * Constants are fixed (deterministic across engines/runs) and a is odd
    * and < 2^30 so a·gh never overflows a signed 64-bit integer — the same
    * literals are interpolated into the DuckDB oracle. */
  private val MinhashP: Long = 2147483647L
  private val minhashPerms: Seq[(Long, Long)] = (0 until 16).map { j =>
    val a = ((j * 2654435761L + 1013904223L) % (1L << 30)) | 1L
    val b = (j * 2246822519L + 3266489917L) % MinhashP
    (a, b)
  }

  /** DuckDB replica of [[simhash]] (32-bit), used by q47/q48's oracles. */
  private def duckSimhash32: String = {
    val votes = (0 until 32).map { b =>
      s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    val bits = (0 until 32).map { b =>
      s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
        th AS (SELECT doc_id,
                      ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
               FROM toks),
        v AS (SELECT doc_id, $votes FROM th GROUP BY doc_id),
        sig AS (SELECT doc_id, $bits AS s FROM v)"""
  }

  /** DuckDB replica of [[simhash64]], used by q67's brute-force oracle and
    * (via `from`) by q117's over its dedup-survivor CTE. */
  private[queries] def duckSimhash64(from: String = "documents"): String = {
    val votes = (0 until 64).map { b =>
      val src = if (b < 32) s"(h1 >> $b)" else s"(h2 >> ${b - 32})"
      s"sum(CASE WHEN ($src & 1) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(", ")
    // bit 63's literal would overflow DuckDB's BIGINT parser as
    // -9223372036854775808; spell it as an in-range expression instead.
    val bits = (0 until 64).map { b =>
      val pow = if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString
      s"(CASE WHEN v$b > 0 THEN $pow ELSE 0 END)"
    }.mkString(" + ")
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM $from),
        th AS (SELECT doc_id,
                      ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h1,
                      ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h2
               FROM toks),
        v AS (SELECT doc_id, $votes FROM th GROUP BY doc_id),
        sig AS (SELECT doc_id, $bits AS s FROM v)"""
  }

  /** DuckDB-1.0 equivalents. 1-based list indexing; len() casts where DuckDB
    * returns BIGINT and Spark INT. */
  private[queries] val duckGrams =
    """CASE WHEN len(string_split(text, ' ')) >= 3 THEN
         list_transform(range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])
       ELSE [] END"""

  private def duckOcc(w: String): String = {
    val l = w.length
    s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$w', ''))) / $l"
  }

  /** q46's minhash signature pipeline as a DuckDB CTE body (docs → gram
    * hash → 16 LCG-permutation minima), shared by the q46 replay oracle
    * and q107's transitive-closure oracle. */
  private lazy val duckMinhashSig: String = {
    val mins = minhashPerms.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * gh + $b) % $MinhashP) AS m$j" }
      .mkString(",\n                      ")
    s"""docs AS (SELECT doc_id, list_distinct($duckGrams) AS grams
                        FROM documents),
               gh AS (SELECT DISTINCT doc_id,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                      FROM (SELECT doc_id, unnest(grams) AS g FROM docs)),
               sig AS (SELECT doc_id,
                      $mins
                      FROM gh GROUP BY doc_id)"""
  }

  /** "Shares ≥ 1 of the 4 size-4 minhash bands" predicate over sig a/b. */
  private lazy val duckMinhashBandEq: String = (0 until 4).map(b =>
    (0 until 4).map(k => s"a.m${4 * b + k} = b.m${4 * b + k}")
      .mkString("(", " AND ", ")")).mkString("\n             OR ")

  val oracle: Map[String, String] = Map(
    // Full minhash+LSH replay: identical md5-derived gram hash and
    // permutations, brute-force "shares ≥ 1 band" candidate scan — a green
    // hash row proves the Spark banding produced EXACTLY the brute-force
    // candidate set (nothing lost, nothing spurious).
    "q46_minhash_lsh" -> {
      val est = (0 until 16).map(j =>
        s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $duckMinhashSig
          SELECT a.doc_id AS da, b.doc_id AS db,
                 round(($est) / 16.0, 4) AS est_jac
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE $duckMinhashBandEq
          ORDER BY da, db"""
    },
    // Full replay of BOTH sides of the calibration: exact Jaccard over the
    // portable gram hashes AND the 16-perm minhash estimate, in the same
    // integer-basis-point space as the Spark plan.
    "q112_minhash_calibration" -> {
      val est = (0 until 16).map(j =>
        s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $duckMinhashSig,
               shp AS (SELECT g.doc_id, d.source, g.gh
                       FROM gh g JOIN documents d USING (doc_id)),
               cnt AS (SELECT doc_id, count(*) AS n FROM shp GROUP BY 1),
               pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                                count(*) AS n_inter
                         FROM shp a JOIN shp b
                           ON a.gh = b.gh AND a.source = b.source
                              AND a.doc_id < b.doc_id
                         GROUP BY 1, 2),
               j AS (SELECT da, db,
                            (2 * n_inter * 10000
                               + (ca.n + cb.n - n_inter))
                              // (2 * (ca.n + cb.n - n_inter)) AS jac_bp
                     FROM pairs
                     JOIN cnt ca ON ca.doc_id = da
                     JOIN cnt cb ON cb.doc_id = db),
               e AS (SELECT jac_bp, ($est) * 625 AS est_bp
                     FROM j JOIN sig a ON a.doc_id = da
                            JOIN sig b ON b.doc_id = db)
          SELECT CAST(jac_bp // 1000 AS INTEGER) AS bucket,
                 count(*) AS n_pairs,
                 CAST((2 * sum(abs(est_bp - jac_bp)) * 10000 + count(*))
                        // (2 * count(*)) AS DOUBLE) / 10000
                   AS mean_abs_err_bp
          FROM e GROUP BY 1 ORDER BY 1"""
    },
    "q47_simhash" ->
      s"""WITH $duckSimhash32
          SELECT doc_id, s AS simhash FROM sig ORDER BY doc_id""",
    // Brute-force pair scan over the same 32-bit signature — proves the
    // cross-engine simhash AND the exact Hamming filter bit-for-bit.
    "q48_simhash_neardup" ->
      s"""WITH $duckSimhash32
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.s, b.s)) <= 6
          ORDER BY da, db""",
    // Brute-force pair scan over the SAME 64-bit signature — hash-matching
    // this proves both the cross-engine simhash AND that 8×8 banding has
    // 100% recall at hamming ≤ 6 (the pigeonhole guarantee, empirically).
    "q67_simhash_banded" ->
      s"""WITH ${duckSimhash64()}
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.s, b.s)) <= 6
          ORDER BY da, db""",
    // Brute-force ham≤3 scan over the same 64-bit signature — green proves
    // 4×16-bit banding has 100% recall at hamming ≤ 3 (pigeonhole).
    "q105_simhash_banded16" ->
      s"""WITH ${duckSimhash64()}
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
          FROM sig a JOIN sig b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.s, b.s)) <= 3
          ORDER BY da, db""",
    // exact transitive closure over the same pair set — the propagation
    // loop must reach this fixpoint
    "q101_dedup_components" ->
      s"""WITH RECURSIVE ${duckSimhash64()},
          edges AS (SELECT a.doc_id AS da, b.doc_id AS db
                    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.s, b.s)) <= 6),
          syms AS (SELECT da AS a, db AS b FROM edges
                   UNION ALL SELECT db, da FROM edges),
          reach AS (
            SELECT doc_id AS a, doc_id AS b FROM documents
            UNION
            SELECT r.a, s.b FROM reach r JOIN syms s ON r.b = s.a
          )
          SELECT a AS doc_id, min(b) AS cluster_id,
                 CAST(a = min(b) AS BOOLEAN) AS is_canonical
          FROM reach GROUP BY a ORDER BY doc_id""",
    "q106_vocab_coverage" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                       FROM documents),
              pt AS (SELECT doc_id, tok, count(*) AS c
                     FROM toks GROUP BY 1, 2),
              vocab AS (SELECT tok FROM (SELECT tok, sum(c) AS n FROM pt
                                         GROUP BY 1
                                         ORDER BY n DESC, tok LIMIT 20)),
              pd AS (SELECT doc_id, sum(c) AS n_tok FROM pt GROUP BY 1),
              iv AS (SELECT doc_id, sum(c) AS nv
                     FROM pt JOIN vocab USING (tok) GROUP BY 1)
         SELECT pd.doc_id,
                CAST(n_tok AS BIGINT) AS n_tok,
                CAST(coalesce(nv, 0) AS BIGINT) AS n_vocab_tok,
                CAST((10000 * coalesce(nv, 0)) // n_tok AS BIGINT) AS cov_bp
         FROM pd LEFT JOIN iv USING (doc_id)
         ORDER BY doc_id""",
    // exact closure over the full-replay minhash candidate set — same
    // recursive-CTE shape as q101's, edges from q46's shared CTEs
    "q107_minhash_components" ->
      s"""WITH RECURSIVE $duckMinhashSig,
          edges AS (SELECT a.doc_id AS da, b.doc_id AS db
                    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                    WHERE $duckMinhashBandEq),
          syms AS (SELECT da AS a, db AS b FROM edges
                   UNION ALL SELECT db, da FROM edges),
          reach AS (
            SELECT doc_id AS a, doc_id AS b FROM documents
            UNION
            SELECT r.a, s.b FROM reach r JOIN syms s ON r.b = s.a
          )
          SELECT a AS doc_id, min(b) AS cluster_id,
                 CAST(a = min(b) AS BOOLEAN) AS is_canonical
          FROM reach GROUP BY a ORDER BY doc_id""",
    // q101's exact closure + q142's md5 buckets keyed on the CLUSTER id;
    // doc-keyed buckets recomputed alongside for the n_moved audit
    "q181_leakage_split" ->
      s"""WITH RECURSIVE ${duckSimhash64()},
          edges AS (SELECT a.doc_id AS da, b.doc_id AS db
                    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                    WHERE bit_count(xor(a.s, b.s)) <= 6),
          syms AS (SELECT da AS a, db AS b FROM edges
                   UNION ALL SELECT db, da FROM edges),
          reach AS (
            SELECT doc_id AS a, doc_id AS b FROM documents
            UNION
            SELECT r.a, s.b FROM reach r JOIN syms s ON r.b = s.a
          ),
          canon AS (SELECT a AS doc_id, min(b) AS cluster_id
                    FROM reach GROUP BY a),
          j AS (SELECT d.doc_id, d.source, d.n_chars, c.cluster_id,
                       ('0x' || substr(md5(CAST(c.cluster_id AS VARCHAR)),
                         1, 8))::BIGINT % 100 AS cb,
                       ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                         1, 8))::BIGINT % 100 AS dbk
                FROM documents d JOIN canon c USING (doc_id)),
          k AS (SELECT *,
                       CASE WHEN cb < 80 THEN 'train'
                            WHEN cb < 90 THEN 'val' ELSE 'test' END
                         AS split,
                       CASE WHEN dbk < 80 THEN 'train'
                            WHEN dbk < 90 THEN 'val' ELSE 'test' END
                         AS doc_split
                FROM j)
         SELECT split, source, count(*) AS n_docs,
                CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
                CAST(sum(n_chars) AS BIGINT) AS tot_chars,
                CAST(sum(CASE WHEN doc_split <> split THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_moved
         FROM k GROUP BY 1, 2 ORDER BY split, source""",
    "q55_dedup_keep_best" ->
      """SELECT doc_id, lang, source, n_chars FROM (
           SELECT *, row_number() OVER
             (PARTITION BY md5(text) ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",
    "q56_quality_gate" ->
      """SELECT source, count(*) AS n_kept, round(avg(n_chars), 4) AS avg_len
         FROM documents
         WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.25) FROM documents)
         GROUP BY source ORDER BY source""",
    "q57_det_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE (doc_id * 48271) % 100 < 10 ORDER BY doc_id""",
    "q104_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, source,
                             unnest(regexp_extract_all(lower(text), '[a-z]+'))
                               AS tok
                      FROM documents),
              tf AS (SELECT source, tok, count(*) AS tf
                     FROM tok GROUP BY 1, 2),
              dfq AS (SELECT tok, count(DISTINCT doc_id) AS df
                      FROM tok GROUP BY 1),
              n AS (SELECT count(*) AS n FROM documents),
              scored AS (SELECT source, tok, tf, df,
                                round(tf * ln((n + 1.0) / (df + 1.0)), 6)
                                  AS score
                         FROM tf JOIN dfq USING (tok) CROSS JOIN n),
              r AS (SELECT *, row_number() OVER
                      (PARTITION BY source ORDER BY score DESC, tok) AS rk
                    FROM scored)
         SELECT source, CAST(rk AS INTEGER) AS rk, tok, tf, df, score
         FROM r WHERE rk <= 10 ORDER BY source, rk""",
    "q51_bpe_tokens" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_word,
                CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_num
         FROM documents ORDER BY doc_id""",
    // vocab-level pair counting: 1-based char indexing replaces the window
    // leads (same pairs); rank alias quoted (RANK is a DuckDB keyword)
    "q121_bpe_merges" ->
      """WITH wf AS (SELECT w, count(*) AS freq
                     FROM (SELECT unnest(string_split(text, ' ')) AS w
                           FROM documents)
                     WHERE length(w) >= 2 GROUP BY w),
              ch0 AS (SELECT w, freq,
                             unnest(range(1, length(w))) AS i
                      FROM wf),
              ch AS (SELECT w, freq,
                            w[CAST(i AS INTEGER)] AS a,
                            w[CAST(i AS INTEGER) + 1] AS b
                     FROM ch0),
              pc AS (SELECT a, b, sum(freq) AS pair_cnt FROM ch
                     GROUP BY a, b),
              r AS (SELECT *, row_number() OVER
                      (ORDER BY pair_cnt DESC, a, b) AS mrank FROM pc)
         SELECT CAST(mrank AS INTEGER) AS "rank", a, b,
                CAST(pair_cnt AS BIGINT) AS pair_cnt
         FROM r WHERE mrank <= 20 ORDER BY mrank""",
    // the K training rounds replayed as generated chained CTEs — same
    // run-id/alternating-offset rewrite as the Spark loop, so the merge
    // table must match round by round
    "q124_bpe_train" -> {
      val K = 5
      def round(k: Int): String = {
        val prev = s"vocab${k - 1}"
        s"""
  pos$k AS (SELECT w, freq, generate_subscripts(syms, 1) AS p,
                    unnest(syms) AS s FROM $prev),
  adj$k AS (SELECT w, freq, p, s,
                    lead(s) OVER (PARTITION BY w ORDER BY p) AS nxt
             FROM pos$k),
  pairs$k AS (SELECT s AS a, nxt AS b, sum(freq) AS cnt FROM adj$k
               WHERE nxt IS NOT NULL GROUP BY 1, 2),
  best$k AS (SELECT a, b, cnt FROM pairs$k
              ORDER BY cnt DESC, a, b LIMIT 1),
  cand$k AS (SELECT adj$k.w, adj$k.p FROM adj$k, best$k
              WHERE adj$k.s = best$k.a AND adj$k.nxt = best$k.b),
  runs$k AS (SELECT w, p,
                     p - row_number() OVER (PARTITION BY w ORDER BY p) AS rg
              FROM cand$k),
  kept$k AS (SELECT w, p FROM
                (SELECT w, p, p - min(p) OVER (PARTITION BY w, rg) AS off
                 FROM runs$k)
              WHERE off % 2 = 0),
  vocab$k AS (SELECT w, freq, list(sym ORDER BY p) AS syms FROM
                 (SELECT a.w, a.freq, a.p,
                         CASE WHEN k1.p IS NOT NULL THEN a.s || a.nxt
                              ELSE a.s END AS sym,
                         k2.p IS NOT NULL AS absorbed
                  FROM adj$k a
                  LEFT JOIN kept$k k1 ON a.w = k1.w AND a.p = k1.p
                  LEFT JOIN kept$k k2 ON a.w = k2.w AND a.p = k2.p + 1)
               WHERE NOT absorbed GROUP BY w, freq)"""
      }
      """WITH wf AS (SELECT w, count(*) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              WHERE length(w) >= 2 GROUP BY w),
  vocab0 AS (SELECT w, freq, string_split(w, '') AS syms FROM wf),""" +
        (1 to K).map(round).mkString(",") + s""",
  merges AS (${(1 to K)
          .map(k => s"SELECT $k AS round, a, b, cnt FROM best$k")
          .mkString(" UNION ALL ")})
SELECT CAST(round AS INTEGER) AS round, a AS sym_a, b AS sym_b,
       CAST(cnt AS BIGINT) AS pair_cnt FROM merges ORDER BY round"""
    },
    "q40_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS dup_count
         FROM documents GROUP BY 1 ORDER BY canonical_id""",
    "q41_text_tokens" ->
      """SELECT doc_id,
                CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
                round(length(replace(text, ' ', '')) /
                  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE), 4) AS avg_tok_len,
                length(text) = n_chars AS chars_ok
         FROM documents ORDER BY doc_id""",
    "q42_text_quality" ->
      """SELECT doc_id,
                CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INTEGER) AS n_tokens,
                round(len(list_distinct(string_split(text, ' '))) /
                  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE), 4) AS uniq_ratio,
                round(least(CAST(1.0 AS DOUBLE),
                        CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) / 100)
                  * (len(list_distinct(string_split(text, ' '))) /
                     CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)), 4) AS quality,
                n_chars < 100 AS too_short
         FROM documents ORDER BY doc_id""",
    "q43_lang_id" -> {
      s"""SELECT doc_id, lang, s_en, s_fr, s_de, s_es, pred_lang,
                 pred_lang = lang AS correct
          FROM (
            SELECT *, CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                           WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                           WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang
            FROM (
              SELECT doc_id, lang,
                     ${duckOcc(" the ")} + ${duckOcc(" a ")} + ${duckOcc(" of ")} AS s_en,
                     ${duckOcc(" le ")} + ${duckOcc(" la ")} + ${duckOcc(" et ")} AS s_fr,
                     ${duckOcc(" der ")} + ${duckOcc(" die ")} + ${duckOcc(" und ")} AS s_de,
                     ${duckOcc(" el ")} + ${duckOcc(" los ")} + ${duckOcc(" y ")} AS s_es
              FROM documents))
          ORDER BY doc_id"""
    },
    "q44_fingerprint" ->
      s"""SELECT doc_id, substr(md5(text), 1, 16) AS fp16,
                 substr(md5(text), 1, 2) AS band,
                 CASE WHEN len(string_split(text, ' ')) >= 3
                   THEN list_min(list_transform($duckGrams, g -> md5(g)))
                   ELSE NULL END AS min_gram_fp
          FROM documents ORDER BY doc_id""",
    "q45_ngram_jaccard" ->
      s"""WITH docs AS (SELECT doc_id, source, list_distinct($duckGrams) AS grams
                        FROM documents),
               sh AS (SELECT doc_id, source, unnest(grams) AS g FROM docs),
               sizes AS (SELECT doc_id, len(grams) AS n FROM docs),
               inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_inter
                         FROM sh a JOIN sh b ON a.g = b.g AND a.source = b.source
                           AND a.doc_id < b.doc_id
                         GROUP BY 1, 2)
          SELECT da, db, n_inter,
                 CAST((2 * n_inter * 10000 + (sa.n + sb.n - n_inter))
                      // (2 * (sa.n + sb.n - n_inter)) AS DOUBLE)
                   / 10000 AS jac
          FROM inter JOIN sizes sa ON da = sa.doc_id
                     JOIN sizes sb ON db = sb.doc_id
          ORDER BY da, db""",
    // Same model trained and applied: range() is end-exclusive so i runs
    // 1..len-1, exactly Spark's sequence(1, len-1); sum(BIGINT) comes
    // back HUGEINT in DuckDB, so it is cast to match Spark's LongType.
    "q127_lm_score" ->
      """WITH g AS (SELECT doc_id, substring(text, CAST(i AS INTEGER), 2) AS bg
                    FROM (SELECT doc_id, text,
                                 unnest(range(1, length(text))) AS i
                          FROM documents WHERE length(text) >= 2)),
              lm AS (SELECT bg, count(*) AS c FROM g GROUP BY 1)
         SELECT doc_id, count(*) AS n_bigrams,
                CAST(sum(c) AS BIGINT) AS sum_freq
         FROM g JOIN lm USING (bg)
         GROUP BY doc_id
         ORDER BY doc_id""",
    // Full replay on the identical 32-bit md5 gram keys; DuckDB's
    // HUGEINT sums/divisions cast back to BIGINT to match LongType.
    "q128_sparse_cosine" ->
      s"""WITH tc AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh,
                             count(*) AS tf
                      FROM (SELECT doc_id, unnest($duckGrams) AS g
                            FROM documents)
                      GROUP BY 1, 2),
              dfq AS (SELECT gh FROM tc
                      GROUP BY gh HAVING count(*) BETWEEN 2 AND 20),
              keep AS (SELECT tc.* FROM tc JOIN dfq USING (gh)),
              nrm AS (SELECT doc_id, sum(tf * tf) AS n2
                      FROM keep GROUP BY 1),
              pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                               sum(a.tf * b.tf) AS dot
                        FROM keep a JOIN keep b
                          ON a.gh = b.gh AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT da, db, CAST(dot AS BIGINT) AS dot,
                CAST(na.n2 AS BIGINT) AS na2, CAST(nb.n2 AS BIGINT) AS nb2,
                CAST((2 * dot * dot * 10000 + na.n2 * nb.n2)
                     // (2 * na.n2 * nb.n2) AS BIGINT) AS cos2_bp
         FROM pairs JOIN nrm na ON da = na.doc_id
                    JOIN nrm nb ON db = nb.doc_id
         WHERE 25 * dot * dot >= 4 * na.n2 * nb.n2
         ORDER BY da, db""",
    "q133_bm25" ->
      s"""WITH tc AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh,
                             count(*) AS tf
                      FROM (SELECT doc_id, unnest($duckGrams) AS g
                            FROM documents)
                      GROUP BY 1, 2),
              dls AS (SELECT doc_id, sum(tf) AS dl FROM tc GROUP BY 1),
              st AS (SELECT count(*) AS nd, sum(dl) AS total FROM dls),
              qt AS (SELECT gh, count(*) AS df FROM tc GROUP BY gh
                     HAVING count(*) BETWEEN 2 AND 20
                     ORDER BY df DESC, gh LIMIT 10)
         SELECT doc_id,
                CAST(sum(((nd - df + 1) * 10000 // (df + 1))
                         * 22 * tf * 100000
                         // (tf * 1000000 + 300000
                             + (900000 * dl * nd) // total))
                     AS BIGINT) AS score_milli,
                count(*) AS n_terms
         FROM tc JOIN qt USING (gh) JOIN dls USING (doc_id), st
         GROUP BY doc_id
         ORDER BY score_milli DESC, doc_id LIMIT 20""",
    "q136_jaccard_prefix" ->
      s"""WITH sets AS (SELECT DISTINCT doc_id,
                               ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                        FROM (SELECT doc_id, unnest($duckGrams) AS g
                              FROM documents)),
              sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY 1),
              dfq AS (SELECT gh, count(*) AS df FROM sets GROUP BY 1),
              pr AS (SELECT s.doc_id, s.gh, z.sz
                     FROM (SELECT sets.doc_id, sets.gh, dfq.df,
                                  row_number() OVER
                                    (PARTITION BY sets.doc_id
                                     ORDER BY dfq.df, sets.gh) AS rn
                           FROM sets JOIN dfq USING (gh)) s
                     JOIN sz z USING (doc_id)
                     WHERE s.rn <= z.sz - (z.sz + 1) // 2 + 1),
              cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                              a.sz AS sza, b.sz AS szb
                       FROM pr a JOIN pr b
                         ON a.gh = b.gh AND a.doc_id < b.doc_id
                        AND a.sz <= 2 * b.sz AND b.sz <= 2 * a.sz),
              iv AS (SELECT da, db, sza, szb, count(*) AS inter
                     FROM cand
                     JOIN sets x ON x.doc_id = cand.da
                     JOIN sets y ON y.doc_id = cand.db AND y.gh = x.gh
                     GROUP BY 1, 2, 3, 4)
         SELECT da, db, sza, szb, inter,
                (2 * inter * 10000 + (sza + szb - inter))
                  // (2 * (sza + szb - inter)) AS jacc_bp
         FROM iv WHERE inter * 3 >= sza + szb
         ORDER BY da, db""",
    // md5-hash side split, per-side token counts, exact ppb rates
    "q158_token_drift" ->
      """WITH toks AS (SELECT ('0x' || substr(md5(source), 1, 8))::BIGINT % 2
                              AS side,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
              cnt AS (SELECT side, tok, count(*) AS c FROM toks
                      WHERE len(tok) > 0 GROUP BY side, tok),
              tots AS (SELECT
                         CAST(sum(CASE WHEN side = 0 THEN c ELSE 0 END)
                              AS BIGINT) AS ta,
                         CAST(sum(CASE WHEN side = 1 THEN c ELSE 0 END)
                              AS BIGINT) AS tb
                       FROM cnt),
              j AS (SELECT coalesce(a.tok, b.tok) AS tok,
                           CAST(coalesce(a.c, 0) AS BIGINT) AS ca,
                           CAST(coalesce(b.c, 0) AS BIGINT) AS cb
                    FROM (SELECT tok, c FROM cnt WHERE side = 0) a
                    FULL OUTER JOIN
                         (SELECT tok, c FROM cnt WHERE side = 1) b
                      ON a.tok = b.tok)
         SELECT tok, ca, cb,
                CAST(ca * 1000000000 // ta AS BIGINT) AS rate_a_ppb,
                CAST(cb * 1000000000 // tb AS BIGINT) AS rate_b_ppb,
                CAST(abs(ca * 1000000000 // ta - cb * 1000000000 // tb)
                     AS BIGINT) AS drift_ppb
         FROM j CROSS JOIN tots
         ORDER BY drift_ppb DESC, tok LIMIT 15""",
    // brute recompute of BOTH pair sets (ham≤6 over the replayed simhash;
    // exact Jaccard ≥ ½ over the portable shingles), then the PR rollup
    "q164_detector_calibration" ->
      s"""WITH ${duckSimhash64()},
              det AS (SELECT a.doc_id AS da, b.doc_id AS db
                      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                      WHERE bit_count(xor(a.s, b.s)) <= 6),
              sets AS (SELECT DISTINCT doc_id,
                              ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                       FROM (SELECT doc_id, unnest($duckGrams) AS g
                             FROM documents)),
              sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY 1),
              iv AS (SELECT x.doc_id AS da, y.doc_id AS db,
                            count(*) AS inter
                     FROM sets x JOIN sets y
                       ON x.gh = y.gh AND x.doc_id < y.doc_id
                     GROUP BY 1, 2),
              truth AS (SELECT iv.da, iv.db
                        FROM iv JOIN sz a ON a.doc_id = iv.da
                        JOIN sz b ON b.doc_id = iv.db
                        WHERE inter * 3 >= a.sz + b.sz),
              j AS (SELECT CASE WHEN d.da IS NOT NULL AND t.da IS NOT NULL
                                THEN 1 ELSE 0 END AS tp,
                           CASE WHEN d.da IS NOT NULL AND t.da IS NULL
                                THEN 1 ELSE 0 END AS fp,
                           CASE WHEN d.da IS NULL AND t.da IS NOT NULL
                                THEN 1 ELSE 0 END AS fn
                    FROM det d FULL OUTER JOIN truth t
                      ON d.da = t.da AND d.db = t.db),
              cnts AS (SELECT CAST(sum(tp) AS BIGINT) AS tp,
                              CAST(sum(fp) AS BIGINT) AS fp,
                              CAST(sum(fn) AS BIGINT) AS fn
                       FROM j)
         SELECT tp, fp, fn,
                CAST((2 * tp * 10000 + (tp + fp)) // (2 * (tp + fp))
                     AS BIGINT) AS precision_bp,
                CAST((2 * tp * 10000 + (tp + fn)) // (2 * (tp + fn))
                     AS BIGINT) AS recall_bp
         FROM cnts""",
    "q167_inverted_index" ->
      """WITH td AS (SELECT tok AS term, doc_id, count(*) AS c
                     FROM (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY 1, 2)
         SELECT term, CAST(count(*) AS BIGINT) AS df,
                CAST(sum(c) AS BIGINT) AS cf,
                array_to_string(list(doc_id ORDER BY doc_id)[1:8], ',')
                  AS postings_head
         FROM td GROUP BY term ORDER BY term""",
    // subscript+lead mirrors Spark's posexplode+lead; identical half-up
    // micro-unit division (// vs DIV, all operands non-negative)
    "q171_pmi_collocations" ->
      """WITH toks AS (SELECT doc_id, generate_subscripts(s, 1) AS pos,
                              unnest(s) AS tok
                       FROM (SELECT doc_id, string_split(text, ' ') AS s
                             FROM documents)),
              adj AS (SELECT doc_id, pos, tok,
                             lead(tok) OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS nxt
                      FROM toks),
              pairs AS (SELECT tok AS a, nxt AS b,
                               CAST(count(*) AS BIGINT) AS cnt
                        FROM adj WHERE nxt IS NOT NULL
                        GROUP BY 1, 2 HAVING count(*) >= 5),
              uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu
                      FROM toks GROUP BY tok),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM toks)
         SELECT a, b, cnt,
                CAST((2 * cnt * nt * 1000000 + (ua.cu * ub.cu))
                     // (2 * (ua.cu * ub.cu)) AS BIGINT) AS lift_micro
         FROM pairs JOIN uni ua ON pairs.a = ua.tok
                    JOIN uni ub ON pairs.b = ub.tok
                    CROSS JOIN tot
         ORDER BY lift_micro DESC, a, b LIMIT 50""",
    // Full winnowing replay: identical 32-bit md5 gram hash, identical
    // v = h·2²⁰ + (2²⁰−1−pos) encoding (DuckDB's 1-based token index
    // shifts v by a per-doc constant — argmin-invariant), identical
    // CURRENT ROW..3 FOLLOWING window min and truncated-start-window
    // fallback for short docs. A green hash row proves the fingerprint
    // SETS match gram-for-gram, not just the pair scores.
    "q188_winnow_fingerprint" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                      FROM documents),
              g AS (SELECT doc_id, i AS pos,
                           ('0x' || substr(md5(toks[i] || ' ' ||
                              toks[i+1] || ' ' || toks[i+2]), 1, 8))::BIGINT
                             * 1048576 + (1048575 - i) AS v
                    FROM (SELECT doc_id, toks,
                                 unnest(range(1, len(toks) - 1)) AS i
                          FROM tok WHERE len(toks) >= 3)),
              wmin AS (SELECT doc_id, pos,
                              min(v) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                                AS minv,
                              max(pos) OVER (PARTITION BY doc_id) AS maxp,
                              min(pos) OVER (PARTITION BY doc_id) AS minp
                       FROM g),
              fp AS (SELECT DISTINCT doc_id, minv // 1048576 AS h
                     FROM wmin
                     WHERE pos + 3 <= maxp
                        OR (pos = minp AND maxp - minp < 3)),
              sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nf
                        FROM fp GROUP BY 1),
              pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                               CAST(count(*) AS BIGINT) AS shared
                        FROM fp a JOIN fp b
                          ON a.h = b.h AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT da, db, shared, sa.nf AS na, sb.nf AS nb,
                CAST((2 * shared * 10000 + least(sa.nf, sb.nf))
                     // (2 * least(sa.nf, sb.nf)) AS BIGINT) AS sim_bp
         FROM pairs JOIN sizes sa ON da = sa.doc_id
                    JOIN sizes sb ON db = sb.doc_id
         WHERE 4 * shared >= least(sa.nf, sb.nf)
         ORDER BY da, db""",
    "q190_distinct_ngram_diversity" ->
      s"""WITH g1 AS (SELECT source, unnest(string_split(text, ' ')) AS g
                      FROM documents),
              g2 AS (SELECT source,
                            unnest(list_transform(
                              range(1, len(string_split(text, ' '))),
                              i -> string_split(text, ' ')[i] || ' ' ||
                                   string_split(text, ' ')[i+1])) AS g
                     FROM documents),
              g3 AS (SELECT source, unnest($duckGrams) AS g
                     FROM documents),
              a1 AS (SELECT source, 1 AS n,
                            CAST(count(*) AS BIGINT) AS total_g,
                            CAST(count(DISTINCT g) AS BIGINT) AS distinct_g
                     FROM g1 GROUP BY 1),
              a2 AS (SELECT source, 2 AS n,
                            CAST(count(*) AS BIGINT) AS total_g,
                            CAST(count(DISTINCT g) AS BIGINT) AS distinct_g
                     FROM g2 GROUP BY 1),
              a3 AS (SELECT source, 3 AS n,
                            CAST(count(*) AS BIGINT) AS total_g,
                            CAST(count(DISTINCT g) AS BIGINT) AS distinct_g
                     FROM g3 GROUP BY 1)
         SELECT source, n, total_g, distinct_g,
                CAST((2 * distinct_g * 10000 + total_g)
                     // (2 * total_g) AS BIGINT) AS diversity_bp
         FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2
               UNION ALL SELECT * FROM a3)
         ORDER BY source, n""",
    // identical md5 bucket + sign-bit derivation; string_agg ORDER BY
    // bucket mirrors the array_sort serialization byte-for-byte
    "q199_feature_hashing" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
              h AS (SELECT doc_id,
                           ('0x' || substr(md5(tok), 1, 8))::BIGINT % 256
                             AS b,
                           CASE WHEN substr(md5(tok), 9, 1) IN
                                ('8','9','a','b','c','d','e','f')
                                THEN -1 ELSE 1 END AS sgn
                    FROM t),
              bv AS (SELECT doc_id, b, CAST(sum(sgn) AS BIGINT) AS v
                     FROM h GROUP BY 1, 2 HAVING sum(sgn) != 0)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS nnz,
                CAST(sum(abs(v)) AS BIGINT) AS l1,
                md5(string_agg(CAST(b AS VARCHAR) || ':' ||
                  CAST(v AS VARCHAR), ',' ORDER BY b)) AS vec_fp
         FROM bv GROUP BY doc_id ORDER BY doc_id""",
    // full KMV replay: identical 32-bit md5 gram hash, identical k=128
    // sketch + union-sketch construction, integer estimator divisions
    "q213_kmv_overlap" ->
      """WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS toks
                      FROM documents),
              g AS (SELECT DISTINCT source,
                           ('0x' || substr(md5(toks[i] || ' ' ||
                              toks[i+1] || ' ' || toks[i+2]), 1, 8))::BIGINT
                             AS gh
                    FROM (SELECT doc_id, source, toks,
                                 unnest(range(1, len(toks) - 1)) AS i
                          FROM tok WHERE len(toks) >= 3)),
              sk AS (SELECT source, gh FROM
                       (SELECT source, gh, row_number() OVER
                          (PARTITION BY source ORDER BY gh) AS rn FROM g)
                     WHERE rn <= 128),
              srcs AS (SELECT DISTINCT source FROM sk),
              pairs AS (SELECT a.source AS sa, b.source AS sb
                        FROM srcs a, srcs b WHERE a.source < b.source),
              m AS (SELECT sa, sb, gh, max(inA) AS inA, max(inB) AS inB
                    FROM (SELECT p.sa, p.sb, k.gh, 1 AS inA, 0 AS inB
                          FROM pairs p JOIN sk k ON k.source = p.sa
                          UNION ALL
                          SELECT p.sa, p.sb, k.gh, 0, 1
                          FROM pairs p JOIN sk k ON k.source = p.sb)
                    GROUP BY 1, 2, 3),
              us AS (SELECT * FROM
                       (SELECT m.*, row_number() OVER
                          (PARTITION BY sa, sb ORDER BY gh) AS rn FROM m)
                     WHERE rn <= 128),
              est AS (SELECT sa, sb, count(*) AS ku, max(gh) AS hku,
                             sum(inA * inB) AS c
                      FROM us GROUP BY 1, 2),
              exn AS (SELECT source, count(*) AS n FROM g GROUP BY 1),
              exi AS (SELECT a.source AS sa, b.source AS sb,
                             count(*) AS inter
                      FROM g a JOIN g b
                        ON a.gh = b.gh AND a.source < b.source
                      GROUP BY 1, 2)
         SELECT e.sa, e.sb,
                CAST(CASE WHEN ku < 128 THEN ku
                          ELSE (127 * 4294967296) // hku END AS BIGINT)
                  AS est_union,
                CAST(na.n + nb.n - coalesce(i.inter, 0) AS BIGINT)
                  AS exact_union,
                CAST(c AS BIGINT) AS sketch_overlap,
                CAST((2 * c * 10000 + ku) // (2 * ku) AS BIGINT)
                  AS est_jacc_bp,
                CAST((2 * coalesce(i.inter, 0) * 10000
                      + (na.n + nb.n - coalesce(i.inter, 0)))
                     // (2 * (na.n + nb.n - coalesce(i.inter, 0)))
                     AS BIGINT) AS exact_jacc_bp,
                CAST(abs((2 * c * 10000 + ku) // (2 * ku)
                         - (2 * coalesce(i.inter, 0) * 10000
                            + (na.n + nb.n - coalesce(i.inter, 0)))
                           // (2 * (na.n + nb.n - coalesce(i.inter, 0))))
                     AS BIGINT) AS err_bp
         FROM est e LEFT JOIN exi i ON e.sa = i.sa AND e.sb = i.sb
              JOIN exn na ON e.sa = na.source
              JOIN exn nb ON e.sb = nb.source
         ORDER BY e.sa, e.sb""",
    "q215_heaps_law" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
              t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
              dt AS (SELECT tok, (doc_id * 10) // (mx + 1) AS decile
                     FROM t, mx),
              occ AS (SELECT decile, count(*) AS n_occurrences
                      FROM dt GROUP BY 1),
              fresh AS (SELECT decile, count(*) AS new_types FROM
                          (SELECT tok, min(decile) AS decile
                           FROM dt GROUP BY 1)
                        GROUP BY 1),
              nd AS (SELECT (doc_id * 10) // (mx + 1) AS decile,
                            count(*) AS n_docs
                     FROM documents, mx GROUP BY 1)
         SELECT CAST(nd.decile AS BIGINT) AS decile,
                CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_occurrences AS BIGINT) AS n_occurrences,
                CAST(coalesce(new_types, 0) AS BIGINT) AS new_types,
                CAST(sum(coalesce(new_types, 0)) OVER
                  (ORDER BY nd.decile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS cum_types
         FROM nd JOIN occ ON nd.decile = occ.decile
              LEFT JOIN fresh ON nd.decile = fresh.decile
         ORDER BY decile""",
    "q216_token_gini" ->
      """WITH tc AS (SELECT source, tok, count(*) AS n FROM
                       (SELECT source, unnest(string_split(text, ' '))
                          AS tok FROM documents)
                     GROUP BY 1, 2),
              agg AS (SELECT source, sum(n) AS n_occ, count(*) AS n_types,
                             sum(n * (n - 1)) AS same2
                      FROM tc GROUP BY 1)
         SELECT source, CAST(n_occ AS BIGINT) AS n_occ,
                CAST(n_types AS BIGINT) AS n_types,
                CAST((2 * same2 * 10000 + (n_occ * (n_occ - 1)))
                     // (2 * n_occ * (n_occ - 1)) AS BIGINT) AS simpson_bp,
                CAST(10000 - (2 * same2 * 10000 + (n_occ * (n_occ - 1)))
                     // (2 * n_occ * (n_occ - 1)) AS BIGINT)
                  AS gini_simpson_bp
         FROM agg ORDER BY source""",
    "q221_top_p_vocab" ->
      """WITH tc AS (SELECT source, tok, count(*) AS n FROM
                       (SELECT source, unnest(string_split(text, ' '))
                          AS tok FROM documents)
                     GROUP BY 1, 2),
              r AS (SELECT source, tok, n,
                           sum(n) OVER (PARTITION BY source
                             ORDER BY n DESC, tok
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum,
                           sum(n) OVER (PARTITION BY source) AS tot
                    FROM tc),
              k AS (SELECT source, n, tot,
                           CASE WHEN (cum - n) * 10 < tot * 9
                                THEN 1 ELSE 0 END AS keep
                    FROM r)
         SELECT source, CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(keep) AS BIGINT) AS kept_types,
                CAST(sum(keep * n) AS BIGINT) AS kept_occ,
                CAST(max(tot) AS BIGINT) AS tot_occ,
                CAST((2 * sum(keep * n) * 10000 + max(tot))
                     // (2 * max(tot)) AS BIGINT) AS coverage_bp
         FROM k GROUP BY 1 ORDER BY source""",
    // brute-force pair scan + the same degree-oriented wedge basis
    "q227_neardup_transitivity" ->
      s"""WITH ${duckSimhash64()},
              edges AS (SELECT a.doc_id AS da, b.doc_id AS db
                        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                        WHERE bit_count(xor(a.s, b.s)) <= 6),
              und AS (SELECT da AS u, db AS v FROM edges
                      UNION ALL SELECT db, da FROM edges),
              gdeg AS (SELECT u, count(*) AS gd FROM und GROUP BY 1),
              dir AS (SELECT und.u, und.v, gv.gd AS gdv
                      FROM und JOIN gdeg gu ON und.u = gu.u
                               JOIN gdeg gv ON und.v = gv.u
                      WHERE gu.gd < gv.gd
                         OR (gu.gd = gv.gd AND und.u < und.v)),
              w AS (SELECT e1.v AS b, e2.v AS c
                    FROM dir e1 JOIN dir e2 ON e1.u = e2.u
                     AND (e1.gdv < e2.gdv
                          OR (e1.gdv = e2.gdv AND e1.v < e2.v))),
              t AS (SELECT count(*) AS n_triangles FROM w
                    WHERE EXISTS (SELECT 1 FROM dir e3
                                  WHERE e3.u = w.b AND e3.v = w.c)),
              ne AS (SELECT count(*) AS n_edges FROM edges),
              nw AS (SELECT count(*) AS n_wedges FROM w)
         SELECT CAST(n_edges AS BIGINT) AS n_edges,
                CAST(n_wedges AS BIGINT) AS n_wedges,
                CAST(n_triangles AS BIGINT) AS n_triangles,
                CAST(CASE WHEN n_wedges = 0 THEN 10000
                          ELSE (2 * n_triangles * 10000 + n_wedges)
                               // (2 * n_wedges) END AS BIGINT)
                  AS transitivity_bp
         FROM ne, nw, t""",
    "q229_hamming_sweep" ->
      s"""WITH ${duckSimhash64()},
              pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                               bit_count(xor(a.s, b.s)) AS hamming
                        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                        WHERE bit_count(xor(a.s, b.s)) <= 6),
              tot AS (SELECT count(*) AS nn FROM documents),
              pc AS (SELECT hamming, count(*) AS n_pairs FROM pairs
                     GROUP BY 1),
              dfirst AS (SELECT doc_id, min(hamming) AS hamming FROM
                           (SELECT da AS doc_id, hamming FROM pairs
                            UNION ALL SELECT db, hamming FROM pairs)
                         GROUP BY 1),
              dc AS (SELECT hamming, count(*) AS n_docs_new FROM dfirst
                     GROUP BY 1),
              c AS (SELECT pc.hamming, n_pairs,
                           coalesce(n_docs_new, 0) AS n_docs_new
                    FROM pc LEFT JOIN dc ON pc.hamming = dc.hamming)
         SELECT CAST(hamming AS INTEGER) AS hamming,
                CAST(n_pairs AS BIGINT) AS n_pairs,
                CAST(sum(n_pairs) OVER (ORDER BY hamming
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_pairs_cum,
                CAST(sum(n_docs_new) OVER (ORDER BY hamming
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_docs_cum,
                CAST((2 * sum(n_docs_new) OVER (ORDER BY hamming
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      * 10000 + nn) // (2 * nn) AS BIGINT)
                  AS corpus_share_bp
         FROM c, tot ORDER BY hamming""",
    "q230_langid_confusion" -> {
      s"""WITH scored AS (
            SELECT lang, CASE WHEN s_en >= s_fr AND s_en >= s_de
                                   AND s_en >= s_es THEN 'en'
                              WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                              WHEN s_de >= s_es THEN 'de'
                              ELSE 'es' END AS pred_lang
            FROM (
              SELECT doc_id, lang,
                     ${duckOcc(" the ")} + ${duckOcc(" a ")} + ${duckOcc(" of ")} AS s_en,
                     ${duckOcc(" le ")} + ${duckOcc(" la ")} + ${duckOcc(" et ")} AS s_fr,
                     ${duckOcc(" der ")} + ${duckOcc(" die ")} + ${duckOcc(" und ")} AS s_de,
                     ${duckOcc(" el ")} + ${duckOcc(" los ")} + ${duckOcc(" y ")} AS s_es
              FROM documents)),
              totals AS (SELECT lang, count(*) AS n_true FROM scored
                         GROUP BY 1)
          SELECT scored.lang, pred_lang, CAST(count(*) AS BIGINT) AS n,
                 CAST(n_true AS BIGINT) AS n_true,
                 CAST((2 * count(*) * 10000 + n_true) // (2 * n_true)
                      AS BIGINT) AS recall_bp
          FROM scored JOIN totals ON scored.lang = totals.lang
          GROUP BY scored.lang, pred_lang, n_true
          ORDER BY scored.lang, pred_lang"""
    },
    "q234_spearman_proxy" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
                           CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_toks
                    FROM documents),
              r AS (SELECT source,
                           CAST(row_number() OVER (PARTITION BY source
                             ORDER BY n_chars, doc_id) AS BIGINT) AS xr,
                           CAST(row_number() OVER (PARTITION BY source
                             ORDER BY n_toks, doc_id) AS BIGINT) AS yr
                    FROM d)
         SELECT source, CAST(count(*) AS BIGINT) AS n,
                CAST(sum((xr - yr) * (xr - yr)) AS BIGINT) AS s_sq,
                CAST((2 * (2 * count(*) * (count(*) * count(*) - 1)
                       - 6 * sum((xr - yr) * (xr - yr))) * 10000
                      + count(*) * (count(*) * count(*) - 1))
                     // (2 * count(*) * (count(*) * count(*) - 1))
                  AS BIGINT) AS rho_plus1_bp
         FROM r GROUP BY source HAVING count(*) >= 2 ORDER BY source""",
    "q238_cohens_kappa" -> {
      s"""WITH scored AS (
            SELECT lang, CASE WHEN s_en >= s_fr AND s_en >= s_de
                                   AND s_en >= s_es THEN 'en'
                              WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                              WHEN s_de >= s_es THEN 'de'
                              ELSE 'es' END AS pred_lang
            FROM (
              SELECT doc_id, lang,
                     ${duckOcc(" the ")} + ${duckOcc(" a ")} + ${duckOcc(" of ")} AS s_en,
                     ${duckOcc(" le ")} + ${duckOcc(" la ")} + ${duckOcc(" et ")} AS s_fr,
                     ${duckOcc(" der ")} + ${duckOcc(" die ")} + ${duckOcc(" und ")} AS s_de,
                     ${duckOcc(" el ")} + ${duckOcc(" los ")} + ${duckOcc(" y ")} AS s_es
              FROM documents)),
              cm AS (SELECT lang, pred_lang, count(*) AS n_cell
                     FROM scored GROUP BY 1, 2),
              nn AS (SELECT sum(n_cell) AS n FROM cm),
              dg AS (SELECT coalesce(sum(n_cell), 0) AS dg FROM cm
                     WHERE lang = pred_lang),
              pe AS (SELECT coalesce(sum(r * cc), 0) AS p
                     FROM (SELECT lang, sum(n_cell) AS r FROM cm
                           GROUP BY 1) rt
                     JOIN (SELECT pred_lang, sum(n_cell) AS cc FROM cm
                           GROUP BY 1) ct
                       ON rt.lang = ct.pred_lang)
         SELECT CAST(n AS BIGINT) AS n, CAST(dg AS BIGINT) AS diag_n,
                CAST(p AS BIGINT) AS pe_weight,
                CAST((2 * dg * 10000 + n) // (2 * n) AS BIGINT) AS po_bp,
                CAST((2 * p * 10000 + n * n) // (2 * n * n) AS BIGINT)
                  AS pe_bp,
                CAST((2 * (dg * n + n * n - 2 * p) * 10000 + (n * n - p))
                     // (2 * (n * n - p)) AS BIGINT) AS kappa_plus1_bp
         FROM nn, dg, pe"""
    },
    "q239_lorenz_gini" ->
      """WITH hist AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                               AS x, count(*) AS c
                       FROM documents GROUP BY 1),
              h AS (SELECT x, c,
                           sum(c) OVER w AS cum,
                           sum(x * c) OVER w AS cumtok
                    FROM hist
                    WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED
                      PRECEDING AND CURRENT ROW)),
              tot AS (SELECT max(cum) AS n, max(cumtok) AS s FROM h),
              gini AS (SELECT coalesce(sum(x * c * (2 * cum - c - n)), 0)
                                AS num
                       FROM h, tot),
              dec AS (SELECT unnest(range(1, 11)) AS decile),
              db AS (SELECT decile, (decile * n) // 10 AS r FROM dec, tot)
         SELECT decile, CAST(r AS BIGINT) AS boundary_rank,
                CAST(cumtok - (cum - r) * x AS BIGINT) AS cum_tokens,
                CAST((2 * (cumtok - (cum - r) * x) * 10000 + s)
                     // (2 * s) AS BIGINT) AS lorenz_bp,
                CAST((2 * num * 10000 + n * s) // (2 * n * s) AS BIGINT)
                  AS gini_bp
         FROM db LEFT JOIN h ON r > cum - c AND r <= cum
         CROSS JOIN gini CROSS JOIN tot
         ORDER BY decile""",
    "q242_random_projection" -> {
      def sgn(j: Int) =
        s"(CASE WHEN ('0x' || substr(md5('$j:' || tok), 1, 8))::BIGINT" +
          s" % 2 = 0 THEN 1 ELSE -1 END)"
      val pcols = (0 until 8)
        .map(j => s"sum(c * sd * ${sgn(j)}) AS p$j").mkString(", ")
      val sq = (0 until 8).map(j => s"p$j * p$j").mkString(" + ")
      s"""WITH tc AS (SELECT doc_id, tok, count(*) AS c,
                             doc_id // 2 AS pair,
                             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END
                               AS sd
                      FROM (SELECT doc_id,
                                   unnest(string_split(text, ' ')) AS tok
                            FROM documents WHERE doc_id < 20)
                      GROUP BY doc_id, tok),
              proj AS (SELECT pair, $pcols FROM tc GROUP BY pair),
              pd AS (SELECT pair, $sq AS d2_proj FROM proj),
              od AS (SELECT pair, sum(diff * diff) AS d2_orig
                     FROM (SELECT pair, tok, sum(c * sd) AS diff
                           FROM tc GROUP BY 1, 2)
                     GROUP BY 1)
         SELECT pair, CAST(d2_orig AS BIGINT) AS d2_orig,
                CAST(d2_proj AS BIGINT) AS d2_proj,
                CAST((2 * d2_proj * 10000 + 8 * d2_orig)
                     // (16 * d2_orig) AS BIGINT) AS distortion_bp
         FROM pd JOIN od USING (pair) ORDER BY pair"""
    },

    "q249_golden_record" ->
      """WITH m AS (SELECT md5(array_to_string(
                             string_split(text, ' ')[1:8], ' ')) AS ck,
                           doc_id, source, lang, n_chars
                    FROM documents),
              base AS (SELECT ck, min(doc_id) AS canonical_doc_id,
                              count(*) AS n_members,
                              count(DISTINCT source) AS n_sources
                       FROM m GROUP BY ck HAVING count(*) >= 2),
              best AS (SELECT ck, doc_id AS best_doc_id,
                              n_chars AS best_n_chars
                       FROM (SELECT *, row_number() OVER
                               (PARTITION BY ck
                                ORDER BY n_chars DESC, doc_id) AS rn
                             FROM m)
                       WHERE rn = 1),
              sp AS (SELECT ck, source AS src_pick
                     FROM (SELECT ck, source, row_number() OVER
                             (PARTITION BY ck
                              ORDER BY count(*) DESC, source) AS rn
                           FROM m GROUP BY ck, source)
                     WHERE rn = 1),
              lp AS (SELECT ck, lang AS lang_pick
                     FROM (SELECT ck, lang, row_number() OVER
                             (PARTITION BY ck
                              ORDER BY count(*) DESC, lang) AS rn
                           FROM m GROUP BY ck, lang)
                     WHERE rn = 1)
         SELECT canonical_doc_id, n_members, n_sources,
                best_doc_id, best_n_chars, src_pick, lang_pick
         FROM base JOIN best USING (ck) JOIN sp USING (ck)
              JOIN lp USING (ck)
         ORDER BY canonical_doc_id""",

    "q250_zipf_audit" ->
      """WITH tf AS (SELECT tok, count(*) AS f
                     FROM (SELECT unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY tok ORDER BY f DESC, tok LIMIT 50),
              r AS (SELECT tok, f, row_number() OVER
                      (ORDER BY f DESC, tok) AS rank
                    FROM tf),
              f1 AS (SELECT f AS f1 FROM r WHERE rank = 1),
              p AS (SELECT rank, tok, f,
                           (2 * f1 * 1000 + rank) // (2 * rank)
                             AS pred_milli,
                           abs(f * 1000 - (2 * f1 * 1000 + rank)
                               // (2 * rank)) AS ad
                    FROM r CROSS JOIN f1)
         SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(f AS BIGINT) AS f,
                CAST(pred_milli AS BIGINT) AS pred_milli,
                CAST(CASE WHEN f * 1000 >= pred_milli
                     THEN (2 * ad * 10000 + pred_milli) // (2 * pred_milli)
                     ELSE -((2 * ad * 10000 + pred_milli)
                            // (2 * pred_milli))
                     END AS BIGINT) AS dev_bp
         FROM p ORDER BY rank""",

    "q257_ppjoin_positional" ->
      s"""WITH sets AS (SELECT DISTINCT doc_id,
                               ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                        FROM (SELECT doc_id, unnest($duckGrams) AS g
                              FROM documents)),
              sz AS (SELECT doc_id, count(*) AS sz FROM sets GROUP BY 1),
              dfq AS (SELECT gh, count(*) AS df FROM sets GROUP BY 1),
              pr AS (SELECT s.doc_id, s.gh, z.sz, s.rn
                     FROM (SELECT sets.doc_id, sets.gh, dfq.df,
                                  row_number() OVER
                                    (PARTITION BY sets.doc_id
                                     ORDER BY dfq.df, sets.gh) AS rn
                           FROM sets JOIN dfq USING (gh)) s
                     JOIN sz z USING (doc_id)
                     WHERE s.rn <= z.sz - (z.sz + 1) // 2 + 1),
              sh AS (SELECT a.doc_id AS da, b.doc_id AS db,
                            a.sz AS sza, b.sz AS szb,
                            a.rn AS ra, b.rn AS rb
                     FROM pr a JOIN pr b
                       ON a.gh = b.gh AND a.doc_id < b.doc_id
                      AND a.sz <= 2 * b.sz AND b.sz <= 2 * a.sz),
              ck AS (SELECT da, db, sza, szb,
                            (1 + least(sza - min(ra), szb - min(rb)))
                              >= (sza + szb + 2) // 3 AS keep
                     FROM sh GROUP BY 1, 2, 3, 4),
              iv AS (SELECT ck.da, ck.db, ck.sza, ck.szb, ck.keep,
                            count(*) AS inter
                     FROM ck
                     JOIN sets x ON x.doc_id = ck.da
                     JOIN sets y ON y.doc_id = ck.db AND y.gh = x.gh
                     GROUP BY 1, 2, 3, 4, 5),
              a1 AS (SELECT count(*) AS n_cand_prefix,
                            sum(CASE WHEN keep THEN 1 ELSE 0 END)
                              AS n_cand_pos
                     FROM ck),
              a2 AS (SELECT sum(CASE WHEN inter * 3 >= sza + szb
                                     THEN 1 ELSE 0 END) AS n_final_prefix,
                            sum(CASE WHEN inter * 3 >= sza + szb AND keep
                                     THEN 1 ELSE 0 END) AS n_final_pos
                     FROM iv)
         SELECT CAST(n_cand_prefix AS BIGINT) AS n_cand_prefix,
                CAST(n_cand_pos AS BIGINT) AS n_cand_pos,
                CAST((2 * (n_cand_prefix - n_cand_pos) * 10000
                      + n_cand_prefix) // (2 * n_cand_prefix) AS BIGINT)
                  AS pruned_bp,
                CAST(n_final_prefix AS BIGINT) AS n_final_prefix,
                CAST(n_final_pos AS BIGINT) AS n_final_pos
         FROM a1 CROSS JOIN a2""",

    "q261_greedy_coverage" -> {
      // round r: gains vs cov{r-1}, 1-row pick, covered-set union —
      // MATERIALIZED so DuckDB never re-inlines the previous rounds
      // (the q243 exponential-CTE lesson)
      val rounds = (2 to 5).map { r =>
        s"""p$r AS MATERIALIZED (
                SELECT $r AS round, doc_id, count(*) AS g
                FROM sets WHERE gh NOT IN (SELECT gh FROM cov${r - 1})
                GROUP BY doc_id ORDER BY g DESC, doc_id LIMIT 1),
            cov$r AS MATERIALIZED (
                SELECT gh FROM cov${r - 1}
                UNION
                SELECT s.gh FROM sets s, p$r WHERE s.doc_id = p$r.doc_id)"""
      }.mkString(",\n")
      s"""WITH sets AS MATERIALIZED (
                SELECT DISTINCT doc_id,
                       ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                FROM (SELECT doc_id, unnest($duckGrams) AS g
                      FROM documents)),
              p1 AS MATERIALIZED (
                SELECT 1 AS round, doc_id, count(*) AS g
                FROM sets GROUP BY doc_id
                ORDER BY g DESC, doc_id LIMIT 1),
              cov1 AS MATERIALIZED (
                SELECT DISTINCT s.gh FROM sets s, p1
                WHERE s.doc_id = p1.doc_id),
              $rounds,
              picks AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                        UNION ALL SELECT * FROM p3
                        UNION ALL SELECT * FROM p4
                        UNION ALL SELECT * FROM p5)
         SELECT CAST(round AS BIGINT) AS round,
                CAST(doc_id AS BIGINT) AS pid,
                CAST(g AS BIGINT) AS gain,
                CAST(sum(g) OVER (ORDER BY round
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_covered
         FROM picks ORDER BY round"""
    },

    "q264_phrase_search" ->
      """WITH tp AS (SELECT doc_id, generate_subscripts(s, 1) AS pos,
                            unnest(s) AS tok
                     FROM (SELECT doc_id, string_split(text, ' ') AS s
                           FROM documents)),
              f AS (SELECT * FROM tp WHERE tok IN ('hash', 'join')),
              a AS (SELECT doc_id, pos + 1 AS nxt FROM f
                    WHERE tok = 'hash'),
              b AS (SELECT doc_id, pos AS nxt FROM f
                    WHERE tok = 'join'),
              pd AS (SELECT a.doc_id, count(*) AS n_occ
                     FROM a JOIN b USING (doc_id, nxt) GROUP BY 1),
              bag AS (SELECT count(*) AS n_bag_docs FROM
                        (SELECT doc_id FROM f GROUP BY doc_id
                         HAVING count(DISTINCT tok) = 2))
         SELECT CAST(doc_id AS BIGINT) AS doc_id,
                CAST(n_occ AS BIGINT) AS n_occ,
                CAST(0 AS BIGINT) AS n_bag_docs
         FROM pd
         UNION ALL
         SELECT -1, (SELECT count(*) FROM pd),
                CAST(n_bag_docs AS BIGINT)
         FROM bag
         ORDER BY doc_id""",

    "q265_listagg" ->
      """WITH st AS (SELECT o_orderpriority,
                            string_agg(o_orderstatus, ','
                              ORDER BY o_orderstatus) AS statuses
                     FROM (SELECT DISTINCT o_orderpriority, o_orderstatus
                           FROM orders)
                     GROUP BY o_orderpriority),
              cn AS (SELECT o_orderpriority, count(*) AS n
                     FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, statuses, CAST(n AS BIGINT) AS n
         FROM st JOIN cn USING (o_orderpriority)
         ORDER BY o_orderpriority""",

    "q268_term_burstiness" ->
      """WITH dt AS (SELECT doc_id, tok, count(*) AS c
                     FROM (SELECT doc_id,
                                  unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY doc_id, tok),
              t AS (SELECT tok, count(*) AS df,
                           sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)
                             AS df_rep,
                           sum(c) AS cf
                    FROM dt GROUP BY tok)
         SELECT tok, CAST(df AS BIGINT) AS df,
                CAST(df_rep AS BIGINT) AS df_rep,
                CAST(cf AS BIGINT) AS cf,
                CAST((2 * df_rep * 10000 + df) // (2 * df) AS BIGINT)
                  AS adapt_bp
         FROM t ORDER BY df DESC, tok LIMIT 20""",

    "q269_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source, tok
                     FROM (SELECT source,
                                  unnest(string_split(text, ' ')) AS tok
                           FROM documents)),
              sz AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
              sh AS (SELECT a.source AS s1, b.source AS s2,
                            count(*) AS inter
                     FROM st a JOIN st b
                       ON a.tok = b.tok AND a.source < b.source
                     GROUP BY 1, 2)
         SELECT s1, s2, CAST(inter AS BIGINT) AS inter,
                CAST(za.nv AS BIGINT) AS n1, CAST(zb.nv AS BIGINT) AS n2,
                CAST((2 * inter * 10000 + (za.nv + zb.nv - inter))
                     // (2 * (za.nv + zb.nv - inter)) AS BIGINT)
                  AS jacc_bp
         FROM sh JOIN sz za ON sh.s1 = za.source
                 JOIN sz zb ON sh.s2 = zb.source
         ORDER BY s1, s2""",

    "q285_lsh_planner" -> lshCurveSql("//"),

    "q306_texttiling" ->
      """WITH tok AS (SELECT doc_id, i - 1 AS pos, ws[i] AS tok
                      FROM (SELECT doc_id, string_split(text, ' ') AS ws
                            FROM documents),
                           unnest(range(1, len(ws) + 1)) AS t(i)),
              tf AS (SELECT doc_id, pos // 20 AS blk, tok, count(*) AS tf
                     FROM tok GROUP BY 1, 2, 3),
              nrm AS (SELECT doc_id, blk, sum(tf * tf) AS n2
                      FROM tf GROUP BY 1, 2),
              dt AS (SELECT a.doc_id, a.blk, sum(a.tf * b.tf) AS dot
                     FROM tf a JOIN tf b
                       ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
                          AND a.tok = b.tok
                     GROUP BY 1, 2),
              gaps AS (SELECT x.doc_id, x.blk, x.n2 AS na2, y.n2 AS nb2
                       FROM nrm x JOIN nrm y
                         ON x.doc_id = y.doc_id AND y.blk = x.blk + 1)
         SELECT g.doc_id, CAST(g.blk AS BIGINT) AS blk,
                CAST((2 * coalesce(dt.dot, 0) * coalesce(dt.dot, 0)
                        * 10000 + g.na2 * g.nb2)
                     // (2 * g.na2 * g.nb2) AS BIGINT) AS cos2_bp,
                ((2 * coalesce(dt.dot, 0) * coalesce(dt.dot, 0) * 10000
                   + g.na2 * g.nb2) // (2 * g.na2 * g.nb2) < 500)
                  AS is_boundary
         FROM gaps g LEFT JOIN dt
           ON g.doc_id = dt.doc_id AND g.blk = dt.blk
         ORDER BY g.doc_id, g.blk""",

    "q300_isotonic_calibration" ->
      s"""WITH d AS (SELECT doc_id, n_chars,
                            len(list_distinct($duckGrams)) AS d3,
                            len(string_split(text, ' ')) - 2 AS n3
                     FROM documents),
              mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx FROM d),
              bins AS (SELECT 9 - least(9, (n_chars - mn) * 10
                                // (mx - mn + 1)) AS rb,
                              count(*) AS n,
                              sum(CASE WHEN d3 = n3 THEN 1 ELSE 0 END)
                                AS pos
                       FROM d, mm GROUP BY 1),
              iv AS (SELECT j.rb AS j, k.rb AS k,
                            sum(m.pos) * 1000000 // sum(m.n) AS r
                     FROM bins j, bins k, bins m
                     WHERE j.rb <= k.rb AND m.rb BETWEEN j.rb AND k.rb
                     GROUP BY 1, 2),
              mi AS (SELECT i.rb AS i, iv.j, min(iv.r) AS mi
                     FROM bins i JOIN iv
                       ON iv.j <= i.rb AND i.rb <= iv.k
                     GROUP BY 1, 2),
              fit AS (SELECT i, max(mi) AS iso_micro FROM mi GROUP BY 1)
         SELECT CAST(9 - bins.rb AS BIGINT) AS bin,
                CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
                CAST(pos * 1000000 // n AS BIGINT) AS raw_micro,
                CAST(iso_micro AS BIGINT) AS iso_micro,
                (iso_micro <> pos * 1000000 // n) AS pooled
         FROM bins JOIN fit ON bins.rb = fit.i
         ORDER BY bin""",

    "q299_bitmap_overlap" ->
      s"""WITH st AS (SELECT DISTINCT source,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh
                      FROM (SELECT source, unnest($duckGrams) AS g
                            FROM documents)),
              bm AS (SELECT source, (gh % 65536) // 64 AS word,
                            bit_or((1::UBIGINT)
                              << CAST(gh % 64 AS INTEGER)) AS bits
                     FROM st GROUP BY 1, 2),
              pb AS (SELECT a.source AS s1, b.source AS s2,
                            sum(bit_count(a.bits & b.bits)) AS inter_bm,
                            sum(bit_count(a.bits | b.bits)) AS union_bm
                     FROM bm a JOIN bm b
                       ON a.word = b.word AND a.source < b.source
                     GROUP BY 1, 2),
              pe AS (SELECT a.source AS s1, b.source AS s2,
                            count(*) AS inter_ex
                     FROM st a JOIN st b
                       ON a.gh = b.gh AND a.source < b.source
                     GROUP BY 1, 2)
         SELECT pb.s1, pb.s2, CAST(inter_ex AS BIGINT) AS inter_ex,
                CAST(inter_bm AS BIGINT) AS inter_bm,
                CAST(union_bm AS BIGINT) AS union_bm,
                CAST((2 * (inter_bm - inter_ex) * 10000 + inter_ex)
                     // (2 * inter_ex) AS BIGINT) AS inflation_bp
         FROM pb JOIN pe ON pb.s1 = pe.s1 AND pb.s2 = pe.s2
         ORDER BY pb.s1, pb.s2""",

    "q288_rm3_feedback" ->
      s"""WITH tc AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh,
                             count(*) AS tf
                      FROM (SELECT doc_id, unnest($duckGrams) AS g
                            FROM documents)
                      GROUP BY 1, 2),
              dls AS (SELECT doc_id, sum(tf) AS dl FROM tc GROUP BY 1),
              st AS (SELECT count(*) AS nd, sum(dl) AS total FROM dls),
              dfq AS (SELECT gh, count(*) AS df FROM tc GROUP BY gh
                      HAVING count(*) BETWEEN 2 AND 20),
              qt AS (SELECT gh, df FROM dfq ORDER BY df DESC, gh LIMIT 10),
              p1 AS (SELECT doc_id,
                            sum(((nd - df + 1) * 10000 // (df + 1))
                                * 22 * tf * 100000
                                // (tf * 1000000 + 300000
                                    + (900000 * dl * nd) // total)) AS s1
                     FROM tc JOIN qt USING (gh) JOIN dls USING (doc_id), st
                     GROUP BY doc_id ORDER BY s1 DESC, doc_id LIMIT 10),
              ex AS (SELECT tc.gh, dfq.df, sum(tc.tf) AS ftf
                     FROM tc JOIN p1 USING (doc_id) JOIN dfq USING (gh)
                     WHERE tc.gh NOT IN (SELECT gh FROM qt)
                     GROUP BY 1, 2 ORDER BY ftf DESC, gh LIMIT 5),
              terms AS (SELECT gh, df, 2 AS wt FROM qt
                        UNION ALL SELECT gh, df, 1 FROM ex)
         SELECT doc_id,
                CAST(sum(wt * (((nd - df + 1) * 10000 // (df + 1))
                               * 22 * tf * 100000
                               // (tf * 1000000 + 300000
                                   + (900000 * dl * nd) // total)))
                     AS BIGINT) AS score_milli,
                count(*) AS n_terms
         FROM tc JOIN terms USING (gh) JOIN dls USING (doc_id), st
         GROUP BY doc_id
         ORDER BY score_milli DESC, doc_id LIMIT 20""",

    "q290_sharded_topk_bounds" ->
      s"""WITH sh AS (SELECT doc_id % 8 AS shard,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh,
                             count(*) AS cnt
                      FROM (SELECT doc_id, unnest($duckGrams) AS g
                            FROM documents)
                      GROUP BY 1, 2),
              rk AS (SELECT shard, gh, cnt,
                            row_number() OVER (PARTITION BY shard
                              ORDER BY cnt DESC, gh) AS rn
                     FROM sh),
              tops AS (SELECT shard, gh, cnt FROM rk WHERE rn <= 20),
              thr AS (SELECT shard, cnt AS t FROM rk WHERE rn = 21),
              cands AS (SELECT DISTINCT gh FROM tops),
              shards AS (SELECT DISTINCT shard FROM sh),
              grid AS (SELECT c.gh,
                              sum(coalesce(tp.cnt, 0)) AS lb,
                              sum(coalesce(tp.cnt,
                                    coalesce(th.t, 0))) AS ub
                       FROM cands c CROSS JOIN shards s
                       LEFT JOIN thr th ON th.shard = s.shard
                       LEFT JOIN tops tp
                         ON tp.shard = s.shard AND tp.gh = c.gh
                       GROUP BY c.gh),
              ex AS (SELECT gh, sum(cnt) AS exact FROM sh GROUP BY 1)
         SELECT grid.gh, CAST(lb AS BIGINT) AS lb,
                CAST(exact AS BIGINT) AS exact, CAST(ub AS BIGINT) AS ub,
                (lb <= exact AND exact <= ub) AS bound_ok
         FROM grid JOIN ex ON grid.gh = ex.gh
         ORDER BY exact DESC, grid.gh LIMIT 10""",

    "q286_weighted_jaccard" ->
      s"""WITH tc AS (SELECT doc_id,
                             ('0x' || substr(md5(g), 1, 8))::BIGINT AS gh,
                             count(*) AS tf
                      FROM (SELECT doc_id, unnest($duckGrams) AS g
                            FROM documents)
                      GROUP BY 1, 2),
              dfq AS (SELECT gh FROM tc
                      GROUP BY gh HAVING count(*) BETWEEN 2 AND 20),
              keep AS (SELECT tc.* FROM tc JOIN dfq USING (gh)),
              tot AS (SELECT doc_id, sum(tf) AS st FROM keep GROUP BY 1),
              pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
                               sum(least(a.tf, b.tf)) AS minsum
                        FROM keep a JOIN keep b
                          ON a.gh = b.gh AND a.doc_id < b.doc_id
                        GROUP BY 1, 2)
         SELECT da, db, CAST(minsum AS BIGINT) AS minsum,
                CAST(ta.st + tb.st - minsum AS BIGINT) AS maxsum,
                CAST((2 * minsum * 10000 + (ta.st + tb.st - minsum))
                     // (2 * (ta.st + tb.st - minsum)) AS BIGINT) AS jw_bp
         FROM pairs JOIN tot ta ON da = ta.doc_id
                    JOIN tot tb ON db = tb.doc_id
         WHERE 4 * minsum >= ta.st + tb.st - minsum
         ORDER BY da, db""",

    "q287_backoff_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
              occ AS (SELECT doc_id,
                             ('0x' || substr(md5(concat_ws(' ', ws[i],
                               ws[i+1], ws[i+2])), 1, 8))::BIGINT AS h3,
                             ('0x' || substr(md5(concat_ws(' ', ws[i+1],
                               ws[i+2])), 1, 8))::BIGINT AS h2,
                             ('0x' || substr(md5(ws[i+2]),
                               1, 8))::BIGINT AS h1
                      FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
                      WHERE len(ws) >= 3),
              df3 AS (SELECT h3, count(DISTINCT doc_id) AS d3
                      FROM occ GROUP BY 1),
              df2 AS (SELECT h2, count(DISTINCT doc_id) AS d2
                      FROM occ GROUP BY 1),
              df1 AS (SELECT h1, count(DISTINCT doc_id) AS d1
                      FROM occ GROUP BY 1),
              lv AS (SELECT occ.doc_id,
                            CASE WHEN d3 >= 2 THEN 0 WHEN d2 >= 2 THEN 1
                                 WHEN d1 >= 2 THEN 2 ELSE 3 END AS level
                     FROM occ JOIN df3 USING (h3) JOIN df2 USING (h2)
                              JOIN df1 USING (h1)),
              agg AS (SELECT doc_id, count(*) AS n_tri,
                             sum(CASE WHEN level = 0 THEN 1 ELSE 0 END)
                               AS n_l0,
                             sum(CASE WHEN level = 1 THEN 1 ELSE 0 END)
                               AS n_l1,
                             sum(CASE WHEN level = 2 THEN 1 ELSE 0 END)
                               AS n_l2,
                             sum(CASE WHEN level = 3 THEN 1 ELSE 0 END)
                               AS n_l3
                      FROM lv GROUP BY 1)
         SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri,
                CAST(n_l0 AS BIGINT) AS n_l0, CAST(n_l1 AS BIGINT) AS n_l1,
                CAST(n_l2 AS BIGINT) AS n_l2, CAST(n_l3 AS BIGINT) AS n_l3,
                CAST((2 * (n_tri - n_l0) * 10000 + n_tri)
                     // (2 * n_tri) AS BIGINT) AS novelty_bp
         FROM agg ORDER BY doc_id""",

    // q431: same integer e6 rank rounds, unrolled; // = DIV on these
    // all-positive terms.
    "q431_textrank_keywords" ->
      """WITH wl AS (SELECT list_filter(string_split(lower(text), ' '),
                            w -> len(w) >= 4) AS ws
                     FROM documents),
              pr_pairs AS (SELECT ws[i - 1] AS a, ws[i] AS b
                           FROM wl, unnest(range(2, len(ws) + 1)) AS u(i)
                           WHERE len(ws) >= 2),
              e AS (SELECT a, b FROM pr_pairs WHERE a <> b),
              und AS (SELECT i, j, count(*) AS w FROM (
                        SELECT a AS i, b AS j FROM e
                        UNION ALL SELECT b, a FROM e)
                      GROUP BY 1, 2),
              sj AS (SELECT j, sum(w) AS sj FROM und GROUP BY 1),
              p0 AS (SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS pr
                     FROM und),
              p1 AS (SELECT und.i,
                            150000 + (850000 * sum((p0.pr * und.w)
                              // sj.sj)) // 1000000 AS pr
                     FROM und JOIN p0 ON und.j = p0.i
                       JOIN sj ON und.j = sj.j
                     GROUP BY und.i),
              p2 AS (SELECT und.i,
                            150000 + (850000 * sum((p1.pr * und.w)
                              // sj.sj)) // 1000000 AS pr
                     FROM und JOIN p1 ON und.j = p1.i
                       JOIN sj ON und.j = sj.j
                     GROUP BY und.i),
              p3 AS (SELECT und.i,
                            150000 + (850000 * sum((p2.pr * und.w)
                              // sj.sj)) // 1000000 AS pr
                     FROM und JOIN p2 ON und.j = p2.i
                       JOIN sj ON und.j = sj.j
                     GROUP BY und.i)
         SELECT i AS word, CAST(pr AS BIGINT) AS pr_e6
         FROM p3 ORDER BY pr DESC, i LIMIT 20""",

    // q449: same index-range mutation and per-row set algebra.
    "q449_mutation_robustness" ->
      """WITH w AS (SELECT list_filter(string_split(lower(text), ' '),
                            x -> len(x) > 0) AS ws
                    FROM documents),
              f AS (SELECT ws FROM w WHERE len(ws) >= 8),
              ks AS (SELECT unnest([20, 10, 5]) AS k),
              m AS (SELECT k, ws,
                           list_transform(list_filter(
                             range(1, len(ws) + 1), i -> i % k <> 0),
                             i -> ws[i]) AS mw
                    FROM f CROSS JOIN ks),
              g AS (SELECT k,
                           list_distinct(list_transform(
                             range(1, len(ws) - 1),
                             i -> array_to_string(ws[i:i+2], ' ')))
                             AS ga,
                           list_distinct(list_transform(
                             range(1, len(mw) - 1),
                             i -> array_to_string(mw[i:i+2], ' ')))
                             AS gb
                    FROM m),
              j AS (SELECT k,
                           CAST(len(list_intersect(ga, gb)) AS BIGINT)
                             AS ni,
                           CAST(len(list_distinct(list_concat(ga,
                             gb))) AS BIGINT) AS nu
                    FROM g),
              jb AS (SELECT k, (2 * ni * 10000 + nu) // (2 * nu)
                              AS jac_bp
                     FROM j)
         SELECT CAST(k AS BIGINT) AS k,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST((2 * sum(jac_bp) + count(*)) // (2 * count(*))
                  AS BIGINT) AS mean_jac_bp,
                CAST(min(jac_bp) AS BIGINT) AS min_jac_bp,
                CAST(count_if(jac_bp >= 8000) AS BIGINT)
                  AS n_caught_at_80,
                CAST((2 * count_if(jac_bp >= 8000) * 10000
                      + count(*)) // (2 * count(*)) AS BIGINT)
                  AS recall_bp
         FROM jb GROUP BY 1 ORDER BY k DESC""",

    // q452: identical repeated-squaring multiply chains — the CTE
    // ladder mirrors the Spark select ladder op for op.
    "q452_lsh_config_chooser" ->
      """WITH w AS (SELECT list_filter(string_split(lower(text), ' '),
                            x -> len(x) > 0) AS ws
                    FROM documents),
              f AS (SELECT ws, list_transform(list_filter(
                             range(1, len(ws) + 1), i -> i % 10 <> 0),
                             i -> ws[i]) AS mw
                    FROM w WHERE len(ws) >= 8),
              g AS (SELECT list_distinct(list_transform(
                             range(1, len(ws) - 1),
                             i -> array_to_string(ws[i:i+2], ' ')))
                             AS ga,
                           list_distinct(list_transform(
                             range(1, len(mw) - 1),
                             i -> array_to_string(mw[i:i+2], ' ')))
                             AS gb
                    FROM f),
              sj0 AS (SELECT CAST(len(list_intersect(ga, gb))
                               AS DOUBLE)
                             / len(list_distinct(list_concat(ga, gb)))
                             AS sj
                      FROM g),
              sp AS (SELECT sj, sj * sj AS s2 FROM sj0),
              sp2 AS (SELECT sj, s2, s2 * s2 AS s4 FROM sp),
              sp3 AS (SELECT sj, s2, s4, s4 * s4 AS s8 FROM sp2),
              grid AS (SELECT * FROM (VALUES (2,4),(2,8),(2,16),
                       (2,32),(4,4),(4,8),(4,16),(4,32),(8,4),(8,8),
                       (8,16),(8,32)) t(r, b)),
              qq AS (SELECT r, b, 1.0 - CASE r WHEN 2 THEN s2
                              WHEN 4 THEN s4 ELSE s8 END AS q
                     FROM sp3 CROSS JOIN grid),
              p1 AS (SELECT r, b, q * q AS q2 FROM qq),
              p2 AS (SELECT r, b, q2 * q2 AS q4 FROM p1),
              p3 AS (SELECT r, b, q4, q4 * q4 AS q8 FROM p2),
              p4 AS (SELECT r, b, q4, q8, q8 * q8 AS q16 FROM p3),
              p5 AS (SELECT r, b, q4, q8, q16, q16 * q16 AS q32
                     FROM p4),
              ce AS (SELECT r, b,
                            CAST(round((1.0 - CASE b WHEN 4 THEN q4
                              WHEN 8 THEN q8 WHEN 16 THEN q16
                              ELSE q32 END) * 1000000) AS BIGINT)
                              AS catch_e6
                     FROM p5),
              agg AS (SELECT r, b, count(*) AS n_pairs,
                             (2 * sum(catch_e6) + count(*))
                               // (2 * count(*)) AS mean_recall_e6
                      FROM ce GROUP BY 1, 2),
              rkd AS (SELECT *, row_number() OVER (ORDER BY
                        CASE WHEN mean_recall_e6 >= 990000 THEN 0
                        ELSE 1 END, b * r, r, b) AS pick_rank
                      FROM agg)
         SELECT CAST(r AS BIGINT) AS r, CAST(b AS BIGINT) AS b,
                CAST(n_pairs AS BIGINT) AS n_pairs,
                CAST(mean_recall_e6 AS BIGINT) AS mean_recall_e6,
                mean_recall_e6 >= 990000 AS meets_99,
                CAST(pick_rank AS BIGINT) AS pick_rank,
                pick_rank = 1 AS chosen
         FROM rkd ORDER BY r, b""",

    // q465: same sentence split, ≥3-distinct-docs rule.
    "q465_boilerplate_sentences" ->
      """WITH sent AS (
           SELECT doc_id, source, trim(raw) AS sent
           FROM (SELECT doc_id, source,
                        unnest(regexp_split_to_array(text, '[.!?]'))
                          AS raw
                 FROM documents)
           WHERE len(trim(raw)) >= 20),
         sf AS (SELECT doc_id, source, sent,
                       CAST(len(sent) AS BIGINT) AS slen,
                       md5(sent) AS fp
                FROM sent),
         boiler AS (SELECT fp FROM (
                      SELECT fp, count(DISTINCT doc_id) AS ndocs
                      FROM sf GROUP BY 1) b
                    WHERE ndocs >= 3)
         SELECT source, CAST(count(*) AS BIGINT) AS n_sentences,
                CAST(sum(CASE WHEN boiler.fp IS NOT NULL THEN 1
                         ELSE 0 END) AS BIGINT) AS n_boiler,
                CAST(sum(slen) AS BIGINT) AS chars_total,
                CAST(sum(CASE WHEN boiler.fp IS NOT NULL THEN slen
                         ELSE 0 END) AS BIGINT) AS chars_boiler,
                CAST((2 * sum(CASE WHEN boiler.fp IS NOT NULL
                         THEN slen ELSE 0 END) * 10000 + sum(slen))
                     // (2 * sum(slen)) AS BIGINT) AS boiler_bp
         FROM sf LEFT JOIN boiler ON sf.fp = boiler.fp
         GROUP BY source ORDER BY source""",
  )
}
