package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Word 3-gram shingles as a Spark SQL expression (0-based array index). */
  private val gramsSql =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
         transform(sequence(0, size(split(text, ' ')) - 3),
                   i -> concat(split(text, ' ')[i], ' ',
                               split(text, ' ')[i+1], ' ',
                               split(text, ' ')[i+2]))
       ELSE array() END"""

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
    "q43_lang_id" -> ((s, d) => {
      def occ(w: String): String = {
        val l = w.length
        s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$w', ''))) / $l"
      }
      ld(s, d, "documents")
        .selectExpr("doc_id", "lang",
          s"${occ(" the ")} + ${occ(" a ")} + ${occ(" of ")} AS s_en",
          s"${occ(" le ")} + ${occ(" la ")} + ${occ(" et ")} AS s_fr",
          s"${occ(" der ")} + ${occ(" die ")} + ${occ(" und ")} AS s_de",
          s"${occ(" el ")} + ${occ(" los ")} + ${occ(" y ")} AS s_es")
        .selectExpr("doc_id", "lang", "s_en", "s_fr", "s_de", "s_es",
          """CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                  WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                  WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang""")
        .selectExpr("doc_id", "lang", "s_en", "s_fr", "s_de", "s_es",
          "pred_lang", "pred_lang = lang AS correct")
        .orderBy("doc_id")
    }),

    // Content fingerprints: whole-doc digest prefix + min-shingle digest
    // (a 1-permutation MinHash — the degenerate but portable case).
    "q44_fingerprint" -> ((s, d) =>
      ld(s, d, "documents").selectExpr(
        "doc_id",
        "substr(md5(text), 1, 16) AS fp16",
        "substr(md5(text), 1, 2) AS band",
        s"""CASE WHEN size(split(text, ' ')) >= 3
              THEN array_min(transform($gramsSql, g -> md5(g)))
              ELSE NULL END AS min_gram_fp""")
        .orderBy("doc_id")),

    // Exact n-gram Jaccard between same-source doc pairs. Scale shape:
    // explode distinct shingles → shuffle keyed on (source, shingle) →
    // pair-count aggregation; never materializes the doc×doc product.
    "q45_ngram_jaccard" -> ((s, d) => {
      val docs = ld(s, d, "documents")
        .select(col("doc_id"), col("source"),
          array_distinct(expr(gramsSql)).as("grams"))
      val sh = docs.select(col("doc_id"), col("source"),
        explode(col("grams")).as("g"))
      val sizes = docs.select(col("doc_id"), size(col("grams")).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .select(col("da"), col("db"), col("n_inter"),
          round(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 4).as("jac"))
        .orderBy("da", "db")
    }),

    // MinHash + LSH near-dup candidates (token shingles, 16 hashes, 4 bands
    // of 4). Candidates come only from band-bucket joins — the 100 TB path:
    // shuffle keyed on (band_idx, band_val), cross product never formed.
    "q46_minhash_lsh" -> ((s, d) => {
      val sh = ld(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("g"))
      val minhashes = (0 until 16).map(j =>
        min(xxhash64(concat(lit(s"${j}_"), col("g")))).as(s"m$j"))
      val sig = sh.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
      val bands = sig.select(col("doc_id") +: (0 until 4).map(b =>
        xxhash64(col(s"m${4 * b}"), col(s"m${4 * b + 1}"),
          col(s"m${4 * b + 2}"), col(s"m${4 * b + 3}")).as(s"b$b")): _*)
      val buckets = bands.selectExpr("doc_id",
        "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, band_val)")
      val cand = buckets.as("x").join(buckets.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_val") === col("y.band_val") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
      val sa = sig.toDF(sig.columns.map(c => if (c == "doc_id") "da" else s"a_$c"): _*)
      val sb = sig.toDF(sig.columns.map(c => if (c == "doc_id") "db" else s"b_$c"): _*)
      val est = (0 until 16).map(j =>
        when(col(s"a_m$j") === col(s"b_m$j"), 1).otherwise(0)).reduce(_ + _)
      cand.join(sa, "da").join(sb, "db")
        .select(col("da"), col("db"),
          round(est.cast("double") / 16.0, 4).as("est_jac"))
        .orderBy("da", "db")
    }),

    // SimHash (32-bit, token-frequency weighted via duplicate tokens).
    "q47_simhash" -> ((s, d) => {
      val toks = ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("h", xxhash64(col("t")))
      val votes = (0 until 32).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"v$b"))
      val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      val sim = (0 until 32).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
      agg.select(col("doc_id"), sim.as("simhash")).orderBy("doc_id")
    }),

    // SimHash near-dup pairs by Hamming distance. Brute pairwise here (500
    // docs); the scale path is banding the 32 bits into 4 chunks and joining
    // on exact chunk match (Hamming<=3 ⇒ at least one chunk equal).
    "q48_simhash_neardup" -> ((s, d) => {
      val toks = ld(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .withColumn("h", xxhash64(col("t")))
      val votes = (0 until 32).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"v$b"))
      val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      val simExpr = (0 until 32).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L)).reduce(_ + _)
      val sim = agg.select(col("doc_id"), simExpr.as("simhash"))
      sim.as("a").join(sim.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy("da", "db")
    }),
  )

  /** DuckDB-1.0 equivalents. 1-based list indexing; len() casts where DuckDB
    * returns BIGINT and Spark INT. */
  private val duckGrams =
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

  val oracle: Map[String, String] = Map(
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
                 round(n_inter / (sa.n + sb.n - n_inter), 4) AS jac
          FROM inter JOIN sizes sa ON da = sa.doc_id
                     JOIN sizes sb ON db = sb.doc_id
          ORDER BY da, db""",
  )
}
