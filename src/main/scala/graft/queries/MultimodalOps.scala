package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.ld
import graft.operators.Multimodal

/** Multimodal-column queries: binary payloads (documents' text bytes stand
  * in for image blobs), metadata decode via mapPartitions, and frame
  * sampling via byte-range slicing — all with deterministic stub decoders
  * so the DuckDB oracle can replay them (see operators/Multimodal.scala).
  */
object MultimodalOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_media_meta" -> ((s, d) => {
      import s.implicits._
      val payloads = ld(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
      Multimodal.decodeMeta(payloads).orderBy("doc_id")
    }),

    // Frame sampling: up to 10 fixed-stride 64-char "frames" per document,
    // fingerprinted. explode(sequence) keeps it one codegen stage, no UDF.
    // Slicing is by *characters* on both sides (md5 hashes the UTF-8 bytes of
    // the slice in Spark and DuckDB alike), and the frame count uses
    // floor((n_chars-1)/64) so an empty doc yields zero frames in both
    // engines (Spark `div` truncates toward zero; DuckDB `//` floors).
    "q81_frame_sample" -> ((s, d) =>
      ld(s, d, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .withColumn("frame_idx", explode(sequence(lit(0L), lit(9L))))
        .filter(col("frame_idx") <= floor((col("n_chars") - 1) / lit(64.0)))
        .select(col("doc_id"), col("frame_idx"),
          expr("md5(substring(text, cast(frame_idx * 64 + 1 AS int), 64))")
            .as("frame_md5"))
        .orderBy("doc_id", "frame_idx")),
  )

  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Feature extraction over binary payloads (stub featurizer = byte
    // histogram; see operators/Multimodal.scala). Embarrassingly parallel,
    // one featurizer per partition — the batch shape a real embedding
    // model call would use.
    "q83_feature_extract" -> ((s, d) => {
      import s.implicits._
      val payloads = ld(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
        .as[(Long, Array[Byte])]
      Multimodal.extractFeatures(payloads).orderBy("doc_id")
    }),

    // "Resize" for 1-D payloads: 4:1 downsample keeping the first unit of
    // each stride (regex: swallow up to 3 following chars per kept char) +
    // fingerprint. A real image resize has identical plumbing: pure
    // per-row projection, no shuffle, linear at any scale.
    "q84_resize" -> ((s, d) =>
      ld(s, d, "documents")
        .withColumn("resized",
          regexp_replace(col("text"), "(.)(.{0,3})", "$1"))
        .select(col("doc_id"), col("n_chars"),
          length(col("resized")).as("resized_len"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id")),
  )

  private def bin(b: Int): String =
    s"len(list_filter(range(1, length(text)+1), i -> unicode(text[i]) % 8 = $b)) AS f$b"

  val oracle: Map[String, String] = Map(
    "q84_resize" ->
      """SELECT doc_id, n_chars,
                CAST(length(regexp_replace(text, '(.)(.{0,3})', '\1', 'g')) AS INTEGER) AS resized_len,
                md5(regexp_replace(text, '(.)(.{0,3})', '\1', 'g')) AS resized_md5
         FROM documents ORDER BY doc_id""",
    "q83_feature_extract" ->
      s"""SELECT doc_id, ${(0 until 8).map(bin).mkString(", ")}
          FROM documents ORDER BY doc_id""",
    "q80_media_meta" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                CAST(64 + octet_length(encode(text)) % 960 AS INTEGER) AS width,
                CAST(64 + (octet_length(encode(text)) * 7) % 536 AS INTEGER) AS height,
                CASE octet_length(encode(text)) % 3
                  WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
         FROM documents ORDER BY doc_id""",
    "q81_frame_sample" ->
      """SELECT doc_id, frame_idx,
                md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_md5
         FROM documents CROSS JOIN range(0, 10) t(frame_idx)
         WHERE frame_idx <= floor((n_chars - 1) / 64.0)
         ORDER BY doc_id, frame_idx""",
  )
}
