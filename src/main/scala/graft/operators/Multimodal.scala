package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata extracted by a per-partition decoder.
  *
  * The actual codec is STUBBED (no image/audio libs in this container):
  * `decodeStub` derives deterministic fake dimensions from the payload
  * bytes. Everything around it — binary column schema, typed Dataset
  * plumbing, per-partition decoder lifecycle, batch shape — is real: swap
  * `decodeStub` for an actual codec call and the pipeline is production
  * shaped. At scale the decode is embarrassingly parallel, one decoder
  * instance per partition (codec init amortized across its rows).
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       format: String)

  /** STUB — stands in for e.g. an ImageIO/ffmpeg probe. Deterministic
    * function of the payload so tests and the SQL oracle can replay it. */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val n = payload.length
    val formats = Vector("jpeg", "png", "webp")
    (64 + n % 960, 64 + (n * 7) % 536, formats(n % 3))
  }

  /** (doc_id, payload: binary) → typed metadata via mapPartitions. */
  def decodeMeta(input: Dataset[(Long, Array[Byte])]): DataFrame = {
    import input.sparkSession.implicits._
    input.mapPartitions { it =>
      // one decoder per partition: real codecs are expensive to init
      it.map { case (id, bytes) =>
        val (w, h, f) = decodeStub(bytes)
        MediaMeta(id, bytes.length, w, h, f)
      }
    }.toDF()
  }

  case class MediaFeatures(doc_id: Long, f0: Long, f1: Long, f2: Long,
                           f3: Long, f4: Long, f5: Long, f6: Long, f7: Long)

  /** STUB featurizer — stands in for an image/audio embedding model: an
    * 8-bin histogram of payload bytes mod 8 (deterministic, so the DuckDB
    * oracle can replay it on ASCII payloads where byte == codepoint). */
  def featureStub(payload: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](8)
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xff) % 8) += 1; i += 1 }
    bins
  }

  /** (doc_id, payload: binary) → fixed-dim feature row via mapPartitions —
    * the same per-partition-featurizer lifecycle as decodeMeta: swap
    * `featureStub` for a real model call (batched per partition) and the
    * plumbing is production shaped. */
  def extractFeatures(input: Dataset[(Long, Array[Byte])]): DataFrame = {
    import input.sparkSession.implicits._
    input.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = featureStub(bytes)
        MediaFeatures(id, b(0), b(1), b(2), b(3), b(4), b(5), b(6), b(7))
      }
    }.toDF()
  }
}
