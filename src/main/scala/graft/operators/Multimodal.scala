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
}
