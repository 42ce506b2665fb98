package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, batch feature extraction as a typed partition-local transform.
  *
  * The actual codecs (image/audio/video decode) are NOT in this container,
  * so `decodeStub` is a clearly-marked deterministic fake. Everything
  * Spark-side is real: binary column schema, mime routing, partition-
  * preserving mapPartitions (the Scala analog of Python's mapInPandas —
  * batched, executor-local, no shuffle), and downstream columnar stats.
  * Swapping in a real decoder changes only the body of `decodeStub`.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** Deterministic fake decode — STUB for the real codec. Derives fake
    * dimensions from leading payload bytes and a payload checksum; a real
    * implementation would parse the container format here. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    val b0 = if (b.length > 0) b(0) & 0xff else 0
    val b1 = if (b.length > 1) b(1) & 0xff else 0
    var sum = 0L
    var i = 0
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    val frames = if (r.mime.startsWith("video")) b.length / 64L + 1L else 1L
    MediaFeatures(r.doc_id, r.mime, b.length.toLong,
      1L + b0 % 64, 1L + b1 % 64, frames, sum % 9973L)
  }

  /** Synthesize a media table from the documents table: payload = UTF-8
    * bytes of the text standing in for encoded media; mime routed by id.
    * (Deterministic; exists because the sandbox ships no binary corpora.) */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
          .otherwise(lit("video/mp4")).as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Batched, partition-local feature extraction: one decoder instance per
    * partition (where a real codec would amortize init cost), rows streamed
    * through it — no shuffle, parallelism = input partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open(...) once per partition
      it.map(decodeStub)
    }
  }
}
