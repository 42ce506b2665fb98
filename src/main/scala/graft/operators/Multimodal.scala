package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, batch feature extraction as a typed partition-local transform.
  *
  * Image decode is REAL: `javax.imageio` ships with the JDK (PNG/JPEG/GIF/
  * BMP), so image payloads are parsed for their actual pixel dimensions —
  * no external jars, no stub. Audio container parsing is REAL too:
  * `javax.sound.sampled.AudioSystem` (also pure JDK, no audio device
  * needed) reads the RIFF/WAVE header for the actual sample rate and frame
  * count. Video codecs are genuinely absent in this container, so ONLY that
  * mime family goes through `decodeStub`, a clearly-marked deterministic
  * fake; swapping in a real decoder changes only that function. Everything
  * Spark-side is real either way: binary column schema, mime routing,
  * partition-preserving mapPartitions (the Scala analog of Python's
  * mapInPandas — batched, executor-local, no shuffle), and downstream
  * columnar stats.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** width/height are image-only (0 elsewhere); sample_rate/duration_ms are
    * audio-only (0 elsewhere); n_frames = 1 for images, PCM frame count for
    * audio, container frame count for video. */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      sample_rate: Long,
      duration_ms: Long,
      checksum: Long)

  private def payloadChecksum(b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
    sum % 9973L
  }

  /** Deterministic fake decode — STUB for the VIDEO codecs this container
    * lacks (images and WAV audio are parsed for real). Derives fake
    * dimensions from leading payload bytes and a payload checksum; a real
    * implementation would parse the container format here. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.payload
    val b0 = if (b.length > 0) b(0) & 0xff else 0
    val b1 = if (b.length > 1) b(1) & 0xff else 0
    val frames = if (r.mime.startsWith("video")) b.length / 64L + 1L else 1L
    MediaFeatures(r.doc_id, r.mime, b.length.toLong,
      1L + b0 % 64, 1L + b1 % 64, frames, 0L, 0L, payloadChecksum(b))
  }

  /** Decode one record: REAL ImageIO parse for image mimes (actual pixel
    * width/height from the container bytes), REAL AudioSystem parse for
    * audio mimes (actual sample rate + PCM frame count from the RIFF/WAVE
    * header; duration_ms = frames * 1000 / rate, integer floor). Both fail
    * LOUD on undecodable payloads — corrupt media must not yield plausible
    * fake metadata. Only video still routes through `decodeStub`. */
  def decode(r: MediaRecord): MediaFeatures =
    if (r.mime.startsWith("image/")) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable ${r.mime} payload for doc ${r.doc_id}")
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        img.getWidth.toLong, img.getHeight.toLong, 1L, 0L, 0L, payloadChecksum(r.payload))
    } else if (r.mime.startsWith("audio/")) {
      val in = try {
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
      } catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable ${r.mime} payload for doc ${r.doc_id}: ${e.getMessage}")
      }
      try {
        val rate = in.getFormat.getSampleRate.toLong
        val frames = in.getFrameLength
        require(rate > 0 && frames >= 0,
          s"undecodable ${r.mime} header for doc ${r.doc_id}")
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
          0L, 0L, frames, rate, frames * 1000L / rate, payloadChecksum(r.payload))
      } finally in.close()
    } else decodeStub(r)

  /** Deterministic PNG synthesis (BufferedImage + ImageIO.write): pixel
    * values are a cheap hash of (x, y, seed) so payloads differ per doc.
    * Fixture-side only — exists because the sandbox ships no binary image
    * corpora; the decode path treats the bytes as an opaque container. */
  def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 31L + y * 17L + seed * 1000003L) & 0xffffffL
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic canonical RIFF/WAVE synthesis: 44-byte PCM header
    * (mono, 16-bit little-endian) + `nSamples` samples whose values are a
    * cheap hash of (index, seed). Fixture-side only, same rationale as
    * `pngBytes`; `decode` treats the result as an opaque container the JDK
    * WAV reader must parse. */
  def wavBytes(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort(((i * 2654435761L + seed * 40503L) & 0xffffL).toShort)
      i += 1
    }
    bb.array()
  }

  /** Synthesize a media table from the documents table: mime routed by id;
    * `image/png` rows carry REAL PNG bytes whose pixel dimensions derive
    * from the text's first two UTF-8 bytes (1 + b % 64), and `audio/wav`
    * rows carry REAL RIFF/WAVE bytes whose sample rate (8000 + b0%64 * 250)
    * and frame count ((b1%64 + 1) * 100) derive from the same two bytes —
    * the formulas the DuckDB oracle twin computes from the text column,
    * closing the loop decode-side: ImageIO / AudioSystem must recover
    * exactly those values from the container bytes. Video payloads remain
    * the UTF-8 text bytes standing in for encoded media (the one remaining
    * stub family). Deterministic throughout. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def textBytes(text: String): (Int, Int) = {
      val b = (if (text == null) "" else text).getBytes("UTF-8")
      (if (b.length > 0) b(0) & 0xff else 0, if (b.length > 1) b(1) & 0xff else 0)
    }
    val png = udf { (docId: Long, text: String) =>
      val (b0, b1) = textBytes(text)
      pngBytes(1 + b0 % 64, 1 + b1 % 64, docId)
    }
    val wav = udf { (docId: Long, text: String) =>
      val (b0, b1) = textBytes(text)
      wavBytes(8000 + (b0 % 64) * 250, (b1 % 64 + 1) * 100, docId)
    }
    docs.select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("image/png"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("audio/wav"))
          .otherwise(lit("video/mp4")).as("mime"),
        col("text"))
      .select(col("doc_id"), col("mime"),
        when(col("mime") === "image/png", png(col("doc_id"), col("text")))
          .when(col("mime") === "audio/wav", wav(col("doc_id"), col("text")))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      .as[MediaRecord]
  }

  final case class ResizedFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      new_width: Long,
      new_height: Long,
      n_bytes: Long)

  /** Integer fit-within-box target dims (aspect preserved): unchanged when
    * max(w,h) <= maxDim, else floor(d * maxDim / max(w,h)) clamped to >= 1.
    * Pure integer arithmetic so the DuckDB twin computes the identical
    * targets — the engine must then RECOVER exactly these dims by decoding
    * its own resized payload. */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** REAL image resize: ImageIO decode -> Graphics2D bilinear scale to the
    * fitDims target -> PNG re-encode -> decode AGAIN to report the actual
    * dims of the new payload (the round-trip is the verification: a resize
    * that silently wrote the wrong raster would surface here, not
    * downstream). Non-image mimes pass through unchanged. */
  def resize(r: MediaRecord, maxDim: Int): ResizedFeatures =
    if (r.mime.startsWith("image/")) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      require(img != null, s"undecodable ${r.mime} payload for doc ${r.doc_id}")
      val (tw, th) = fitDims(img.getWidth, img.getHeight, maxDim)
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, tw, th, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      val bytes = bos.toByteArray
      val check = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      ResizedFeatures(r.doc_id, img.getWidth.toLong, img.getHeight.toLong,
        check.getWidth.toLong, check.getHeight.toLong, bytes.length.toLong)
    } else ResizedFeatures(r.doc_id, 0L, 0L, 0L, 0L, r.payload.length.toLong)

  /** Partition-local batch resize over image rows. */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.mime.startsWith("image/")).mapPartitions(_.map(resize(_, maxDim)))
  }

  final case class SampledFrame(doc_id: Long, frame_idx: Long, n_bytes: Long, checksum: Long)

  /** Frame sampling for (stubbed) video payloads: the payload is treated as
    * fixed-size frames of `frameBytes`; every `stride`-th frame is emitted
    * with its size and checksum — the decimation a video pipeline runs
    * before feature extraction. Partition-local flatMap, no shuffle; frame
    * selection and sizes are pure arithmetic over the payload length (the
    * SQL-gateable structure), the checksum pins the bytes in specs. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.mime.startsWith("video/")).flatMap { r =>
      val n = r.payload.length
      val nFrames = (n + frameBytes - 1) / frameBytes
      (0 until nFrames by stride).iterator.map { f =>
        val from = f * frameBytes
        val len = math.min(frameBytes, n - from)
        var sum = 0L
        var i = from
        while (i < from + len) { sum += (r.payload(i) & 0xff); i += 1 }
        SampledFrame(r.doc_id, f.toLong, len.toLong, sum % 9973L)
      }
    }
  }

  /** Batched, partition-local feature extraction: decoder state amortizes
    * per partition (ImageIO reader caches; a real AV codec would open
    * here), rows streamed through it — no shuffle, parallelism = input
    * partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one decoder scope per partition (ImageIO here; Codec.open for AV)
      it.map(decode)
    }
  }
}
