package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, batch feature extraction as a typed partition-local transform.
  *
  * Container/metadata parsing is REAL for all three mime families, pure
  * JDK: `javax.imageio` (PNG/JPEG/GIF/BMP pixel dims), `javax.sound.
  * sampled.AudioSystem` (RIFF/WAVE sample rate + frame count; no audio
  * device needed), and an ISO-BMFF box walker (MP4 tkhd dims, mvhd
  * duration, stsz sample table — `parseMp4`). The ONLY absent layer is
  * frame PIXEL/SAMPLE codecs (H.264/AAC — genuinely not in this
  * container's JDK), which no reported feature depends on; a real codec
  * would slot in where the sample table already yields per-frame byte
  * ranges. Everything Spark-side is real: binary column schema, mime
  * routing, partition-preserving mapPartitions (the Scala analog of
  * Python's mapInPandas — batched, executor-local, no shuffle), and
  * downstream columnar stats.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — every read/write spins
  // up a temp file even for these small in-memory byte arrays, so the codec
  // paths paid a filesystem round-trip per row. Keep the cache in memory
  // (JVM-global; the object initializes on driver and executors alike, and
  // decoded/encoded bytes are identical either way).
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---------------------------------------------------------- ISO-BMFF (MP4)
  // Minimal but REAL container structure, pure JVM: the fixture writes an
  // actual box tree (ftyp + moov{mvhd, trak{tkhd, mdia{minf{stbl{stsz}}}}}
  // + mdat) and the decoder recovers dims/duration/sample-table by walking
  // it — big-endian (size, type) box headers, 16.16 fixed-point tkhd dims,
  // mvhd timescale/duration, per-sample byte sizes from stsz. What remains
  // absent is only the frame PIXEL codec (H.264 etc. — genuinely not in
  // this container's JDK), which no reported feature depends on.

  final case class Mp4Meta(
      timescale: Long, duration: Long, width: Long, height: Long,
      sampleSizes: Array[Int], mdatOffset: Int, mdatLen: Int)

  private def asciiBytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def bmffBox(tp: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(len).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(len).put(asciiBytes(tp))
    payload.foreach(bb.put)
    bb.array()
  }

  /** Deterministic minimal MP4: `content` becomes the mdat payload split
    * into `frameBytes`-sized samples (last = remainder) recorded in a real
    * stsz sample table; mvhd duration = nSamples * msPerFrame at timescale
    * 1000; tkhd carries the pixel dims. Fixture-side only (pngBytes /
    * wavBytes rationale); `decode`/`sampleFrames` treat it as an opaque
    * container to parse. */
  def mp4Bytes(width: Int, height: Int, content: Array[Byte],
               frameBytes: Int = 64, msPerFrame: Int = 33): Array[Byte] = {
    val nFrames = (content.length + frameBytes - 1) / frameBytes
    def be(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0)                      // version/flags
      bb.putInt(0).putInt(0)            // ctime, mtime
      bb.putInt(1000)                   // timescale
      bb.putInt(nFrames * msPerFrame)   // duration
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
      bb.putInt(0).putInt(0)            // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000) // unity matrix
        .foreach(bb.putInt)
      (1 to 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2)                      // next_track_id
      bb.array()
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0x00000007)             // version 0, flags: enabled|in-movie|in-preview
      bb.putInt(0).putInt(0)            // ctime, mtime
      bb.putInt(1).putInt(0)            // track_id, reserved
      bb.putInt(nFrames * msPerFrame)   // duration
      bb.putInt(0).putInt(0)            // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer, altgroup, volume, reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.putInt(width << 16).putInt(height << 16) // 16.16 fixed-point
      bb.array()
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12 + 4 * nFrames)
      bb.putInt(0)        // version/flags
      bb.putInt(0)        // sample_size 0 => per-sample table follows
      bb.putInt(nFrames)
      var i = 0
      while (i < nFrames) {
        bb.putInt(math.min(frameBytes, content.length - i * frameBytes))
        i += 1
      }
      bb.array()
    }
    val moov = bmffBox("moov", bmffBox("mvhd", mvhd),
      bmffBox("trak", bmffBox("tkhd", tkhd),
        bmffBox("mdia", bmffBox("minf", bmffBox("stbl", bmffBox("stsz", stsz))))))
    val ftyp = bmffBox("ftyp", asciiBytes("isom"), be(0), asciiBytes("isom"))
    ftyp ++ moov ++ bmffBox("mdat", content)
  }

  /** Walk the box tree (recursing into container boxes) and collect the
    * movie header, track dims, sample table and mdat extent. Fails LOUD on
    * truncated/malformed structure. */
  def parseMp4(payload: Array[Byte]): Mp4Meta = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var timescale = -1L; var duration = -1L
    var width = -1L; var height = -1L
    var sizes: Array[Int] = null
    var mdatOff = -1; var mdatLen = -1
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.BIG_ENDIAN)
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off < to) {
        require(off + 8 <= to, s"truncated box header at $off")
        val len = bb.getInt(off)
        val tp = new String(payload, off + 4, 4, "US-ASCII")
        require(len >= 8 && off + len <= to, s"bad box '$tp' length $len at $off")
        tp match {
          case t if containers(t) => walk(off + 8, off + len)
          case "mvhd" =>
            // version flips the field widths: v0 packs 32-bit times
            // (timescale at body offset 12), v1 64-bit times (timescale at
            // 20, 64-bit duration at 24). Reading v1 with v0 offsets would
            // return the low half of modification_time as a plausible
            // timescale — misparse must fail loud or parse right, never
            // fake metadata.
            val ver = payload(off + 8) & 0xff
            require(ver <= 1, s"unsupported mvhd version $ver")
            if (ver == 0) {
              require(len - 8 >= 20, s"mvhd v0 body too short (${len - 8})")
              timescale = bb.getInt(off + 8 + 12).toLong & 0xffffffffL
              duration = bb.getInt(off + 8 + 16).toLong & 0xffffffffL
            } else {
              require(len - 8 >= 32, s"mvhd v1 body too short (${len - 8})")
              timescale = bb.getInt(off + 8 + 20).toLong & 0xffffffffL
              duration = bb.getLong(off + 8 + 24)
            }
          case "tkhd" =>
            // dims are the LAST 8 bytes of the body in both v0 and v1
            // (64-bit times only shift the front), so tail-relative reads
            // are version-safe; still refuse unknown versions
            require((payload(off + 8) & 0xff) <= 1,
              s"unsupported tkhd version ${payload(off + 8) & 0xff}")
            width = (bb.getInt(off + len - 8) >>> 16).toLong
            height = (bb.getInt(off + len - 4) >>> 16).toLong
          case "stsz" =>
            val n = bb.getInt(off + 8 + 8)
            require(12 + 4 * n <= len - 8, s"stsz table overruns box")
            sizes = Array.tabulate(n)(i => bb.getInt(off + 8 + 12 + 4 * i))
          case "mdat" =>
            mdatOff = off + 8; mdatLen = len - 8
          case _ => // ftyp etc.: skip
        }
        off += len
      }
    }
    walk(0, payload.length)
    require(timescale > 0 && duration >= 0 && width >= 0 && height >= 0 &&
      sizes != null && mdatOff >= 0,
      "missing mvhd/tkhd/stsz/mdat in MP4 payload")
    require(sizes.map(_.toLong).sum == mdatLen.toLong,
      s"stsz total ${sizes.sum} != mdat length $mdatLen")
    Mp4Meta(timescale, duration, width, height, sizes, mdatOff, mdatLen)
  }

  /** Decode one record: REAL ImageIO parse for image mimes (actual pixel
    * width/height from the container bytes), REAL AudioSystem parse for
    * audio mimes (actual sample rate + PCM frame count from the RIFF/WAVE
    * header; duration_ms = frames * 1000 / rate, integer floor), REAL
    * ISO-BMFF box walk for video mimes (dims from tkhd, duration from
    * mvhd, frame count from the stsz sample table). All fail LOUD on
    * undecodable payloads — corrupt media must not yield plausible fake
    * metadata. */
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
    } else if (r.mime.startsWith("video/")) {
      val m = try parseMp4(r.payload) catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"undecodable ${r.mime} payload for doc ${r.doc_id}: ${e.getMessage}")
      }
      MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
        m.width, m.height, m.sampleSizes.length.toLong,
        0L, m.duration * 1000L / m.timescale, payloadChecksum(r.payload))
    } else throw new IllegalArgumentException(
      s"unsupported mime ${r.mime} for doc ${r.doc_id}")

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
    * and frame count ((b1%64 + 1) * 100) derive from the same two bytes,
    * and `video/mp4` rows carry a REAL ISO-BMFF box tree whose tkhd dims
    * reuse the image formulas, whose mdat holds the UTF-8 text bytes split
    * into a real stsz sample table of 64-byte frames, and whose mvhd
    * duration is frames × 33 ms — all formulas the DuckDB oracle twin
    * computes from the text column, closing the loop decode-side: ImageIO /
    * AudioSystem / the box walker must recover exactly those values from
    * the container bytes. Deterministic throughout. */
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
    val mp4 = udf { text: String =>
      val b = (if (text == null) "" else text).getBytes("UTF-8")
      val b0 = if (b.length > 0) b(0) & 0xff else 0
      val b1 = if (b.length > 1) b(1) & 0xff else 0
      mp4Bytes(1 + b0 % 64, 1 + b1 % 64, b)
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
          .otherwise(mp4(col("text"))).as("payload"))
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

  /** Frame sampling for video payloads: the REAL stsz sample table drives
    * decimation — every `stride`-th sample's byte range inside mdat is
    * emitted with its size and checksum, the pre-extraction step a video
    * pipeline runs. Partition-local flatMap, no shuffle; sample selection
    * and sizes come from the parsed container (SQL-gateable because the
    * fixture's table is 64-byte frames over the text bytes), checksums pin
    * the actual mdat bytes in specs. Malformed containers fail loud. */
  def sampleFrames(media: Dataset[MediaRecord],
                   stride: Int = 4): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.mime.startsWith("video/")).flatMap { r =>
      val m = parseMp4(r.payload)
      // per-sample offsets: running sum of the stsz sizes from mdat start
      val offsets = m.sampleSizes.scanLeft(m.mdatOffset)(_ + _)
      (0 until m.sampleSizes.length by stride).iterator.map { f =>
        val from = offsets(f)
        val len = m.sampleSizes(f)
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
