package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata structs.
  *
  * Image METADATA decode is REAL: [[decode]] reads actual container
  * headers through the JDK's built-in `javax.imageio` (PNG/JPEG/GIF/
  * BMP/TIFF/WBMP — header-only, no pixel decompression), and
  * [[imageHeaderMeta]] does the same for PNG/GIF/BMP with pure column
  * expressions (whole-stage codegen, zero JVM objects per row). Blobs
  * no reader recognizes fall back to [[stubDecode]]'s deterministic
  * digest-derived fake so pipelines stay total.
  *
  * Pixel-level ops are REAL wherever a bare JVM has the codec:
  * [[resize]] and [[extractFeatures]] decode + bilinear-scale
  * PNG/JPEG/GIF/TIFF via `javax.imageio`; [[decodeAudioMeta]] and
  * [[sampleFrames]] parse WAV/AIFF/AU via `javax.sound.sampled`;
  * MJPEG/AVI video is demuxed by the pure-JVM [[AviMjpeg]] RIFF parser
  * and its frames JPEG-decoded to rasters via `javax.imageio`.
  * Only payloads with genuinely absent codecs (H.264, MP3/OGG) take
  * the deterministic-fake path, flagged `decoded = false`, with the
  * identical Dataset shape (the typed `map`/`flatMap` here is Scala's
  * analogue of a Pandas-UDF `mapInPandas` batch transform), so a real
  * codec drops in per-container without touching any plan.
  */
object Multimodal {

  /** Decoded-media metadata produced per blob. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, content_md5: String,
      width: Int, height: Int, format: String)

  /** Deterministic fake decode for unrecognized containers: dimensions
    * derived from digest bytes (keeps pipelines total and results
    * reproducible on non-image payloads). */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    MediaMeta(
      doc_id = docId,
      byte_len = bytes.length.toLong,
      content_md5 = hex(d),
      width = 64 + (d(0) & 0x7f),
      height = 64 + (d(1) & 0x7f),
      format = if ((d(2) & 1) == 0) "png" else "jpeg")
  }

  /** Formats the real decoder trusts on HEADER parse alone: their
    * magics contain non-printable bytes, so a text payload can never
    * collide. javax.imageio's BMP ("BM" — two ASCII chars) and WBMP
    * (no magic at all) readers claim arbitrary byte streams and would
    * make results payload-dependent. GIF's magic ("GIF87a"/"GIF89a")
    * is SIX PRINTABLE chars — a text document ABOUT the GIF format can
    * start with it — so GIF is trusted only after a FULL frame decode
    * succeeds (garbage after a colliding prefix throws; real GIFs are
    * small, so the extra decompression is noise). */
  private val trustedFormats = Set("png", "jpeg", "jpg", "tiff", "tif")

  /** REAL image-metadata decode via the JDK's javax.imageio: the
    * matching reader parses the container header (`getWidth(0)` /
    * `getHeight(0)` — header fields only, pixels are never
    * decompressed, so this runs at IO speed). Unrecognized payloads,
    * weak-magic reader claims, and parse failures fall back to
    * [[stubDecode]] so the pipeline stays total and deterministic. */
  def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    // video first: RIFF/AVI has a strong 12-byte magic and imageio
    // readers would never claim it — dims come from the avih header
    AviMjpeg.parseInfo(bytes).foreach { info =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      return MediaMeta(docId, bytes.length.toLong,
        d.map("%02x".format(_)).mkString, info.width, info.height, "avi")
    }
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // a stripped JDK can have no ImageInputStreamSpi: null must take
    // the stub path, not throw out of getImageReaders — the scaladoc
    // promises totality
    if (in == null) return stubDecode(docId, bytes)
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (readers.hasNext) {
        val r = readers.next()
        try {
          val fmt = r.getFormatName.toLowerCase
          if (trustedFormats(fmt) || fmt == "gif") {
            r.setInput(in)
            // printable-magic formats must PROVE themselves: a full
            // frame decode of text-after-"GIF89a" garbage throws and
            // falls back to the stub (header-only getWidth would
            // happily return garbage dims)
            if (fmt == "gif") r.read(0)
            val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
            MediaMeta(docId, bytes.length.toLong,
              d.map("%02x".format(_)).mkString,
              r.getWidth(0), r.getHeight(0),
              if (fmt == "jpg") "jpeg" else if (fmt == "tif") "tiff" else fmt)
          } else stubDecode(docId, bytes)
        } catch {
          case scala.util.control.NonFatal(_) => stubDecode(docId, bytes)
        } finally r.dispose()
      } else stubDecode(docId, bytes)
    } finally if (in != null) in.close()
  }

  /** Spread a blob frame across the cluster ONLY when it arrives
    * under-partitioned (a compact source read as few splits). Blobs are
    * the payload — shuffling an already well-spread multi-GB table
    * would move every byte for nothing. */
  private def spread(blobs: DataFrame, idCol: String): DataFrame = {
    val parallelism = blobs.sparkSession.sparkContext.defaultParallelism
    // explicit count: repartition(col) alone uses
    // spark.sql.shuffle.partitions, which can be BELOW parallelism —
    // paying the shuffle without achieving the spread
    if (blobs.rdd.getNumPartitions < parallelism)
      blobs.repartition(parallelism, col(idCol))
    else blobs
  }

  /** Batch decode over a (doc_id, blob) frame: partition-wise (no
    * shuffle when the input is already spread); each partition's rows
    * stream through the REAL header decoder ([[decode]]). */
  def decodeMeta(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): Dataset[MediaMeta] = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    pairs.mapPartitions { it =>
      it.map(r => decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.product[MediaMeta])
  }

  /** Image-container header decode as PURE COLUMN EXPRESSIONS — no UDF,
    * no per-row JVM objects, whole-stage codegen over the binary
    * column: PNG IHDR (big-endian u32 dims at offset 17/21), GIF screen
    * descriptor (little-endian u16 at 7/9), BMP info header
    * (little-endian u32 at 19/23). Unknown containers → format
    * 'unknown', null dims. The scan-speed path for bulk corpus audits;
    * [[decodeMeta]] covers the wider format set via javax.imageio. */
  def imageHeaderMeta(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    def byteAt(pos: Int) =
      conv(hex(substring(col(blobCol), pos, 1)), 16, 10).cast("long")
    def beU32(pos: Int) =
      conv(hex(substring(col(blobCol), pos, 4)), 16, 10).cast("long")
    def leU16(pos: Int) = byteAt(pos) + byteAt(pos + 1) * 256
    def leU32(pos: Int) = byteAt(pos) + byteAt(pos + 1) * 256 +
      byteAt(pos + 2) * 65536 + byteAt(pos + 3) * 16777216
    val isPng = hex(substring(col(blobCol), 1, 8)) === "89504E470D0A1A0A"
    val isGif = hex(substring(col(blobCol), 1, 6))
      .isin("474946383761", "474946383961")
    val isBmp = hex(substring(col(blobCol), 1, 2)) === "424D"
    blobs.select(
      col(idCol),
      length(col(blobCol)).cast("long").as("byte_len"),
      md5(col(blobCol)).as("content_md5"),
      when(isPng, "png").when(isGif, "gif").when(isBmp, "bmp")
        .otherwise("unknown").as("format"),
      when(isPng, beU32(17)).when(isGif, leU16(7)).when(isBmp, leU32(19)).as("width"),
      when(isPng, beU32(21)).when(isGif, leU16(9))
        // BITMAPINFOHEADER biHeight is SIGNED — negative means a
        // top-down bitmap; report the magnitude, not a ~4.3e9 u32
        .when(isBmp, {
          val raw = leU32(23)
          when(raw > 2147483647L, lit(4294967296L) - raw).otherwise(raw)
        }).as("height"))
  }

  /** REAL codec-free feature extraction: integer byte-distribution
    * statistics from one [[graft.functions.ByteHistogram]] pass —
    * content-type and quality signals (printable ratio, byte
    * diversity, modal byte) that need no image/audio library, the
    * standard first-stage features for binary dedup and corpus
    * triage. All outputs are integers (ratios scaled by 10⁶ +
    * floored), so results are bit-exact across engines. */
  def byteFeatures(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val hist = graft.functions.ByteHistogram(col(blobCol))
    // printable ASCII = byte values 32..126 → 1-based slice(33, 95)
    val printable = aggregate(slice(col("hist"), 33, 95), lit(0L), (a, x) => a + x)
    blobs.select(col(idCol), length(col(blobCol)).cast("long").as("n_bytes"),
        hist.as("hist"))
      .select(
        col(idCol),
        col("n_bytes"),
        size(filter(col("hist"), x => x > 0)).cast("long").as("n_distinct_bytes"),
        (array_position(col("hist"), array_max(col("hist"))) - 1).as("mode_byte"),
        array_max(col("hist")).as("mode_count"),
        when(col("n_bytes") === 0, lit(0L))
          .otherwise(floor(printable * lit(1000000.0) / col("n_bytes")).cast("long"))
          .as("ascii_ratio_scaled"))
  }

  /** Full pixel decode through a TRUSTED reader only (same magic
    * discipline as [[decode]]): the JDK's PNG/JPEG/GIF/TIFF readers.
    * None for unrecognized payloads or parse failures — callers fall
    * back to their deterministic stub path so pipelines stay total. */
  private def readTrustedImage(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (in == null) return None // no ImageInputStreamSpi: total, not a throw
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          // gif is admitted here because this path FULLY decodes — the
          // read(0) below IS the proof a printable-magic collision
          // cannot fake (garbage after "GIF89a" throws → None)
          val fmt = reader.getFormatName.toLowerCase
          if (!(trustedFormats(fmt) || fmt == "gif")) None
          else {
            reader.setInput(in)
            Option(reader.read(0))
          }
        } catch { case _: Exception => None } finally reader.dispose()
      }
    } finally if (in != null) in.close()
  }

  /** Bilinear-scale an image to (w, h) RGB via the JDK's Graphics2D —
    * deterministic for a given JDK. */
  private def scaleImage(img: java.awt.image.BufferedImage,
      w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Feature extraction: blob → fixed-width float embedding in [-1, 1].
    *
    * REAL for JDK-decodable images: the pixels are decoded, bilinear-
    * pooled onto a `dim`-pixel strip, and each feature is that pixel's
    * ITU-R 601 luminance mapped to [-1, 1] — an actual (if simple)
    * visual descriptor: near-duplicate images land near each other in
    * cosine space. Non-image payloads keep the deterministic
    * md5-expanded fake, standing in for a LEARNED encoder (CLIP-style
    * — that genuinely needs a model runtime); the codec-free REAL
    * byte-level extractor is [[byteFeatures]]. A learned encoder drops
    * in with the same (blobs → Dataset) shape and the same
    * partition-preserving parallelism. */
  def extractFeatures(blobs: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.types.StructField("decoded",
        org.apache.spark.sql.types.BooleanType)))
    pairs.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      readTrustedImage(bytes) match {
        case Some(img) =>
          val strip = scaleImage(img, dim, 1)
          val feats = (0 until dim).map { x =>
            val rgb = strip.getRGB(x, 0)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            (lum / 255.0 * 2.0 - 1.0).toFloat
          }
          Row(r.getLong(0), feats, true)
        case None =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val feats = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            md.reset(); md.update(bytes); md.update(i.toByte)
            val d = md.digest()
            feats(i) = ((d(0) & 0xff) - 128) / 128.0f
            i += 1
          }
          Row(r.getLong(0), feats.toSeq, false)
      }
    }(Encoders.row(schema))
  }

  /** Resize: blob → (blob', width', height', decoded).
    *
    * REAL for JDK-decodable images: pixels are decoded, bilinear-
    * scaled to the target box, and re-encoded as PNG (the JDK writer
    * is deterministic — no timestamps/ancillary chunks). Unrecognized
    * payloads keep the deterministic byte-prefix fake (`decoded =
    * false`) so mixed corpora flow through without a partial failure
    * path. */
  def resize(blobs: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("blob", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("width", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("height", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("decoded",
        org.apache.spark.sql.types.BooleanType)))
    pairs.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      readTrustedImage(bytes) match {
        case Some(img) =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaleImage(img, targetW, targetH), "png", bos)
          Row(r.getLong(0), bos.toByteArray, targetW, targetH, true)
        case None =>
          val keep = math.max(1, math.min(bytes.length, targetW * targetH / 64))
          Row(r.getLong(0), bytes.take(keep), targetW, targetH, false)
      }
    }(Encoders.row(schema))
  }

  /** Audio metadata decode — REAL for the JDK's built-in containers
    * (WAV/AIFF/AU via javax.sound.sampled, header-only): sample rate,
    * channels, bit depth, frame count, duration. Payloads no parser
    * recognizes (MP3/OGG — genuinely absent codecs) get a null-field
    * row with `decoded = false`. */
  def decodeAudioMeta(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType),
      StructField("decoded", BooleanType)))
    pairs.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val frames = in.getFrameLength
          val durMs =
            if (frames >= 0 && f.getFrameRate > 0)
              (frames * 1000.0 / f.getFrameRate).toLong
            else -1L
          Row(r.getLong(0), f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, frames, durMs, true)
        } finally in.close()
      } catch { case _: Exception =>
        Row(r.getLong(0), null, null, null, null, null, false)
      }
    }(Encoders.row(schema))
  }

  /** PCM sample statistics — a REAL sample-stream decode (the audio
    * twin of the image paths' pixel decode): `javax.sound.sampled`
    * opens the container, the 16-bit signed PCM stream is read in
    * full, and integer-exact statistics come off the decoded samples —
    * count, peak, min, sum of absolute values, and the number of
    * DESCENTS (sample strictly below its predecessor; on a sawtooth
    * that counts the wraparounds, so the oracle checks genuine
    * sample-order decoding, not just totals). Containers the JDK
    * cannot decode to 16-bit PCM (MP3/OGG — genuinely absent codecs)
    * or with other sample widths report a null-field row with
    * `decoded = false`. Partition-wise map, no shuffle; one pass per
    * blob, O(1) state. */
  def pcmSampleStats(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("peak", LongType),
      StructField("min_sample", LongType),
      StructField("sum_abs", LongType),
      StructField("n_descents", LongType),
      StructField("decoded", BooleanType)))
    pairs.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
              f.getEncoding !=
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            Row(r.getLong(0), null, null, null, null, null, false)
          else {
            val big = f.isBigEndian
            var n = 0L; var peak = Long.MinValue; var lo = Long.MaxValue
            var sumAbs = 0L; var descents = 0L; var prev = 0L
            val buf = new Array[Byte](8192)
            var carry = -1 // first byte of a sample split across reads
            var read = in.read(buf)
            while (read > 0) {
              var i = 0
              if (carry >= 0 && read >= 1) {
                val v = decodeS16(carry.toByte, buf(0), big)
                if (n > 0 && v < prev) descents += 1
                n += 1; peak = math.max(peak, v); lo = math.min(lo, v)
                sumAbs += math.abs(v); prev = v
                carry = -1; i = 1
              }
              while (i + 1 < read) {
                val v = decodeS16(buf(i), buf(i + 1), big)
                if (n > 0 && v < prev) descents += 1
                n += 1; peak = math.max(peak, v); lo = math.min(lo, v)
                sumAbs += math.abs(v); prev = v
                i += 2
              }
              if (i < read) carry = buf(i) & 0xff
              read = in.read(buf)
            }
            if (n == 0) Row(r.getLong(0), 0L, null, null, 0L, 0L, true)
            else Row(r.getLong(0), n, peak, lo, sumAbs, descents, true)
          }
        } finally in.close()
      } catch { case _: Exception =>
        Row(r.getLong(0), null, null, null, null, null, false)
      }
    }(Encoders.row(schema))
  }

  private def decodeS16(b0: Byte, b1: Byte, bigEndian: Boolean): Long =
    if (bigEndian) ((b0 << 8) | (b1 & 0xff)).toShort.toLong
    else ((b1 << 8) | (b0 & 0xff)).toShort.toLong

  /** Deterministic solid-color JPEG — fixture/synthesis helper for the
    * video path (frame CONTENT never reaches an oracle; only container
    * metadata does, and that is fixed by [[AviMjpeg.writeAvi]] args). */
  def solidJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) { var y = 0; while (y < h) { img.setRGB(x, y, rgb); y += 1 }; x += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG/AVI payload per id, parameterized in closed
    * form — (id % 3 + 1) frames, width 16 + 8·(id % 2), height 16,
    * fps 5 + id % 3 — so an oracle can state the expected container
    * metadata WITHOUT parsing bytes while the engine derives it by
    * genuinely demuxing them (mm_video_meta's proof shape). */
  def syntheticAvi(id: Long): Array[Byte] = {
    val n = (id % 3 + 1).toInt
    val w = (16 + 8 * (id % 2)).toInt
    val fps = (5 + id % 3).toInt
    val frames = (0 until n).map(i =>
      solidJpeg(w, 16, ((id * 2654435761L + i * 40503L) & 0xffffffL).toInt))
    AviMjpeg.writeAvi(frames, w, 16, fps)
  }

  /** (id, blob) frame of [[syntheticAvi]] payloads for an id frame. */
  def syntheticAviBlobs(ids: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    ids.select(col(idCol).cast("long"))
      .mapPartitions(it => it.map { r =>
        val id = r.getLong(0); Row(id, syntheticAvi(id))
      })(enc)
  }

  /** Deterministic mono 16-bit PCM WAV, parameterized in closed form —
    * sample rate 8000 + 4000·(id % 3), 500 + 100·(id % 5) frames —
    * the audio twin of [[syntheticAvi]]: an oracle states the expected
    * header fields while the engine derives them by genuinely parsing
    * the WAV bytes (mm_audio_meta's proof shape). */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = (8000 + 4000 * (id % 3)).toInt
    val n = (500 + 100 * (id % 5)).toInt
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((id * 131 + i * 17) % 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** (id, blob) frame of [[syntheticWav]] payloads for an id frame. */
  def syntheticWavBlobs(ids: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType), StructField("blob", BinaryType))))
    ids.select(col(idCol).cast("long"))
      .mapPartitions(it => it.map { r =>
        val id = r.getLong(0); Row(id, syntheticWav(id))
      })(enc)
  }

  /** REAL video-container metadata per blob: the RIFF walk reads the
    * avih header AND counts the movi frame chunks independently, so
    * `n_frames` (demuxed) vs `hdr_frames` (declared) exposes truncated
    * or lying containers. Non-AVI payloads report `is_avi = false`
    * with zeroed fields (total, like every decode path here). Same
    * partition-wise map shape as [[decodeMeta]] — no shuffle. */
  def videoMeta(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    val enc = Encoders.row(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_frames", LongType),
      StructField("hdr_frames", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("usec_per_frame", LongType),
      StructField("is_avi", BooleanType))))
    pairs.mapPartitions(it => it.map { r =>
      val id = r.getLong(0)
      val b = r.getAs[Array[Byte]](1)
      AviMjpeg.parseInfo(b) match {
        case Some(info) => Row(id, AviMjpeg.framePayloads(b).length.toLong,
          info.totalFrames.toLong, info.width.toLong, info.height.toLong,
          info.microSecPerFrame.toLong, true)
        case None => Row(id, 0L, 0L, 0L, 0L, 0L, false)
      }
    })(enc)
  }

  /** Frame sampling: emits `n` (doc_id, frame_idx, frame_md5) rows per
    * blob — REAL for JDK-decodable audio (WAV/AIFF/AU): `n` evenly
    * spaced PCM frames are pulled from the decoded stream and hashed —
    * and REAL for MJPEG/AVI video: [[AviMjpeg]] demuxes the container,
    * the evenly spaced frames are JPEG-decoded via javax.imageio, and
    * the md5 is over the decoded ARGB raster (pixel content, not
    * compressed bytes). Containers with no JVM codec (H.264 etc.)
    * keep the deterministic digest fake with the identical flatMap
    * shape, so further demuxers drop in without touching the plan. */
  def sampleFrames(blobs: DataFrame, n: Int,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    // the COSTLIEST op here (RIFF demux + per-frame JPEG decode):
    // spread compact inputs like every other decode path
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("frame_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("frame_md5", org.apache.spark.sql.types.StringType)))
    val enc = Encoders.row(schema)
    pairs.flatMap { r =>
      val docId = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
      val videoPayloads = AviMjpeg.framePayloads(bytes)
      if (videoPayloads.nonEmpty) {
        val total = videoPayloads.length
        (0 until n).map { i =>
          val idx = math.min(total - 1, (i.toLong * total / n).toInt)
          md.reset()
          // decode from the payload list already in hand — re-walking
          // the container per frame (decodeFrame) is n redundant RIFF
          // parses per blob in this hot path
          val (poff, plen) = videoPayloads(idx)
          AviMjpeg.decodePayload(bytes, poff, plen) match {
            case Some((w, h, argb)) =>
              // hash the decoded raster (big-endian ints): identical
              // pixels hash identically regardless of JPEG byte noise
              val bb = java.nio.ByteBuffer.allocate(8 + argb.length * 4)
              bb.putInt(w).putInt(h)
              argb.foreach(bb.putInt)
              md.update(bb.array())
            case None =>
              md.update(bytes, poff, plen) // undecodable frame: payload hash
          }
          Row(docId, i, hex(md.digest()))
        }
      } else audioFrames(bytes) match {
        case Some((frameSize, pcm)) if pcm.length >= frameSize && frameSize > 0 =>
          val total = pcm.length / frameSize
          (0 until n).map { i =>
            // evenly spaced, clamped — deterministic for any (total, n)
            val idx = math.min(total - 1, (i.toLong * total / n).toInt)
            md.reset()
            md.update(pcm, idx * frameSize, frameSize)
            Row(docId, i, hex(md.digest()))
          }
        case _ =>
          (0 until n).map { i =>
            md.reset(); md.update(bytes); md.update(i.toByte)
            Row(docId, i, hex(md.digest()))
          }
      }
    }(enc)
  }

  /** Decode a blob's PCM payload if a JDK audio reader claims it:
    * (frameSize, raw PCM bytes). */
  private def audioFrames(bytes: Array[Byte]): Option[(Int, Array[Byte])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try Some((in.getFormat.getFrameSize, in.readAllBytes()))
      finally in.close()
    } catch { case _: Exception => None }
}
