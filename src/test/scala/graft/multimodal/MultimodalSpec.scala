package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Real-image decode proof: genuine PNG/GIF bytes (generated through
  * the JDK's own encoder) round-trip through both decode paths — the
  * javax.imageio mapPartitions path and the pure-column header parser —
  * with their true dimensions; non-image payloads deterministically
  * fall back to the digest-derived stub.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040)  // non-trivial pixel so encoders emit data
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private lazy val blobs = Seq(
    (1L, imageBytes("png", 123, 77)),
    (2L, imageBytes("gif", 31, 14)),
    (3L, "just some text bytes, not an image".getBytes("UTF-8")))
    .toDF("doc_id", "blob")

  test("decodeMeta reads REAL container headers, stubs only unknowns") {
    val metas = Multimodal.decodeMeta(blobs).collect().sortBy(_.doc_id)
    assert(metas(0).format == "png" && metas(0).width == 123 && metas(0).height == 77)
    assert(metas(1).format == "gif" && metas(1).width == 31 && metas(1).height == 14)
    // text falls back to the deterministic digest stub
    val expectStub = Multimodal.stubDecode(3L,
      "just some text bytes, not an image".getBytes("UTF-8"))
    assert(metas(2) == expectStub)
  }

  test("a TEXT payload starting 'GIF89a' stubs, a real GIF decodes (printable-magic proof)") {
    // "GIF89a" is six printable chars: a document ABOUT the GIF format
    // used to be claimed by the JDK GIF reader, whose header-only
    // getWidth returned garbage dims from the following text — the
    // full-decode proof must reject it while keeping real GIFs real
    val textTrap = "GIF89a is the 1989 revision of the GIF format..."
      .getBytes("UTF-8")
    val m = Multimodal.decode(7L, textTrap)
    assert(m == Multimodal.stubDecode(7L, textTrap),
      s"text with a GIF-magic prefix was decoded as an image: $m")
    val realGif = Multimodal.decode(8L, imageBytes("gif", 31, 14))
    assert(realGif.format == "gif" && realGif.width == 31 && realGif.height == 14)
  }

  test("imageHeaderMeta parses PNG/GIF headers with pure column expressions") {
    val out = Multimodal.imageHeaderMeta(blobs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("format") == "png")
    assert(out(0).getAs[Long]("width") == 123L && out(0).getAs[Long]("height") == 77L)
    assert(out(1).getAs[String]("format") == "gif")
    assert(out(1).getAs[Long]("width") == 31L && out(1).getAs[Long]("height") == 14L)
    assert(out(2).getAs[String]("format") == "unknown")
    assert(out(2).isNullAt(out(2).fieldIndex("width")))
    // and the digest matches the raw bytes
    assert(out(0).getAs[String]("content_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(imageBytes("png", 123, 77)).map("%02x".format(_)).mkString)
  }

  /** Mono 16-bit PCM WAV with a deterministic ramp payload. */
  private def wavBytes(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    (0 until nFrames).foreach { i =>
      val v = (i * 257 % 65536 - 32768).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("resize REALLY rescales decodable images; non-images keep the stub path") {
    val out = Multimodal.resize(blobs, 40, 30).orderBy("doc_id").collect()
    // decoded images: output blob is a real PNG at the target box
    Seq(0, 1).foreach { i =>
      assert(out(i).getAs[Boolean]("decoded"))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out(i).getAs[Array[Byte]]("blob")))
      assert(img.getWidth == 40 && img.getHeight == 30)
    }
    assert(!out(2).getAs[Boolean]("decoded"))
    // deterministic: a second run yields byte-identical output
    val again = Multimodal.resize(blobs, 40, 30).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Array[Byte]]("blob").toSeq).toSeq ==
      again.map(_.getAs[Array[Byte]]("blob").toSeq).toSeq)
  }

  test("extractFeatures embeds decodable images from REAL luminance") {
    // a dark and a bright PNG must land at opposite ends of [-1, 1]
    def flat(rgb: Int) = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach(y => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val out = Multimodal.extractFeatures(
        Seq((1L, flat(0x000000)), (2L, flat(0xffffff)),
          (3L, "text".getBytes("UTF-8"))).toDF("doc_id", "blob"), dim = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("decoded") &&
      out(0).getSeq[Float](1).forall(_ < -0.9f))
    assert(out(1).getAs[Boolean]("decoded") &&
      out(1).getSeq[Float](1).forall(_ > 0.9f))
    assert(!out(2).getAs[Boolean]("decoded"))
  }

  test("decodeAudioMeta reads REAL WAV headers; sampleFrames hashes real PCM frames") {
    val wav = wavBytes(8000, 1000)
    val audio = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val meta = Multimodal.decodeAudioMeta(audio).orderBy("doc_id").collect()
    assert(meta(0).getAs[Boolean]("decoded"))
    assert(meta(0).getAs[Int]("sample_rate") == 8000)
    assert(meta(0).getAs[Int]("channels") == 1)
    assert(meta(0).getAs[Int]("bits_per_sample") == 16)
    assert(meta(0).getAs[Long]("n_frames") == 1000L)
    assert(meta(0).getAs[Long]("duration_ms") == 125L)
    assert(!meta(1).getAs[Boolean]("decoded"))

    val frames = Multimodal.sampleFrames(audio, 4).collect()
      .groupBy(_.getLong(0))
    // real path: 4 evenly spaced PCM frames — the ramp payload makes
    // them distinct, and the first frame is frame 0 of the stream
    val wavFrames = frames(1L).sortBy(_.getInt(1))
    assert(wavFrames.length == 4)
    assert(wavFrames.map(_.getString(2)).distinct.length == 4)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav)).readAllBytes()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(pcm, 0, 2)
    assert(wavFrames.head.getString(2) == md.digest().map("%02x".format(_)).mkString)
    // fallback path still emits n deterministic digest rows
    assert(frames(2L).length == 4)
  }

  test("pcmSampleStats decodes the REAL sample stream: exact stats, order-sensitive descents, both endiannesses") {
    val n = 1000
    val vals = (0 until n).map(i => (i * 257 % 65536 - 32768).toLong)
    val expPeak = vals.max
    val expMin = vals.min
    val expSumAbs = vals.map(math.abs).sum
    val expDesc = vals.sliding(2).count(p => p(1) < p(0)).toLong
    // little-endian WAV and big-endian AIFF of the SAME samples: the
    // stats must agree exactly — any endianness/offset/stride bug in
    // the stream decode diverges immediately
    val aiffPcm = new Array[Byte](n * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      aiffPcm(2 * i) = ((v >> 8) & 0xff).toByte
      aiffPcm(2 * i + 1) = (v & 0xff).toByte
    }
    val aiffFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(aiffPcm), aiffFmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val audio = Seq((1L, wavBytes(8000, n)), (2L, bos.toByteArray),
      (3L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "blob")
    val out = Multimodal.pcmSampleStats(audio).orderBy("doc_id").collect()
    Seq(0, 1).foreach { i =>
      val r = out(i)
      assert(r.getAs[Boolean]("decoded"))
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Long]("peak") == expPeak)
      assert(r.getAs[Long]("min_sample") == expMin)
      assert(r.getAs[Long]("sum_abs") == expSumAbs)
      assert(r.getAs[Long]("n_descents") == expDesc)
    }
    assert(!out(2).getAs[Boolean]("decoded"))
    // the mm_audio_pcm generator's closed form holds end-to-end
    val syn = Multimodal.pcmSampleStats(
      Multimodal.syntheticWavBlobs(Seq(5L).toDF("doc_id")))
      .collect().head
    val sv = (0 until 500).map(i => (5L * 131 + i * 17) % 32768)
    assert(syn.getAs[Long]("n_samples") == 500L)
    assert(syn.getAs[Long]("peak") == sv.max)
    assert(syn.getAs[Long]("sum_abs") == sv.sum) // all non-negative
    assert(syn.getAs[Long]("n_descents") ==
      sv.sliding(2).count(p => p(1) < p(0)).toLong)
  }

  test("byteFeatures on a zero-length blob yields all-zero features (oracle parity)") {
    // the DuckDB oracle LEFT-JOINs the histogram agg with COALESCE(.., 0)
    // defaults for exactly this row shape — keep both sides in lockstep
    val out = Multimodal.byteFeatures(
        Seq((1L, Array.empty[Byte]), (2L, "ab".getBytes("UTF-8")))
          .toDF("doc_id", "blob"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_bytes") == 0L)
    assert(out(0).getAs[Long]("n_distinct_bytes") == 0L)
    assert(out(0).getAs[Long]("mode_byte") == 0L)
    assert(out(0).getAs[Long]("mode_count") == 0L)
    assert(out(0).getAs[Long]("ascii_ratio_scaled") == 0L)
    assert(out(1).getAs[Long]("n_distinct_bytes") == 2L)
    assert(out(1).getAs[Long]("ascii_ratio_scaled") == 1000000L)
  }

  // ---- MJPEG/AVI video ------------------------------------------------

  /** JPEG frame of a solid color (encoder-realistic: every frame is a
    * real JDK-encoded JPEG, not a synthetic byte blob). */
  private def jpegFrame(rgb: Int, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private lazy val aviBytes = AviMjpeg.writeAvi(
    Seq(jpegFrame(0xff0000), jpegFrame(0x00ff00), jpegFrame(0x0000ff)),
    width = 16, height = 16, fps = 10)

  test("AviMjpeg round-trip: writer output demuxes to the same frames") {
    assert(AviMjpeg.isAvi(aviBytes))
    val info = AviMjpeg.parseInfo(aviBytes).get
    assert(info.width == 16 && info.height == 16 && info.totalFrames == 3)
    assert(info.microSecPerFrame == 100000)
    val fs = AviMjpeg.framePayloads(aviBytes)
    assert(fs.length == 3)
    // every demuxed payload is a decodable JPEG with the right dims
    (0 until 3).foreach { i =>
      val (w, h, argb) = AviMjpeg.decodeFrame(aviBytes, i).get
      assert(w == 16 && h == 16 && argb.length == 256)
    }
    // red / green / blue frames decode to distinct dominant channels
    def dominant(argb: Array[Int]): Int = {
      val p = argb(0)
      Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff).zipWithIndex.maxBy(_._1)._2
    }
    assert((0 until 3).map(i =>
      dominant(AviMjpeg.decodeFrame(aviBytes, i).get._3)) == Seq(0, 1, 2))
    assert(AviMjpeg.decodeFrame(aviBytes, 3).isEmpty)
  }

  test("videoMeta parses synthetic AVI metadata; non-AVI reports is_avi=false") {
    import spark.implicits._
    val ids = Seq(10L, 11L, 12L).toDF("doc_id")
    val out = Multimodal.videoMeta(Multimodal.syntheticAviBlobs(ids))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getBoolean(6))).toMap
    // closed form: frames = id%3+1, width = 16+8*(id%2), usec = 1e6/(5+id%3)
    assert(out(10L) == ((2L, 2L, 16L, 166666L, true)))
    assert(out(11L) == ((3L, 3L, 24L, 142857L, true)))
    assert(out(12L) == ((1L, 1L, 16L, 200000L, true)))
    val notAvi = Multimodal.videoMeta(
      Seq((1L, "not a video".getBytes("UTF-8"))).toDF("doc_id", "blob"))
      .collect().head
    assert(!notAvi.getBoolean(6) && notAvi.getLong(1) == 0L)
  }

  test("AviMjpeg rejects truncated and non-AVI payloads without throwing") {
    assert(AviMjpeg.framePayloads(aviBytes.take(40)).isEmpty)
    assert(AviMjpeg.parseInfo("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(AviMjpeg.framePayloads(Array.emptyByteArray).isEmpty)
  }

  test("decode reports avi format with header dimensions") {
    val meta = Multimodal.decode(9L, aviBytes)
    assert(meta.format == "avi")
    assert(meta.width == 16 && meta.height == 16)
  }

  test("sampleFrames REALLY samples decoded video rasters") {
    val df = Seq((5L, aviBytes)).toDF("doc_id", "blob")
    val out = Multimodal.sampleFrames(df, n = 3).orderBy("frame_idx").collect()
    assert(out.length == 3)
    // three distinct-color frames -> three distinct raster hashes
    assert(out.map(_.getAs[String]("frame_md5")).distinct.length == 3)
    // hashes are raster-based: byte-identical re-encode of the same
    // pixel content (a second writer pass) hashes identically
    val again = Multimodal.sampleFrames(df, n = 3).orderBy("frame_idx").collect()
    assert(out.map(_.getString(2)).toSeq == again.map(_.getString(2)).toSeq)
    // a WAV (also RIFF) still takes the audio path, not the demuxer
    val wav = Seq((6L, wavBytes(8000, 32))).toDF("doc_id", "blob")
    assert(Multimodal.sampleFrames(wav, n = 2).count() == 2)
  }
}
