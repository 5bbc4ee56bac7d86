package graft.multimodal

/** Pure-JVM RIFF/AVI demuxer for MJPEG video blobs.
  *
  * MJPEG-in-AVI is the one mainstream video container a bare JVM can
  * handle end-to-end: the RIFF framing is trivially parseable and each
  * '00dc'/'00db' chunk in the 'movi' list is a standalone JPEG that
  * javax.imageio decodes. This closes the video side of the multimodal
  * surface with a REAL demux + decode path (the deterministic digest
  * fake remains only for containers with no JVM codec, e.g. H.264).
  *
  * Layout parsed (AVI 1.0, per the public RIFF/AVI spec):
  *   RIFF('AVI ' LIST('hdrl' avih(...) LIST('strl' strh strf ...))
  *               LIST('movi' 00dc... ) [idx1])
  * All sizes little-endian u32; chunks pad to even offsets. The walk
  * is bounds-checked everywhere — a truncated or adversarial payload
  * returns None/empty rather than throwing (ingest stays total).
  */
object AviMjpeg {

  /** Header metadata from the 'avih' main header. */
  final case class AviInfo(
      width: Int, height: Int, totalFrames: Int, microSecPerFrame: Int)

  private def leU32(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

  /** Walk all chunks, invoking `f(id, listType, dataOff, dataLen)`;
    * recurses into LIST/RIFF bodies. Bounds-checked; malformed sizes
    * end the walk instead of overrunning. */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= to) {
      val id = fourcc(b, off)
      val size = leU32(b, off + 4)
      if (size < 0 || off + 8 + size > to) return
      val dataOff = off + 8
      val dataLen = size.toInt
      if (id == "RIFF" || id == "LIST") {
        if (dataLen >= 4) {
          f(id, fourcc(b, dataOff), dataOff + 4, dataLen - 4)
          walk(b, dataOff + 4, dataOff + dataLen)(f)
        }
      } else {
        f(id, "", dataOff, dataLen)
      }
      off = dataOff + dataLen + (dataLen & 1) // even padding
    }
  }

  /** Main-header metadata, if the payload is a well-formed AVI. */
  def parseInfo(b: Array[Byte]): Option[AviInfo] = {
    if (!isAvi(b)) return None
    var info: Option[AviInfo] = None
    walk(b, 12, b.length) { (id, _, off, len) =>
      if (id == "avih" && len >= 40 && info.isEmpty)
        info = Some(AviInfo(
          width = leU32(b, off + 32).toInt,
          height = leU32(b, off + 36).toInt,
          totalFrames = leU32(b, off + 16).toInt,
          microSecPerFrame = leU32(b, off).toInt))
    }
    info
  }

  /** (offset, length) of every video frame payload ('##dc'/'##db'
    * chunks under 'movi'), in stream order. Each slice is a complete
    * JPEG for MJPEG streams. */
  def framePayloads(b: Array[Byte]): IndexedSeq[(Int, Int)] = {
    if (!isAvi(b)) return IndexedSeq.empty
    val out = IndexedSeq.newBuilder[(Int, Int)]
    walk(b, 12, b.length) { (id, _, off, len) =>
      if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")) && len > 0)
        out += ((off, len))
    }
    out.result()
  }

  /** Decode frame `i` of an AVI blob to an ARGB pixel array via
    * javax.imageio (MJPEG frames are plain JPEGs). None when the index
    * is out of range or the payload is not imageio-decodable. */
  def decodeFrame(b: Array[Byte], idx: Int): Option[(Int, Int, Array[Int])] = {
    val fs = framePayloads(b)
    if (idx < 0 || idx >= fs.length) return None
    val (off, len) = fs(idx)
    decodePayload(b, off, len)
  }

  /** Decode one already-located frame payload slice — the form callers
    * holding a [[framePayloads]] list use, so sampling n frames walks
    * the container ONCE instead of re-parsing the RIFF per frame. */
  def decodePayload(b: Array[Byte], off: Int,
      len: Int): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b, off, len))
      if (img == null) None
      else Some((img.getWidth, img.getHeight,
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- writer (sink side: shard assembly + test fixtures) ----------

  /** Assemble an MJPEG AVI from already-encoded JPEG frames — the
    * write side of the demuxer (and the spec's fixture builder). The
    * structure follows the RIFF/AVI layout above, sizes exact, chunks
    * even-padded. */
  def writeAvi(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ body)

    val mspf = if (fps > 0) 1000000 / fps else 40000
    // dwFlags = AVIF_ISINTERLEAVED (0x100). No idx1 chunk is written,
    // so AVIF_HASINDEX (0x10) must NOT be advertised — an external
    // demuxer honoring it would seek a missing index.
    val avih = u32(mspf.toLong) ++ u32(0) ++ u32(0) ++ u32(0x100) ++
      u32(jpegFrames.length.toLong) ++ u32(0) ++ u32(1) ++ u32(0) ++
      u32(width.toLong) ++ u32(height.toLong) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(1) /*scale*/ ++ u32(fps.toLong) ++
      u32(0) ++ u32(jpegFrames.length.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++
      Array.fill(8)(0.toByte)
    val strf = u32(40) ++ u32(width.toLong) ++ u32(height.toLong) ++
      Array[Byte](1, 0) ++ Array[Byte](24, 0) ++
      "MJPG".getBytes("US-ASCII") ++ u32(width.toLong * height * 3) ++
      u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      jpegFrames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(u32(body.length.toLong))
    bos.write(body)
    bos.toByteArray
  }
}
