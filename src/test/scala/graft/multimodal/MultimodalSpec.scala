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
}
