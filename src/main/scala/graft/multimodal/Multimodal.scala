package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with typed metadata structs.
  *
  * The Spark-side shape (schema, partition-preserving batch transform,
  * decode-fn signature) is real and tested; the actual codec call is a
  * STUB — this container ships no image/audio libraries, so
  * [[stubDecode]] derives deterministic fake dimensions from the md5
  * digest. Swapping in a real decoder is a one-function change with an
  * identical plan shape (`mapPartitions` = Scala's analogue of a
  * Pandas-UDF `mapInPandas` batch transform: one JVM-side batch per
  * partition, no per-row serialization overhead).
  */
object Multimodal {

  /** Decoded-media metadata produced per blob. */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, content_md5: String,
      width: Int, height: Int, format: String)

  /** Deterministic fake decode: dimensions derived from digest bytes.
    * REPLACE with a real codec (e.g. javax.imageio) to productionize —
    * the signature is the contract. */
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

  /** Spread a blob frame across the cluster ONLY when it arrives
    * under-partitioned (a compact source read as few splits). Blobs are
    * the payload — shuffling an already well-spread multi-GB table
    * would move every byte for nothing. */
  private def spread(blobs: DataFrame, idCol: String): DataFrame = {
    val parallelism = blobs.sparkSession.sparkContext.defaultParallelism
    if (blobs.rdd.getNumPartitions < parallelism) blobs.repartition(col(idCol))
    else blobs
  }

  /** Batch decode over a (doc_id, blob) frame: partition-wise (no
    * shuffle when the input is already spread); each partition's rows
    * stream through the decoder. */
  def decodeMeta(blobs: DataFrame,
      idCol: String = "doc_id", blobCol: String = "blob"): Dataset[MediaMeta] = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    pairs.mapPartitions { it =>
      it.map(r => stubDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(Encoders.product[MediaMeta])
  }

  /** Feature-extraction stub: blob → fixed-width float embedding.
    * Deterministic fake (md5-expanded); a real extractor (CLIP-style
    * encoder) drops in with the same (blobs → Dataset) shape and the
    * same partition-preserving parallelism. */
  def extractFeatures(blobs: DataFrame, dim: Int = 16,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    pairs.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val feats = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        md.reset(); md.update(r.getAs[Array[Byte]](1)); md.update(i.toByte)
        val d = md.digest()
        feats(i) = ((d(0) & 0xff) - 128) / 128.0f
        i += 1
      }
      Row(r.getLong(0), feats.toSeq)
    }(Encoders.row(schema))
  }

  /** Resize stub: blob → (blob', width', height'). The fake keeps a
    * deterministic byte prefix proportional to the target area; a real
    * implementation swaps in an image scaler with the identical
    * signature. */
  def resize(blobs: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = spread(blobs, idCol).select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("blob", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("width", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("height", org.apache.spark.sql.types.IntegerType)))
    pairs.map { r =>
      val bytes = r.getAs[Array[Byte]](1)
      val keep = math.max(1, math.min(bytes.length, targetW * targetH / 64))
      Row(r.getLong(0), bytes.take(keep), targetW, targetH)
    }(Encoders.row(schema))
  }

  /** Frame-sampling stub for video-like payloads: emits `n` (doc_id,
    * frame_idx, frame_md5) rows per blob — the flatMap shape a real
    * frame extractor would have. */
  def sampleFrames(blobs: DataFrame, n: Int,
      idCol: String = "doc_id", blobCol: String = "blob"): DataFrame = {
    val pairs = blobs.select(col(idCol).cast("long"), col(blobCol))
    import org.apache.spark.sql.Row
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("frame_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("frame_md5", org.apache.spark.sql.types.StringType)))
    val enc = Encoders.row(schema)
    pairs.flatMap { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map { i =>
        md.reset()
        md.update(r.getAs[Array[Byte]](1))
        md.update(i.toByte)
        Row(r.getLong(0), i, md.digest().map("%02x".format(_)).mkString)
      }
    }(enc)
  }
}
