package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Reading(file: String, time: Option[Timestamp])

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("RollingHash: matches a reference fold, codegen and interpreted agree") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 131 + (b & 0xff)) % 1000000007L)
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "a"), (4L, "hello worlc"))
      .toDF("id", "s")
    val got = df.select(col("id"), RollingHash(col("s")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == ref("hello world"))
    assert(got(2L) == 0L)
    assert(got(3L) == 'a'.toLong)
    assert(got(1L) != got(4L))       // order/content sensitivity
    // null input -> null
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
      .select(RollingHash(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("QuantizedSqDist: bit-exact vs the composed HOF form, codegen'd") {
    // reference = the exact composed expression the native kernel replaces
    def q(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * 1000000).cast("long"))
    def refDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(q(a), q(b), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    val vecs = Seq(
      (1L, Array(0.15f, -2.5f, 0.0f), Array(0.1500001f, -2.5f, 1.0f)),
      (2L, Array(-0.9999999f, 3.3f, 7.7f), Array(1.0f, -3.3f, 7.7f)),
      (3L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
    val rows = vecs.select(col("id"),
      QuantizedSqDist(col("a"), col("b")).as("native"),
      refDist(col("a"), col("b")).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))
    assert(rows.find(_.getLong(0) == 3L).get.getLong(1) == 0L)  // empty -> seed
    // length mismatch -> null
    val m = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(QuantizedSqDist(col("a"), col("b"))).collect()(0)
    assert(m.isNullAt(0))
    // the plan stays inside whole-stage codegen (no HOF fallback) —
    // parquet-backed, because local relations constant-fold away
    val dir = java.nio.file.Files.createTempDirectory("graft-qsd").toString
    vecs.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(QuantizedSqDist(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span in toString form
    assert(plan.contains("*(1) Project [quantized_sq_dist"))
  }

  test("QuantizedSqDist: pre-quantized long arrays pass through without the 1e6 multiply") {
    val rows = Seq(
      (1L, Array(3L, -4L), Array(0L, 0L)),           // 9 + 16 = 25
      (2L, Array(100L, 200L), Array(100L, 200L)))    // identical -> 0
      .toDF("id", "a", "b")
      .select(col("id"), QuantizedSqDist(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 25L && rows(2L) == 0L)
    // mixed long/float scales are incomparable -> analysis-time reject
    val ex = intercept[Exception] {
      Seq((Array(1L), Array(1.0f))).toDF("a", "b")
        .select(QuantizedSqDist(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("quantized_sq_dist"))
  }

  test("ByteHistogram: counts match a reference fold; empty and null inputs") {
    val df = Seq((1L, "aabé"), (2L, ""), (3L, "zzzz"))
      .toDF("id", "s").select(col("id"), encode(col("s"), "UTF-8").as("b"))
    val got = df.select(col("id"), ByteHistogram(col("b")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def ref(s: String): Seq[Long] = {
      val c = new Array[Long](256)
      s.getBytes("UTF-8").foreach(b => c(b & 0xff) += 1)
      c.toSeq
    }
    assert(got(1L) == ref("aabé"))          // é = 2 UTF-8 bytes >= 0x80
    assert(got(1L).sum == 5L && got(1L)(0xc3) == 1L)  // a,a,b + 2-byte é
    assert(got(2L) == Seq.fill(256)(0L))         // empty -> zeros, not null
    assert(got(3L)('z'.toInt) == 4L)
    val n = Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("b")
      .select(ByteHistogram(col("b"))).collect()(0)
    assert(n.isNullAt(0))
    // derived features agree with direct computation
    val feats = graft.multimodal.Multimodal.byteFeatures(
      df.withColumnRenamed("id", "doc_id").withColumnRenamed("b", "blob"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(feats(3L).getAs[Long]("n_distinct_bytes") == 1L)
    assert(feats(3L).getAs[Long]("mode_byte") == 'z'.toLong)
    assert(feats(3L).getAs[Long]("ascii_ratio_scaled") == 1000000L)
    assert(feats(2L).getAs[Long]("ascii_ratio_scaled") == 0L)  // len-0 guard
  }

  test("TimeBoundsAggregator: typed min/max with null-tolerant merge") {
    val ds = Seq(
      Reading("a", Some(Timestamp.valueOf("2023-04-23 10:00:00"))),
      Reading("a", Some(Timestamp.valueOf("2023-04-23 12:00:00"))),
      Reading("a", None),
      Reading("b", None)).toDS()
    val agg = TimeBoundsAggregator.onField[Reading](_.time)
    val out = ds.groupByKey(_.file).agg(agg.toColumn.name("bounds"))
      .collect().toMap
    assert(out("a").begin.get == Timestamp.valueOf("2023-04-23 10:00:00"))
    assert(out("a").end.get == Timestamp.valueOf("2023-04-23 12:00:00"))
    assert(out("b").begin.isEmpty && out("b").end.isEmpty)   // P9 shape
  }
}
