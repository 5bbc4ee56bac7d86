package graft.streaming

import graft.SparkSuite
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  test("row-local signatures are bit-identical to the batch explode/groupBy form") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog."),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines"),
      (4L, "abc"))                                  // shorter than k -> no shingles
      .toDF("doc_id", "text")
    val streamingForm = docs.select(
      col("doc_id") +: StreamingNearDup.signatureCols(col("text"), 5, 8): _*)
    val batchForm = Dedup.minHashSignatures(
      Dedup.shingles(docs, 5, distinct = false), 8)
    val s = streamingForm.filter(col("h1").isNotNull)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = batchForm.orderBy("doc_id").collect().map(_.toSeq)
    assert(s.toSeq == b.toSeq)
    // the short doc has NULL signature components (absent from batch)
    assert(streamingForm.filter(col("doc_id") === 4L).collect().head.isNullAt(1))
  }

  test("streaming near-dup: first-in-all-buckets wins, near-dups suppressed across batches") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))
    val root = Files.createTempDirectory("graft-sneardup").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(in, s"$name.csv"),
        ("doc_id,ts,text\n" + rows.mkString("\n")).getBytes)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("header", "true").csv(in)
      val q = StreamingNearDup.writeNearDupFiltered(
        stream, "ts", "doc_id", "text", delay = "1 hour",
        path = out, checkpoint = ckpt, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    // batch 1: two genuinely different documents PLUS a same-batch
    // near-dup of doc 1 — the case processing-order dedup gets wrong
    // (split bucket ownership would drop BOTH); event-time ownership
    // must keep doc 1 and suppress doc 7
    writeBatch("b1", Seq(
      "1,2023-04-23T10:00:00,The quick brown fox jumps over the lazy dog today",
      "7,2023-04-23T10:02:00,The quick brown fox jumps over the lazy dog today??",
      "2,2023-04-23T10:01:00,an entirely different note about query engines and shuffles"))
    runOnce()
    // batch 2: a punctuation-variant NEAR-dup of doc 1 and one new doc
    writeBatch("b2", Seq(
      "3,2023-04-23T10:20:00,The quick brown fox jumps over the lazy dog today!!!",
      "4,2023-04-23T10:21:00,yet another completely novel piece of content here"))
    runOnce()
    val result = spark.read.parquet(out)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(result.contains(1L) && result.contains(2L) && result.contains(4L),
      s"originals and novel docs must survive, got $result")
    assert(!result.contains(3L), s"cross-batch near-dup must be suppressed, got $result")
    assert(!result.contains(7L), s"same-batch near-dup must be suppressed, got $result")
  }

  test("transformWithState variant: in-stream conjunction, identical output through a restart") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))
    val root = Files.createTempDirectory("graft-sneardup-tws").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(in, s"$name.csv"),
        ("doc_id,ts,text\n" + rows.mkString("\n")).getBytes)

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = util.Try(spark.conf.get(provKey)).toOption
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("header", "true").csv(in)
        val q = StreamingNearDup.writeNearDupFilteredTws(
          stream, "ts", "doc_id", "text", delay = "1 hour",
          path = out, checkpoint = ckpt,
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
      }

      // without RocksDB the builder must fail fast with the config key
      spark.conf.unset(provKey)
      val err = intercept[IllegalArgumentException] {
        StreamingNearDup.nearDupFilteredStream(
          spark.readStream.schema(schema).option("header", "true").csv(in),
          "ts", "doc_id", "text", "1 hour")
      }
      assert(err.getMessage.contains("RocksDBStateStoreProvider"))
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

      // batch 1: original + same-batch near-dup (the split-ownership
      // trap) + one distinct doc — the same adversarial scenario the
      // foreachBatch path is proven on
      writeBatch("b1", Seq(
        "1,2023-04-23T10:00:00,The quick brown fox jumps over the lazy dog today",
        "7,2023-04-23T10:02:00,The quick brown fox jumps over the lazy dog today??",
        "2,2023-04-23T10:01:00,an entirely different note about query engines and shuffles"))
      runOnce()
      // RESTART: a fresh query on the same checkpoint sees a cross-batch
      // near-dup (must hit the recovered bucket state) and a novel doc
      writeBatch("b2", Seq(
        "3,2023-04-23T10:20:00,The quick brown fox jumps over the lazy dog today!!!",
        "4,2023-04-23T10:21:00,yet another completely novel piece of content here"))
      runOnce()
      val rows = spark.read.parquet(out).select("id").collect().map(_.getLong(0))
      assert(rows.length == rows.distinct.length,
        s"file-sink manifest must keep the output exactly-once, got ${rows.toSeq}")
      val result = rows.toSet
      assert(result == Set(1L, 2L, 4L),
        s"originals and novel docs survive, near-dups suppressed; got $result")
    } finally saved match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
