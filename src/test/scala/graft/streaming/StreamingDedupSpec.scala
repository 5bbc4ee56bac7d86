package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class StreamingDedupSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  test("streaming exact dedup: first arrival wins within watermark, across batches and restarts") {
    val root = Files.createTempDirectory("graft-sdedup").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    def writeBatch(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(in, s"$name.csv"),
        ("doc_id,ts,text\n" + rows.mkString("\n")).getBytes)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("header", "true").csv(in)
      val q = StreamingDedup.dedupedStream(stream, "ts", "text", "1 hour")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: an in-batch duplicate (case/punct variant) collapses
    writeBatch("b1", Seq(
      "1,2023-04-23T10:00:00,The quick brown fox",
      "2,2023-04-23T10:05:00,the quick brown FOX!",
      "3,2023-04-23T10:10:00,something else entirely"))
    runOnce()
    val r1 = spark.read.parquet(out)
    assert(r1.count() == 2)
    assert(r1.filter(col("doc_id") === 2L).count() == 0) // later variant dropped

    // batch 2 after a RESTART (fresh query, same checkpoint): a
    // cross-batch duplicate within the horizon is still recognized,
    // new content passes
    writeBatch("b2", Seq(
      "4,2023-04-23T10:20:00,THE QUICK BROWN FOX",
      "5,2023-04-23T10:30:00,genuinely new document"))
    runOnce()
    val r2 = spark.read.parquet(out)
    assert(r2.count() == 3)
    assert(r2.filter(col("doc_id") === 4L).count() == 0) // deduped across batches
    assert(r2.filter(col("doc_id") === 5L).count() == 1)
  }
}
