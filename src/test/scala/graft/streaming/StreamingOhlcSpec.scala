package graft.streaming

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The OHLC downsample ([[graft.operators.Timeseries.ohlc]] semantics)
  * as a LIVE watermarked windowed aggregate: min_by/max_by picks on a
  * packed (ts, tie) struct work inside Structured Streaming's partial
  * aggregation, so the downsample that compacts a gauge store offline
  * also serves as the store's real-time rollup — same numbers.
  */
class StreamingOhlcSpec extends SparkSuite {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private def ohlcAgg(df: DataFrame): DataFrame = {
    val ord = struct(col("ts"), col("eid"))
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("k"))
      .agg(min_by(col("v"), ord).as("open"), max(col("v")).as("high"),
        min(col("v")).as("low"), max_by(col("v"), ord).as("close"),
        count(lit(1)).as("n"))
  }

  test("streaming windowed OHLC matches the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = Seq(
      ("A", t(600), 1L, 10.0), ("A", t(1200), 2L, 50.0),
      ("A", t(1800), 3L, 5.0), ("A", t(3000), 4L, 20.0),   // hour 1: o=10 h=50 l=5 c=20
      ("A", t(4200), 5L, 7.0), ("A", t(4200), 6L, 9.0),    // hour 2 tie: eid orders
      ("B", t(900), 7L, 1.0))

    val input = MemoryStream[(String, Timestamp, Long, Double)]
    val q = ohlcAgg(input.toDS().toDF("k", "ts", "eid", "v")
      .withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_stream")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // feed in two batches, deliberately splitting hour 1 across them
    input.addData(rows.take(3).map(r => (r._1, r._2, r._3, r._4)): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3).map(r => (r._1, r._2, r._3, r._4)): _*)
    q.processAllAvailable()

    def shape(df: DataFrame) = df
      .select(col("w.start").as("ws"), col("k"), col("open"), col("high"),
        col("low"), col("close"), col("n"))
      .orderBy("k", "ws").collect().toSeq

    val streamed = shape(spark.table("ohlc_stream"))
    val batch = shape(ohlcAgg(rows.toDF("k", "ts", "eid", "v")))
    assert(streamed == batch && streamed.nonEmpty)
    // spot-check the split-across-batches hour
    val h1 = streamed.find(r => r.getString(1) == "A" &&
      r.getTimestamp(0) == t(0)).get
    assert(h1.getDouble(2) == 10.0 && h1.getDouble(3) == 50.0 &&
      h1.getDouble(4) == 5.0 && h1.getDouble(5) == 20.0)
    // the tie hour: close picks the larger eid at the same ts
    val h2 = streamed.find(r => r.getString(1) == "A" &&
      r.getTimestamp(0) == t(3600)).get
    assert(h2.getDouble(2) == 7.0 && h2.getDouble(5) == 9.0)
    q.stop()
  }
}
