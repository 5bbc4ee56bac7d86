package graft.streaming

import graft.SparkSuite
import StreamingAsOfJoin._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingAsOfJoinSpec extends SparkSuite {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("event-time as-of: out-of-order rows reorder inside the watermark, carry survives batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[AsOfEvent]
    val q = StreamingAsOfJoin.enrich(
      input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def results(): Map[(String, Long), (Option[Long], Option[Double])] =
      spark.table("asof_out").as[AsOfMatch].collect()
        .map(m => (m.key, m.ts.getTime / 1000) ->
          (m.asof_ts.map(_.getTime / 1000), m.asof_value)).toMap

    // batch 1: key A, deliberately OUT OF ORDER — the probe at 15
    // arrives before the right row at 10 that should match it, and a
    // probe at 30 ties a right row at 30 (inclusive rule)
    input.addData(
      AsOfEvent("A", t(15), 1, 1.5),   // left before its match arrives
      AsOfEvent("A", t(10), 0, 10.0),  // right 10
      AsOfEvent("A", t(5), 1, 0.5),    // left with NO prior right
      AsOfEvent("A", t(30), 0, 30.0),  // right 30
      AsOfEvent("A", t(30), 1, 3.0),   // left ties right 30 -> inclusive
      AsOfEvent("A", t(35), 1, 3.5))   // left after right 30
    q.processAllAvailable()             // watermark still behind: nothing final
    // batch 2: a sentinel on ANOTHER key; during this batch the
    // watermark (from batch 1's max event time, delay 0) is 35, so
    // every key-A row is final and emits
    input.addData(AsOfEvent("zz", t(36), 0, 0.0))
    q.processAllAvailable()

    val r1 = results()
    assert(r1(("A", 5L)) == ((None, None)))            // no prior right -> null
    assert(r1(("A", 15L)) == ((Some(10L), Some(10.0))))// reordered match
    assert(r1(("A", 30L)) == ((Some(30L), Some(30.0))))// inclusive tie
    assert(r1(("A", 35L)) == ((Some(30L), Some(30.0))))
    assert(r1.size == 4)

    // batch 3: a probe long after the last right row — not yet final
    // (watermark 36), so it buffers with an event-time timeout; two
    // sentinel batches later the watermark passes 50 and the TIMEOUT
    // path flushes it (key A receives no further input), proving the
    // carry persisted in state across batches
    input.addData(AsOfEvent("A", t(50), 1, 5.0))
    q.processAllAvailable()
    input.addData(AsOfEvent("zz", t(60), 0, 0.0))
    q.processAllAvailable()
    input.addData(AsOfEvent("zz", t(70), 0, 0.0))
    q.processAllAvailable()
    assert(results()(("A", 50L)) == ((Some(30L), Some(30.0))))
    q.stop()
  }

  test("streaming result matches the batch AsOfJoin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // randomized-ish interleaving, two keys
    val rights = Seq(("A", 10L, 1.0), ("A", 40L, 4.0), ("B", 20L, 2.0))
    val lefts = Seq(("A", 9L), ("A", 10L), ("A", 39L), ("A", 41L),
      ("B", 19L), ("B", 100L))
    val events =
      rights.map { case (k, ts, v) => AsOfEvent(k, t(ts), 0, v) } ++
        lefts.map { case (k, ts) => AsOfEvent(k, t(ts), 1, 0.0) }

    val input = MemoryStream[AsOfEvent]
    val q = StreamingAsOfJoin.enrich(
      input.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out2")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData(scala.util.Random.shuffle(events): _*)
    q.processAllAvailable()
    input.addData(AsOfEvent("zz", t(1000), 0, 0.0))
    q.processAllAvailable()
    val streaming = spark.table("asof_out2").as[AsOfMatch].collect()
      .map(m => (m.key, m.ts.getTime / 1000) -> m.asof_value).toMap

    val leftDf = lefts.toDF("k", "ts")
    val rightDf = rights.toDF("k", "rts", "v")
    val batch = graft.operators.AsOfJoin(
      leftDf, rightDf, Seq("k"), "ts", "rts", Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getDouble(r.fieldIndex("asof_v"))))).toMap

    assert(streaming.size == lefts.size)
    assert(batch.keySet == streaming.keySet)
    batch.foreach { case (k, v) => assert(streaming(k) == v, s"at $k") }
    q.stop()
  }
}
