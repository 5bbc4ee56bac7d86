package graft.streaming

import graft.SparkSuite
import StreamingGapDetect._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingGapDetectSpec extends SparkSuite {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("gap alerts fire on the event-time clock, repeat while silent, reset on resume") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[SeriesEvent]
    val q = StreamingGapDetect.alerts(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 10_000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def alerts(): Seq[GapAlert] =
      spark.table("gap_out").as[GapAlert].collect().toSeq
        .sortBy(a => (a.key, a.horizon_ts.getTime))

    // A and B both report at t=0; B keeps reporting, A goes silent
    input.addData(SeriesEvent("A", t(0)), SeriesEvent("B", t(0)))
    q.processAllAvailable()
    assert(alerts().isEmpty) // watermark at 0: nobody is late yet

    // B reports at 12s -> watermark reaches 12s, past A's 10s horizon
    input.addData(SeriesEvent("B", t(12)))
    q.processAllAvailable()
    // timers fire on the NEXT watermark evaluation; push one more row
    input.addData(SeriesEvent("B", t(13)))
    q.processAllAvailable()
    val a1 = alerts()
    assert(a1.map(_.key) == Seq("A"))
    assert(a1.head.last_ts == t(0) && a1.head.silent_for_ms == 10_000L)

    // still silent: watermark to 25s -> A's re-armed 20s horizon fires
    input.addData(SeriesEvent("B", t(25)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(26)))
    q.processAllAvailable()
    val a2 = alerts().filter(_.key == "A")
    assert(a2.map(_.silent_for_ms) == Seq(10_000L, 20_000L))

    // A resumes at 27s: horizon resets to 37s; watermark to 36s -> no
    // new A alert (the old horizons are disarmed)
    input.addData(SeriesEvent("A", t(27)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(36)))
    q.processAllAvailable()
    assert(alerts().count(_.key == "A") == 2)

    // watermark past 37s -> A alerts again, against its NEW last-seen
    input.addData(SeriesEvent("B", t(38)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(39)))
    q.processAllAvailable()
    val a3 = alerts().filter(_.key == "A")
    assert(a3.size == 3)
    assert(a3.last.last_ts == t(27) && a3.last.silent_for_ms == 10_000L)

    // B never alerted: it reported within every gap window
    assert(alerts().forall(_.key == "A"))
    q.stop()
  }

  test("alerts replay identically from the same event sequence (event-time determinism)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def run(name: String): Seq[(String, Long, Long)] = {
      val input = MemoryStream[SeriesEvent]
      val q = StreamingGapDetect.alerts(
        input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5_000L)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      input.addData(SeriesEvent("X", t(0)), SeriesEvent("Y", t(1)))
      q.processAllAvailable()
      input.addData(SeriesEvent("Y", t(8)))
      q.processAllAvailable()
      input.addData(SeriesEvent("Y", t(20)))
      q.processAllAvailable()
      input.addData(SeriesEvent("Y", t(30)))
      q.processAllAvailable()
      val out = spark.table(name).as[GapAlert].collect().toSeq
        .map(a => (a.key, a.horizon_ts.getTime, a.silent_for_ms))
        .sorted
      q.stop()
      out
    }
    val r1 = run("gap_replay_1")
    val r2 = run("gap_replay_2")
    assert(r1 == r2 && r1.nonEmpty)
    // X silent since 0 with gap 5s: horizons 5,10,15,20,25 are all
    // candidates once the watermark reaches 30
    assert(r1.filter(_._1 == "X").map(_._3).forall(_ % 5000 == 0))
  }
}
