package graft.streaming

import graft.SparkSuite
import StreamingGapDetect._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingGapDetectSpec extends SparkSuite {

  // times start at 10s: a row AT the initial watermark (0) would be
  // dropped by the standard late-data filter before the operator
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

    // A and B both report at t=10; B keeps reporting, A goes silent
    input.addData(SeriesEvent("A", t(10)), SeriesEvent("B", t(10)))
    q.processAllAvailable()
    assert(alerts().isEmpty) // watermark at 10: nobody is late yet

    // B reports at 22s -> watermark reaches 22s, past A's 20s horizon;
    // timers evaluate against the PREVIOUS batch's watermark, so one
    // more row makes the 22s watermark effective
    input.addData(SeriesEvent("B", t(22)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(23)))
    q.processAllAvailable()
    val a1 = alerts()
    assert(a1.map(_.key) == Seq("A"))
    assert(a1.head.last_ts == t(10) && a1.head.silent_for_ms == 10_000L)

    // still silent: watermark to 35s -> A's re-armed 30s horizon fires
    input.addData(SeriesEvent("B", t(35)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(36)))
    q.processAllAvailable()
    val a2 = alerts().filter(_.key == "A")
    assert(a2.map(_.silent_for_ms) == Seq(10_000L, 20_000L))

    // A resumes at 37s: horizon resets to 47s; watermark to 46s -> no
    // new A alert (the old horizons are disarmed)
    input.addData(SeriesEvent("A", t(37)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(46)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(46)))
    q.processAllAvailable()
    assert(alerts().count(_.key == "A") == 2)

    // watermark past 47s -> A alerts again, against its NEW last-seen
    input.addData(SeriesEvent("B", t(48)))
    q.processAllAvailable()
    input.addData(SeriesEvent("B", t(49)))
    q.processAllAvailable()
    val a3 = alerts().filter(_.key == "A")
    assert(a3.size == 3)
    assert(a3.last.last_ts == t(37) && a3.last.silent_for_ms == 10_000L)

    // B never alerted: it reported within every gap window
    assert(alerts().forall(_.key == "A"))
    q.stop()
  }

  test("a watermark jump emits one alert per elapsed gap (batching-independent catch-up)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def run(name: String, batches: Seq[Seq[SeriesEvent]]): Seq[(String, Long, Long)] = {
      val input = MemoryStream[SeriesEvent]
      val q = StreamingGapDetect.alerts(
        input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5_000L)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val out = spark.table(name).as[GapAlert].collect().toSeq
        .map(a => (a.key, a.horizon_ts.getTime, a.silent_for_ms))
        .sorted
      q.stop()
      out
    }
    // X reports once at 10s then never again; Y drives the watermark
    // to 40s — fine-grained in run 1, one big jump in run 2
    val fine = Seq(
      Seq(SeriesEvent("X", t(10)), SeriesEvent("Y", t(11))),
      Seq(SeriesEvent("Y", t(18))),
      Seq(SeriesEvent("Y", t(30))),
      Seq(SeriesEvent("Y", t(40))),
      Seq(SeriesEvent("Y", t(41))))
    val jump = Seq(
      Seq(SeriesEvent("X", t(10)), SeriesEvent("Y", t(11))),
      Seq(SeriesEvent("Y", t(40))),
      Seq(SeriesEvent("Y", t(41))))
    val r1 = run("gap_replay_1", fine)
    val r2 = run("gap_replay_2", jump)
    val x1 = r1.filter(_._1 == "X")
    // X silent since 10s, gap 5s, watermark reached 40s: horizons
    // 15..40 -> silent_for 5,10,15,20,25,30 s
    assert(x1.map(_._3) == Seq(5_000L, 10_000L, 15_000L, 20_000L, 25_000L, 30_000L))
    // identical alert set no matter how the watermark advanced
    assert(r1.filter(_._1 == "X") == r2.filter(_._1 == "X"))
    // Y kept reporting within the gap: no Y alerts in either run
    assert(r1.forall(_._1 == "X") && r2.forall(_._1 == "X"))
  }

  test("a resume one batch after the clock advance still yields the elapsed alerts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // X@10 (gap 5s) goes silent; Y@40 advances the clock; X resumes in
    // the NEXT batch. The timeout path never fires for a key with data
    // in the batch — the data-branch catch-up must emit 15..40 anyway.
    val input = MemoryStream[SeriesEvent]
    val q = StreamingGapDetect.alerts(
      input.toDS().withWatermark("ts", "0 seconds"), gapMs = 5_000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_resume")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    input.addData(SeriesEvent("X", t(10)), SeriesEvent("Y", t(11)))
    q.processAllAvailable()
    input.addData(SeriesEvent("Y", t(40)))
    q.processAllAvailable()
    input.addData(SeriesEvent("X", t(41)))   // resume; wm is now 40
    q.processAllAvailable()
    val xs = spark.table("gap_resume").as[GapAlert].collect().toSeq
      .filter(_.key == "X").sortBy(_.horizon_ts.getTime)
    assert(xs.map(_.silent_for_ms) ==
      Seq(5_000L, 10_000L, 15_000L, 20_000L, 25_000L, 30_000L))
    assert(xs.forall(_.last_ts == t(10)))
    // and the reset took: the next alert (if any) measures from 41s
    input.addData(SeriesEvent("Y", t(47)))
    q.processAllAvailable()
    input.addData(SeriesEvent("Y", t(48)))
    q.processAllAvailable()
    val after = spark.table("gap_resume").as[GapAlert].collect().toSeq
      .filter(_.key == "X").sortBy(_.horizon_ts.getTime)
    assert(after.size == 7 && after.last.last_ts == t(41) &&
      after.last.silent_for_ms == 5_000L)
    q.stop()
  }
}
