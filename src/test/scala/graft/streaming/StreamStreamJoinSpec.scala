package graft.streaming

import graft.SparkSuite
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

case class PurchaseEv(user_id: Long, purchase_id: Long, ts: Timestamp)
case class ClickEv(user_id: Long, click_id: Long, cts: Timestamp)

class StreamStreamJoinSpec extends SparkSuite {

  // offset every event off epoch 0: the initial global watermark IS 0,
  // and Spark's late filter drops rows with eventTime <= watermark, so
  // a legitimate epoch-0 row would be "late" before any data arrived
  private def t(sec: Long) = new Timestamp((sec + 100000) * 1000L)

  test("streaming time-bounded join emits exactly the batch join result") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val purchases = Seq(
      PurchaseEv(1, 100, t(3600)), PurchaseEv(1, 101, t(7200)),
      PurchaseEv(2, 200, t(3600)), PurchaseEv(3, 300, t(500)))
    val clicks = Seq(
      ClickEv(1, 10, t(3599)),  // 1s before purchase 100 -> matches 100 only
      ClickEv(1, 11, t(1)),     // 3599s before 100 -> inside 1h bound
      ClickEv(1, 12, t(3601)),  // after 100, 3599s before 101 -> matches 101
      ClickEv(1, 13, t(7200)),  // exactly at 101 -> inclusive upper bound
      ClickEv(2, 20, t(0)),     // exactly 3600s before 200 -> inclusive lower
      ClickEv(2, 21, t(3700)),  // after purchase -> no match
      ClickEv(3, 30, t(501)))   // 1s AFTER purchase 300 -> no match

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = pairs(StreamStreamJoin.timeBounded(
      purchases.toDF(), clicks.toDF(), Seq("user_id"), "ts", "cts",
      lowerSec = -3600, upperSec = 0))
    assert(batch == Set((100L, 10L), (100L, 11L), (101L, 12L), (101L, 13L), (200L, 20L)))

    val pIn = MemoryStream[PurchaseEv]
    val cIn = MemoryStream[ClickEv]
    val q = StreamStreamJoin.timeBounded(
      pIn.toDF(), cIn.toDF(), Seq("user_id"), "ts", "cts",
      lowerSec = -3600, upperSec = 0, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // clicks arrive a whole batch before any purchase: they must
      // buffer in join state (the global watermark stays 0 until BOTH
      // sides have seen data, so nothing is evicted early) and match
      // when the purchases land in the next batch
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      assert(pairs(spark.table("ssj_out")) == batch)

      // state eviction: advance both watermarks far past the window,
      // then a click older than (watermark - horizon) must NOT match
      // even though a matching purchase arrives with it
      pIn.addData(PurchaseEv(9, 900, t(100000)))
      cIn.addData(ClickEv(9, 90, t(100000)))
      q.processAllAvailable()
      pIn.addData(PurchaseEv(1, 150, t(3600)))   // behind watermark
      cIn.addData(ClickEv(1, 15, t(3599)))       // behind watermark
      q.processAllAvailable()
      val after = pairs(spark.table("ssj_out"))
      assert(after.contains((900L, 90L)))
      assert(!after.contains((150L, 15L)), "late rows must be dropped, not joined")
    } finally q.stop()
  }
}
