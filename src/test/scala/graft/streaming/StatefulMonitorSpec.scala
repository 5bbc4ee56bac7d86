package graft.streaming

import graft.SparkSuite
import StatefulMonitor._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StatefulMonitorSpec extends SparkSuite {

  test("flatMapGroupsWithState: state persists across micro-batches, jump detection fires") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Reading]
    val q = StatefulMonitor.monitor(input.toDS(), threshold = 1.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("monitor_out")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1: two stations, smooth readings
    input.addData(Reading("A", 1L, 1.00), Reading("A", 2L, 1.10), Reading("B", 1L, 5.00))
    q.processAllAvailable()
    val b1 = spark.table("monitor_out").as[MonitorOut].collect()
      .map(o => o.station -> o).toMap
    assert(b1("A").n == 2 && !b1("A").jumped && b1("A").last == 1.10)
    assert(b1("B").n == 1 && !b1("B").jumped)   // first reading never jumps

    // batch 2: A spikes (state carried: 1.10 -> 9.0 across batches)
    input.addData(Reading("A", 3L, 9.00))
    q.processAllAvailable()
    val b2 = spark.table("monitor_out").as[MonitorOut].collect()
      .filter(_.n == 3)
    assert(b2.length == 1 && b2(0).station == "A" &&
      b2(0).jumped && b2(0).max_jump == 7.90)
    q.stop()
  }
}
