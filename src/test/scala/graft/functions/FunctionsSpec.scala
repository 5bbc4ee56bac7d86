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
