package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SkewProfileSpec extends SparkSuite {
  import spark.implicits._

  test("keySkewProfile reads a hot key's straggler multiplier") {
    // one key with 90 rows, ten keys with 1 row each
    val df = ((1 to 90).map(_ => "hot") ++ (1 to 10).map(i => s"k$i"))
      .toDF("k")
    val p = SkewProfile.keySkewProfile(df, Seq("k")).collect().head
    assert(p.getAs[Long]("n_keys") == 11L)
    assert(p.getAs[Long]("n_rows") == 100L)
    assert(p.getAs[Long]("max_rows") == 90L)
    assert(p.getAs[Double]("p50") == 1.0)
    assert(p.getAs[Double]("top_share") == 0.9)
    assert(p.getAs[Double]("straggler_ratio") == 90.0)
  }

  test("partitionBalance is exhaustive, ppm-consistent, and repartition-stable") {
    val df = (0L until 4096L).toDF("id")
    val out = SkewProfile.partitionBalance(df, Seq(col("id")), buckets = 16)
      .collect()
    assert(out.map(_.getInt(0)).toSet == (0 until 16).toSet)
    assert(out.map(_.getLong(1)).sum == 4096L)
    // integer ppm: each share is exactly n*1e6 div total
    out.foreach(r =>
      assert(r.getLong(2) == r.getLong(1) * 1000000L / 4096L))
    // md5 spreads a sequential key: no bucket above 2x the mean
    assert(out.map(_.getLong(1)).max < 2 * 4096 / 16)
    val again = SkewProfile.partitionBalance(df.repartition(7),
      Seq(col("id")), buckets = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == out.map(r => r.getInt(0) -> r.getLong(1)).toMap)
  }
}
