package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("salted inner join equals plain inner join, spreads the hot key") {
    // hot key: 90% of the large side is key 1
    val large = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (2L, i.toLong))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")

    val plain = large.join(small, "k")
    val salted = SaltedJoin.inner(large, small, "k", buckets = 8,
      discriminator = col("payload"))

    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

    // the hot key's rows actually split across salt buckets pre-join
    val saltDist = large.withColumn("s", pmod(xxhash64(col("payload")), lit(8)))
      .filter(col("k") === 1L).select("s").distinct().count()
    assert(saltDist > 4)
  }
}
