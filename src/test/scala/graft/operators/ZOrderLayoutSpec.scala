package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits exactly (Morton order)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
      .select(ZOrderLayout.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit b of x lands at position 2b, bit b of y at 2b+1
    // (x,y): (0,0)->0 (1,0)->1 (0,1)->2 (3,0)->0b0101=5 (0,3)->0b1010=10
    //        (3,3)->15 (2,1)->0b0110=6
    assert(rows == Seq(0L, 1L, 2L, 5L, 10L, 15L, 6L))
  }

  test("z-order layout tightens per-file min/max on BOTH dimensions") {
    // two independent uniform dimensions — the case a single sort key
    // cannot cluster
    val n = 4096
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 10007L), ((i * 40503L) % 9973L))
    }.toDF("a", "b").cache()
    val files = 8

    def spreads(laid: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("zorder").toString
      laid.write.mode("overwrite").parquet(dir)
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .agg(avg("sa"), avg("sb")).collect().head
      (stats.getDouble(0), stats.getDouble(1))
    }

    // baseline: single-key sort layout — second dimension unclustered
    val (sortA, sortB) = spreads(
      df.repartitionByRange(files, col("a")).sortWithinPartitions("a"))
    // z-order: both dimensions clustered
    val (zA, zB) = spreads(ZOrderLayout.layout(df, Seq("a", "b"), bits = 3, files))

    assert(sortA < 0.3 * 10007)          // sanity: sort clusters its own key
    assert(sortB > 0.9 * 9973)           // ... and leaves the other dim full-range
    // z-order keeps BOTH dims well under full range in every file
    assert(zA < 0.6 * 10007, s"zA spread $zA")
    assert(zB < 0.6 * 9973, s"zB spread $zB")
    // and the layout is a pure permutation: nothing lost or duplicated
    val laid = ZOrderLayout.layout(df, Seq("a", "b"), 3, files)
    assert(laid.count() == n)
    assert(laid.select("a", "b").distinct().count() ==
      df.select("a", "b").distinct().count())
  }

  test("single-dimension layout is an exact range sort (strings supported)") {
    val urls = (0 until 256).map(i => f"u://h/${(i * 131) % 256}%03d")
    val laid = ZOrderLayout.layout(urls.toDF("url"), Seq("url"), 6, 4)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    laid.write.mode("overwrite").parquet(dir)
    // per-file [min, max] string ranges are DISJOINT — the exact-sort
    // property bucket-granular z-ordering cannot give; that is what
    // makes SnapshotTable string stats prune a point lookup to 1 file
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("url").as("lo"), max("url").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlap: $hi1 vs $lo2")
    }
    assert(laid.count() == 256)
  }

  test("multi-dimension layout clusters a string dim alongside a numeric one") {
    val n = 4096
    val df = (0 until n).map { i =>
      (f"k${(i * 2654435761L) % 997L}%04d", (i * 40503L) % 9973L)
    }.toDF("s", "b").cache()
    val laid = ZOrderLayout.layout(df, Seq("s", "b"), bits = 3, numFiles = 8)
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    laid.write.mode("overwrite").parquet(dir)
    // both the string dim (compare distinct-values-per-file against
    // the global distinct count) and the numeric dim stay clustered
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(countDistinct("s").as("ds"), (max("b") - min("b")).as("sb"))
      .agg(avg("ds"), avg("sb")).collect().head
    val globalDistinct = df.select("s").distinct().count().toDouble
    assert(stats.getDouble(0) < 0.6 * globalDistinct,
      s"string dim unclustered: ${stats.getDouble(0)} of $globalDistinct")
    assert(stats.getDouble(1) < 0.6 * 9973, s"numeric dim ${stats.getDouble(1)}")
    assert(laid.count() == n)
  }
}
