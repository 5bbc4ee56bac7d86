package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants from SURVEY §5.4: dedup idempotence,
  * ingest-twice ≡ once, last-writer-wins, pivot cardinality.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic property loop: 10 seeded samples per property
    * (scalatest/scalacheck bridge isn't on the offline classpath). */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i =>
      f(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  // (source_id, time-bucket, timemark) rows; small domains force collisions
  private val rowGen = Gen.listOfN(40, for {
    src <- Gen.choose(1L, 4L)
    t <- Gen.choose(0, 5)
    tm <- Gen.choose(0, 9)
    v <- Gen.choose(0, 1000)
  } yield (src, t, tm, v.toDouble))

  private def df(rows: List[(Long, Int, Int, Double)]) =
    rows.toDF("source_id", "t", "timemark", "v")

  test("property: keep-latest dedup is idempotent") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val d1 = KeepLatestDedup(df(rows), Seq("source_id", "t"),
          Seq(col("timemark"), col("v")))
        val d2 = KeepLatestDedup(d1, Seq("source_id", "t"),
          Seq(col("timemark"), col("v")))
        assert(d1.orderBy("source_id", "t").collect().toSeq ==
          d2.orderBy("source_id", "t").collect().toSeq)
      }
    }
  }

  test("property: ingesting a batch twice equals ingesting it once") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val once = KeepLatestDedup(df(rows), Seq("source_id", "t"),
          Seq(col("timemark"), col("v")))
        val twice = KeepLatestDedup(df(rows).unionByName(df(rows)),
          Seq("source_id", "t"), Seq(col("timemark"), col("v")))
        assert(once.orderBy("source_id", "t").collect().toSeq ==
          twice.orderBy("source_id", "t").collect().toSeq)
      }
    }
  }

  test("property: dedup keeps exactly the max-precedence row per key") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val got = KeepLatestDedup(df(rows), Seq("source_id", "t"),
          Seq(col("timemark"), col("v")))
          .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getDouble(3))).toMap
        val want = rows.groupBy(r => (r._1, r._2))
          .view.mapValues(g => g.map(r => (r._3, r._4)).max).toMap
        assert(got == want)
      }
    }
  }

  test("property: fixed pivot emits one row per distinct group and all category columns") {
    forAll(rowGen) { rows =>
      whenever(rows.nonEmpty) {
        val cats = Seq("1", "2", "3", "4", "9")   // 9 never occurs
        val p = FixedPivot(
          df(rows).withColumn("cat", col("source_id").cast("string")),
          Seq("t"), "cat", cats, sum(col("v")))
        assert(p.columns.toSeq == "t" +: cats)
        assert(p.count() == rows.map(_._2).distinct.length)
        assert(p.filter(col("9").isNotNull).count() == 0)
      }
    }
  }

  test("property: as-of join equals the naive range-join argmax") {
    val asofGen = for {
      lefts <- Gen.listOfN(25, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L)
      } yield (k, t))
      rights <- Gen.listOfN(15, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 20L); v <- Gen.choose(0, 99)
      } yield (k, t, v.toDouble))
    } yield (lefts, rights.distinctBy(r => (r._1, r._2)))   // unique (key, time)
    forAll(asofGen) { case (lefts, rights) =>
      whenever(lefts.nonEmpty && rights.nonEmpty) {
        val l = lefts.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
          .toDF("k", "t", "lid")
        val r = rights.toDF("k", "rt", "v")
        val got = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("rt", "v"))
          .collect()
          .map(x => x.getLong(x.fieldIndex("lid")) ->
            (if (x.isNullAt(x.fieldIndex("asof_v"))) None
             else Some((x.getLong(x.fieldIndex("asof_rt")), x.getDouble(x.fieldIndex("asof_v"))))))
          .toMap
        // naive reference: for each left row, the max-rt right row with
        // rt <= t and same key
        lefts.zipWithIndex.foreach { case ((k, t), i) =>
          val expect = rights.filter(rr => rr._1 == k && rr._2 <= t)
            .sortBy(_._2).lastOption.map(rr => (rr._2, rr._3))
          assert(got(i.toLong) == expect, s"k=$k t=$t")
        }
      }
    }
  }
}
