package graft.operators

import graft.SparkSuite
import graft.similarity.HybridRetrieval
import graft.text.Curation
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the timeseries / curation /
  * retrieval operators added this round — randomized inputs with
  * deterministic seeds, checking structural laws no fixed example
  * pins: island disjointness and coverage, LOCF prefix stability,
  * bin monotonicity, sample nesting, fusion rank consistency.
  */
class TimeseriesPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (1 to 10).foreach { i =>
      f(gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // random per-key intervals over a small domain (forces overlaps)
  private val intervalsGen = Gen.listOfN(30, for {
    k <- Gen.choose(1L, 3L)
    s <- Gen.choose(0L, 40L)
    len <- Gen.choose(1L, 10L)
  } yield (k, s, s + len))

  test("property: merged islands are disjoint, ordered, and cover every interval") {
    forAll(intervalsGen) { rows =>
      val df = rows.map { case (k, s, e) => (k, ts(s), ts(e)) }
        .toDF("k", "s0", "e0")
      val islands = Timeseries.mergeIntervals(df, Seq("k"), "s0", "e0")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3)))
      // per key: strictly separated (gap > 0 between islands), and the
      // interval count adds up
      islands.groupBy(_._1).foreach { case (_, is) =>
        val sorted = is.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 < b._2, s"islands touch: $a $b")
          case _ =>
        }
      }
      assert(islands.map(_._4).sum == rows.size)
      // every input interval is inside exactly one island of its key
      rows.foreach { case (k, s, e) =>
        val homes = islands.filter(i => i._1 == k && i._2 <= s && e <= i._3)
        assert(homes.length == 1, s"($k,$s,$e) in ${homes.length} islands")
      }
    }
  }

  private val obsGen = Gen.listOfN(25, for {
    k <- Gen.choose(1L, 2L)
    hour <- Gen.choose(0L, 30L)
    minute <- Gen.choose(0L, 59L)
    eid <- Gen.choose(1L, 1000L)
    v <- Gen.choose(0, 1000)
  } yield (k, hour * 3600 + minute * 60, eid, v.toDouble))

  test("property: LOCF output is null-free after the first obs and is_obs marks exactly the observed buckets") {
    forAll(obsGen) { rows =>
      val df = rows.map { case (k, s, eid, v) => (k, ts(s), eid, v) }
        .toDF("k", "ts", "eid", "v")
      val out = Timeseries.gapFillLocf(df, Seq("k"), "ts", "eid", "v")
        .orderBy("k", "bucket").collect()
      out.groupBy(_.getLong(0)).foreach { case (k, buckets) =>
        // grid is contiguous hourly
        val hrs = buckets.map(_.getTimestamp(1).getTime / 3600000)
        assert(hrs.zip(hrs.drop(1)).forall { case (a, b) => b == a + 1 })
        // first bucket has an obs (grid starts at first obs); value
        // never null from there on
        assert(buckets.head.getBoolean(2))
        assert(buckets.forall(!_.isNullAt(3)))
      }
      val observedHours = rows.groupBy { case (k, s, _, _) => (k, s / 3600) }.keySet
      val flagged = out.filter(_.getBoolean(2))
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 3600000)).toSet
      assert(flagged == observedHours)
    }
  }

  private val valuesGen = Gen.listOfN(60, Gen.choose(0L, 500L))

  test("property: quantileBins keeps every row, bounded bins, monotone in value") {
    forAll(valuesGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val out = Curation.quantileBins(df, "v", 4).collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(out.length == vs.size)
      // monotone: higher value never lands in a lower bin
      val sorted = out.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 <= b._2)
        case _ =>
      }
      assert(out.map(_._2).forall(b => b >= 0 && b <= 3))
    }
  }

  test("property: exactKPerStratum samples nest as k grows") {
    forAll(Gen.choose(1, 8)) { k =>
      val df = (0L until 120L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
      val small = Curation.exactKPerStratum(df, col("source"), col("doc_id"), k)
        .collect().map(_.getLong(0)).toSet
      val big = Curation.exactKPerStratum(df, col("source"), col("doc_id"), k + 3)
        .collect().map(_.getLong(0)).toSet
      assert(small.subsetOf(big))
      assert(small.size == 4 * k)
    }
  }

  private val rankListGen = Gen.listOfN(12, for {
    q <- Gen.choose(1L, 2L)
    n <- Gen.choose(10L, 30L)
  } yield (q, n))

  test("property: rrfFuse ranks are dense per query and scores decrease along them") {
    forAll(rankListGen) { pairs =>
      def arm(ps: Seq[(Long, Long)]) = ps.distinct.groupBy(_._1).toSeq
        .flatMap { case (q, xs) =>
          xs.map(_._2).distinct.zipWithIndex.map { case (nb, i) =>
            (q, nb, (i + 1).toLong)
          }
        }.toDF("query_id", "neighbor_id", "rank")
      val (a, b) = pairs.splitAt(pairs.size / 2)
      val fused = HybridRetrieval.rrfFuse(arm(a), arm(b), k = 100).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(5)))
      fused.groupBy(_._1).foreach { case (_, rows) =>
        val byRank = rows.sortBy(_._3)
        assert(byRank.map(_._3).toSeq == (1L to byRank.size).toSeq)
        byRank.sliding(2).foreach {
          case Array(x, y) => assert(x._2 >= y._2, "score must not rise with rank")
          case _ =>
        }
      }
    }
  }
}
