package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def semanticsCase(timeBuckets: Int): Unit = {
    val left = Seq(
      (1L, 5L, "a"),   // after rights at 3 and 5 → tie at 5 is INCLUSIVE
      (1L, 4L, "b"),   // between rights 3 and 5 → matches 3
      (1L, 2L, "c"),   // before every right row → null
      (2L, 9L, "d"))   // other key, only right at 7
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, Some(3L), 30.0),
      (1L, Some(5L), 50.0),
      (2L, Some(7L), 70.0),
      // NULL rightTime can never satisfy rt <= t — must be ignored, not
      // sorted first and carried into every row
      (1L, None, 99.0))
      .toDF("k", "rt", "v")

    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"),
      timeBuckets = timeBuckets)
      .orderBy("k", "t")
      .collect()

    val byTag = out.map(r => r.getAs[String]("tag") -> r).toMap
    assert(byTag("a").getAs[Double]("asof_v") == 50.0)   // tie includes rt == t
    assert(byTag("b").getAs[Double]("asof_v") == 30.0)
    assert(byTag("c").isNullAt(byTag("c").fieldIndex("asof_v")))
    assert(byTag("d").getAs[Double]("asof_v") == 70.0)
    // left columns pass through untouched
    assert(out.length == 4 && out.forall(_.schema.fieldNames.contains("tag")))
  }

  test("as-of join: latest prior right row per key, inclusive ties, null when none (two-phase default)") {
    semanticsCase(timeBuckets = 32)
  }

  test("as-of join: same semantics on the single-exchange plan") {
    semanticsCase(timeBuckets = 1)
  }

  test("as-of join: NULL left time matches nothing, every direction and plan shape") {
    val left = Seq((1L, Option.empty[Long], "nul"), (1L, Some(4L), "ok"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 3L, 30.0), (1L, 6L, 60.0)).toDF("k", "rt", "v")
    for (dir <- Seq("backward", "forward", "nearest");
         buckets <- Seq(1, 32)) {
      val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
        timeBuckets = buckets, direction = dir).collect()
        .map(r => r.getAs[String]("tag") ->
          (if (r.isNullAt(r.fieldIndex("asof_v"))) None
           else Some(r.getAs[Double]("asof_v")))).toMap
      assert(out("nul").isEmpty,
        s"null left time matched in direction=$dir buckets=$buckets: $out")
      val expectOk = dir match {
        case "backward" => 30.0
        case _ => 60.0 // forward: 6; nearest: |4-3|=1 vs |6-4|=2 -> 30.0!
      }
      val want = if (dir == "nearest") 30.0 else expectOk
      assert(out("ok").contains(want),
        s"direction=$dir buckets=$buckets got ${out("ok")}")
    }
  }

  test("as-of join: NULL keys never match, on either side") {
    val left = Seq(
      (Some(1L), 5L, "a"),
      (None, 5L, "n"))     // null key — must NOT pick up the null-key right row
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), 3L, 30.0),
      (None, 2L, 99.0))    // null-key right row matches nothing
      .toDF("k", "rt", "v")
    for (buckets <- Seq(1, 32)) {
      val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
        timeBuckets = buckets).collect()
      val byTag = out.map(r => r.getAs[String]("tag") -> r).toMap
      assert(byTag("a").getAs[Double]("asof_v") == 30.0)
      assert(byTag("n").isNullAt(byTag("n").fieldIndex("asof_v")),
        s"null-key left row matched with timeBuckets=$buckets")
    }
  }

  test("as-of join: timeBuckets=1 plan has exactly one exchange (no range explosion)") {
    val left = (1L to 100L).map(i => (i % 5, i)).toDF("k", "t")
    val right = (1L to 50L).map(i => (i % 5, i, i * 1.0)).toDF("k", "rt", "v")
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
      timeBuckets = 1)
    assert(out.count() == 100)
    val plan = out.queryExecution.executedPlan.toString
    // one shuffle on the key for the union+window; no join node at all
    assert(!plan.contains("Join"))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2)
  }

  test("as-of join: a dominant key is processed by more than one task") {
    // 10:1 skew onto key 1 — the round-2 hazard was the whole hot key
    // sorting inside ONE window task. Inputs MUST be file-backed: the
    // optimizer folds an all-LocalRelation pipeline to a driver-side
    // LocalRelation, which would evaluate spark_partition_id() as a
    // constant 0 and void the assertion.
    val dir = java.nio.file.Files.createTempDirectory("asof_skew").toString
    ((1L to 600L).map(t => (1L, t)) ++
      (1L to 60L).map(t => (2L, t))).toDF("k", "t")
      .write.mode("overwrite").parquet(s"$dir/left")
    ((1L to 1000L by 3).map(t => (1L, t, t * 1.0)) ++
      (1L to 60L by 3).map(t => (2L, t, t * 1.0))).toDF("k", "rt", "v")
      .write.mode("overwrite").parquet(s"$dir/right")
    val left = spark.read.parquet(s"$dir/left")
    val right = spark.read.parquet(s"$dir/right")

    // AQE would legitimately coalesce these toy-sized shuffle partitions
    // back into one; at real scale they stay separate. Pin it off so the
    // assertion measures the partitioning function, not the data size.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val before = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
        timeBuckets = 8)
      // No shuffle after the (k, __b) window (broadcast join + project
      // preserve partitioning), so spark_partition_id() on the result IS
      // the window task that processed each row.
      val hotTasks = out.withColumn("pid", spark_partition_id())
        .filter(col("k") === 1L)
        .agg(countDistinct(col("pid")).as("n")).head().getLong(0)
      assert(hotTasks > 1, s"hot key confined to $hotTasks window task(s)")

      // and the window itself is keyed by (k, __b), not k alone.
      // (String match: AdaptiveSparkPlanExec hides the final plan from
      // TreeNode.collect, but prints it.)
      val planStr = out.queryExecution.executedPlan.toString
      assert("windowspecdefinition\\(k#\\d+L?, __b#\\d+, __t".r
        .findFirstIn(planStr).isDefined,
        s"no (key, bucket) window in plan:\n$planStr")

      // correctness under skew vs the naive argmax reference
      val got = out.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getDouble(r.fieldIndex("asof_v"))))).toMap
      val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      left.collect().foreach { lr =>
        val (k, t) = (lr.getLong(0), lr.getLong(1))
        val expect = rights.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got((k, t)) == expect, s"k=$k t=$t")
      }
    } finally spark.conf.set(coalesceKey, before)
  }

  test("forward as-of: earliest later right row, inclusive ties, null when none") {
    val left = Seq(
      (1L, 5L, "a"),   // rights at 5 and 8 → tie at 5 is INCLUSIVE
      (1L, 6L, "b"),   // between 5 and 8 → matches 8
      (1L, 9L, "c"),   // after every right row → null
      (2L, 3L, "d"))   // other key, only right at 7
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, Some(5L), 50.0),
      (1L, Some(8L), 80.0),
      (2L, Some(7L), 70.0),
      (1L, None, 99.0)) // NULL rightTime can never satisfy rt >= t
      .toDF("k", "rt", "v")
    for (buckets <- Seq(1, 32)) {
      val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
        timeBuckets = buckets, direction = "forward").collect()
      val byTag = out.map(r => r.getAs[String]("tag") -> r).toMap
      assert(byTag("a").getAs[Double]("asof_v") == 50.0, s"buckets=$buckets")
      assert(byTag("b").getAs[Double]("asof_v") == 80.0)
      assert(byTag("c").isNullAt(byTag("c").fieldIndex("asof_v")))
      assert(byTag("d").getAs[Double]("asof_v") == 70.0)
    }
  }

  test("nearest as-of: closer side wins, exact tie resolves backward") {
    val left = Seq(
      (1L, 4L, "backNearer"),   // rights at 3 and 8: back dist 1 < fwd 4
      (1L, 7L, "fwdNearer"),    // back dist 4 > fwd 1
      (1L, 1L, "onlyFwd"),      // nothing before → forward match
      (1L, 9L, "onlyBack"),     // nothing after → backward match
      (2L, 6L, "tie"))          // rights at 4 and 8: dist 2 both → backward
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 3L, 30.0), (1L, 8L, 80.0),
      (2L, 4L, 40.0), (2L, 8L, 80.0))
      .toDF("k", "rt", "v")
    for (buckets <- Seq(1, 32)) {
      val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"),
        timeBuckets = buckets, direction = "nearest").collect()
      val byTag = out.map(r => r.getAs[String]("tag") -> r).toMap
      assert(byTag("backNearer").getAs[Double]("asof_v") == 30.0, s"buckets=$buckets")
      assert(byTag("fwdNearer").getAs[Double]("asof_v") == 80.0)
      assert(byTag("onlyFwd").getAs[Double]("asof_v") == 30.0)
      assert(byTag("onlyBack").getAs[Double]("asof_v") == 80.0)
      assert(byTag("tie").getAs[Double]("asof_v") == 40.0)
    }
  }

  test("forward/nearest match a naive reference on dense random-ish data") {
    // deterministic pseudo-random fixture: every (key, time) pattern the
    // window formulation must get right, checked against brute force
    val lefts = (0 until 120).map(i => (i % 5L, (i * 7 % 40).toLong, i.toLong))
    val rights = (0 until 60).map(i => (i % 5L, (i * 11 % 40).toLong, 100L + i))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique (k, rt)
    val l = lefts.toDF("k", "t", "lid")
    val r = rights.toDF("k", "rt", "rid")
    for (direction <- Seq("backward", "forward", "nearest"); buckets <- Seq(1, 8)) {
      val got = AsOfJoin(l, r, Seq("k"), "t", "rt", Seq("rid"),
        timeBuckets = buckets, direction = direction).collect()
        .map(row => row.getLong(row.fieldIndex("lid")) ->
          (if (row.isNullAt(row.fieldIndex("asof_rid"))) None
           else Some(row.getLong(row.fieldIndex("asof_rid"))))).toMap
      lefts.foreach { case (k, t, lid) =>
        val cand = rights.filter(_._1 == k)
        val back = cand.filter(_._2 <= t).sortBy(c => (c._2, c._3)).lastOption
        val fwd = cand.filter(_._2 >= t).sortBy(c => (c._2, -c._3)).headOption
        val expect = direction match {
          case "backward" => back.map(_._3)
          case "forward" => fwd.map(_._3)
          case "nearest" => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (t - b._2 <= f._2 - t) Some(b._3) else Some(f._3)
            case (b, f) => b.orElse(f).map(_._3)
          }
        }
        assert(got(lid) == expect, s"dir=$direction buckets=$buckets k=$k t=$t")
      }
    }
  }
}
