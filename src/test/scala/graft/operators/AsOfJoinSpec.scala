package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("as-of join: latest prior right row per key, inclusive ties, null when none") {
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

    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
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

  test("as-of join: plan has exactly one exchange (no range explosion)") {
    val left = (1L to 100L).map(i => (i % 5, i)).toDF("k", "t")
    val right = (1L to 50L).map(i => (i % 5, i, i * 1.0)).toDF("k", "rt", "v")
    val out = AsOfJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() == 100)
    val plan = out.queryExecution.executedPlan.toString
    // one shuffle on the key for the union+window; no join node at all
    assert(!plan.contains("Join"))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2)
  }
}
