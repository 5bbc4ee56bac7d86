package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each entity,
  * the earliest chain of `steps` where every step STRICTLY follows the
  * previous one and the whole chain fits inside `windowUs` microseconds
  * of step 1 — the standard product-analytics conversion funnel.
  *
  * Semantics are greedy-earliest (t1 = first step-1 event; each next
  * step = first qualifying event after the previous): the semantics
  * correlated-min SQL expresses, identical in the DuckDB oracle. Note
  * greedy is not maximal-match — a later step-1 occurrence could
  * complete a funnel the earliest one misses; that variant needs a
  * per-entity sequential scan (`flatMapGroups`) and is out of scope.
  *
  * Scale shape: k−1 left equi-joins, ALL keyed on the entity — after
  * the first exchange every later join and aggregate reuses the same
  * hash partitioning (no re-shuffle; Catalyst sees the co-partitioned
  * children), and each step's input is a filtered scan of the event
  * stream, never the full table twice. Time comparisons run in integer
  * microseconds (`unix_micros`) end to end.
  */
object Funnel {

  def funnel(events: DataFrame, steps: Seq[String], windowUs: Long,
      entityCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(s1) { case (acc, (st, i)) =>
      val se = events.filter(col(typeCol) === st)
        .select(col(entityCol).as("__e"), col(tsCol).as("__ts"))
      val cond = col(entityCol) === col("__e") &&
        col("__ts") > col(s"t$i") &&
        (unix_micros(col("__ts")) - unix_micros(col("t1"))) <= windowUs
      val keep: Seq[Column] = col(entityCol) +: (1 to i).map(j => col(s"t$j"))
      acc.join(se, cond, "left")
        .groupBy(keep: _*)
        .agg(min(col("__ts")).as(s"t${i + 1}"))
    }
    val completed = (2 to steps.size)
      .map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    val out: Seq[Column] = Seq(col(entityCol), completed.as("steps_completed")) ++
      (1 to steps.size).map(i => col(s"t$i"))
    full.select(out: _*)
  }
}
