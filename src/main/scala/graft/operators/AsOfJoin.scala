package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the time-series join Spark has no native operator for:
  * every left row picks up the LATEST right row with
  * `rightTime <= leftTime` and equal keys (left join semantics: no
  * prior right row → null payload).
  *
  * Shape: tag both sides, union them, ONE shuffle on the key, then a
  * per-key ordered window carries the last-seen right payload forward
  * (`last(ignoreNulls)` over preceding rows). Right rows sort before
  * left rows at equal timestamps, which yields the inclusive `<=`
  * contract. Versus the naive formulation (range join left×right on
  * `r.t <= l.t` + argmax per left row): no range explosion — cost is
  * one sort of |L|+|R| within each key bucket, which is the shape a
  * 100 TB backfill needs. AQE's skew handling applies to the single
  * exchange; a hot key can additionally be pre-split by time range.
  *
  * The right side must be UNIQUE per (keys, rightTime) — pre-aggregate
  * it — otherwise which duplicate wins is tie-dependent.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], payloadPrefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct(payloadCols.map(col): _*)
    val leftType = StructType(left.schema.fields)
    // a NULL rightTime can never satisfy `rightTime <= leftTime`, but
    // would sort FIRST (nulls-first ascending) and become every row's
    // carried payload — exclude it up front
    val r0 = right.filter(col(rightTime).isNotNull).select(
      (keyCols :+ col(rightTime).as("__t") :+ payload.as("__p") :+
        lit(0).as("__side")): _*)
    val r = r0.withColumn("__l", lit(null).cast(leftType))
    val l = left.select(
      (keyCols :+ col(leftTime).as("__t") :+
        lit(null).cast(r0.schema("__p").dataType).as("__p") :+
        lit(1).as("__side") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      payloadCols.map(c => col(s"__m.$c").as(payloadPrefix + c))
    matched.select(outCols.toSeq: _*)
  }
}
