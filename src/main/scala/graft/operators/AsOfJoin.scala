package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join — the time-series join Spark has no native operator for:
  * every left row picks up the LATEST right row with
  * `rightTime <= leftTime` and equal keys (left join semantics: no
  * prior right row → null payload; a NULL key matches nothing, as in
  * an equality join and DuckDB's native ASOF JOIN).
  *
  * Shape: tag both sides, union them, shuffle once on the key, then a
  * per-key ordered window carries the last-seen right payload forward
  * (`last(ignoreNulls)` over preceding rows). Right rows sort before
  * left rows at equal timestamps, which yields the inclusive `<=`
  * contract. Versus the naive formulation (range join left×right on
  * `r.t <= l.t` + argmax per left row): no range explosion — cost is
  * one sort of |L|+|R| within each partition bucket.
  *
  * Skew: a window exchange gets NO help from AQE (AQE's skew
  * mitigation splits skewed partitions in sort-merge JOINs only), so
  * with a single per-key window one hot key would put |L|+|R| rows of
  * that key through one task's sort. The default two-phase form
  * (`timeBuckets` > 1) pre-splits every key by a coarse time bucket:
  *
  *   1. window within (keys, bucket) — the hot key's rows spread over
  *      up to `timeBuckets` tasks;
  *   2. per-(keys, bucket) summary = latest right payload in the
  *      bucket (one `max_by` aggregate, map-side combinable);
  *   3. a second window over the per-bucket summaries (rows = #keys ×
  *      #buckets, tiny) computes each bucket's carry-in = last right
  *      payload from any PRIOR bucket;
  *   4. broadcast the carry table back onto (keys, bucket);
  *      payload = coalesce(in-bucket match, carry-in).
  *
  * Bucket ids come from a monotone map of the time column onto
  * [0, timeBuckets) using global min/max bounds (one cheap agg pass);
  * monotonicity is all correctness needs — equal times always land in
  * the same bucket, so the inclusive-tie contract survives the split.
  * `timeBuckets = 1` selects the single-exchange plan (right when keys
  * are known well-distributed and the extra agg pass isn't worth it).
  *
  * The right side must be UNIQUE per (keys, rightTime) — pre-aggregate
  * it — otherwise which duplicate wins is tie-dependent.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], payloadPrefix: String = "asof_",
      timeBuckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    val payload = struct(payloadCols.map(col): _*)
    val leftType = StructType(left.schema.fields)
    // a NULL rightTime can never satisfy `rightTime <= leftTime`, but
    // would sort FIRST (nulls-first ascending) and become every row's
    // carried payload — exclude it up front. A NULL key right row can
    // never match either (NULL = NULL is not a match), but
    // Window.partitionBy groups null keys into one partition, so it
    // must also be excluded or it would pair with null-key left rows.
    val rightKeep = keys.map(col(_).isNotNull)
      .foldLeft(col(rightTime).isNotNull)(_ && _)
    val r0 = right.filter(rightKeep).select(
      (keyCols :+ col(rightTime).as("__t") :+ payload.as("__p") :+
        lit(0).as("__side")): _*)
    val r = r0.withColumn("__l", lit(null).cast(leftType))
    val l = left.select(
      (keyCols :+ col(leftTime).as("__t") :+
        lit(null).cast(r0.schema("__p").dataType).as("__p") :+
        lit(1).as("__side") :+
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l")): _*)
    val u = r.unionByName(l)

    val matched = timeOrdinal(u.schema("__t").dataType) match {
      case Some(ord) if timeBuckets > 1 =>
        // One agg pass for the bucket bounds. Exact bounds aren't
        // required for correctness (any monotone map works); they just
        // spread the buckets evenly.
        val bounds = u.agg(min(ord(col("__t"))).as("mn"),
          max(ord(col("__t"))).as("mx")).head()
        if (bounds.isNullAt(0) || bounds.getDouble(0) == bounds.getDouble(1)) {
          singlePhase(u, keyCols)
        } else {
          val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
          val b = bucketExpr(ord(col("__t")), mn, mx, timeBuckets)
          twoPhase(u.withColumn("__b", b), keys, keyCols)
        }
      case _ => singlePhase(u, keyCols)
    }

    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      payloadCols.map(c => col(s"__m.$c").as(payloadPrefix + c))
    matched.select(outCols.toSeq: _*)
  }

  /** Monotone double ordinal of a time-like column, for bucketing.
    * None → type has no cheap numeric ordinal; fall back to one phase.
    */
  private def timeOrdinal(dt: DataType): Option[Column => Column] = dt match {
    case DateType => Some(_.cast(TimestampType).cast(DoubleType))
    case TimestampType | TimestampNTZType => Some(_.cast(DoubleType))
    case _: NumericType => Some(_.cast(DoubleType))
    case _ => None
  }

  /** Bucket id in [0, n) for ordinal values in [mn, mx]; monotone, and
    * total even for out-of-range values (clamped high, negative low),
    * so stale bounds would still be correct. Exposed for the skew spec,
    * which recomputes shuffle-partition placement with it.
    */
  private[graft] def bucketExpr(ord: Column, mn: Double, mx: Double,
      n: Int): Column = {
    val width = (mx - mn) / n
    least(floor((ord - lit(mn)) / lit(width)), lit(n - 1)).cast(IntegerType)
  }

  /** All rows of a key through one window partition. */
  private def singlePhase(u: DataFrame, keyCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
  }

  /** Hot keys split across `timeBuckets` window partitions; cross-
    * bucket carry travels through a tiny per-bucket summary table.
    */
  private def twoPhase(bucketed: DataFrame, keys: Seq[String],
      keyCols: Seq[Column]): DataFrame = {
    val wLocal = Window.partitionBy((keyCols :+ col("__b")): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__m0", last(col("__p"), ignoreNulls = true).over(wLocal))
      .filter(col("__side") === 1)
    // Latest right payload per (keys, bucket). The `when` nulls the
    // ordering key for left rows and max_by skips null ordering keys,
    // so buckets holding only left rows still appear (null summary) —
    // they must, or their carry-in would be lost in the join below.
    val summary = bucketed
      .groupBy((keyCols :+ col("__b")): _*)
      .agg(max_by(col("__p"), when(col("__side") === 0, col("__t"))).as("__s"))
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__c", last(col("__s"), ignoreNulls = true).over(wCarry))
      .select((keyCols :+ col("__b") :+ col("__c")): _*)
    local.join(broadcast(carry), keys :+ "__b", "left")
      .withColumn("__m", coalesce(col("__m0"), col("__c")))
  }
}
