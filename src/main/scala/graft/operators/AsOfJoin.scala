package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join — the time-series join Spark has no native operator for:
  * every left row picks up a right row with equal keys chosen by
  * `direction` (left join semantics: no candidate right row → null
  * payload; a NULL key matches nothing, as in an equality join and
  * DuckDB's native ASOF JOIN):
  *
  *  - `"backward"` (default): LATEST right with `rightTime <= leftTime`
  *  - `"forward"`:  EARLIEST right with `rightTime >= leftTime`
  *  - `"nearest"`:  the closer of the two; exact-tie → backward
  *    (distances compared in exact integer micros for time types —
  *    FP-seconds ties would be engine-dependent)
  *
  * Shape: tag both sides, union them, shuffle once on the key, then a
  * per-key ordered window carries the last-seen (resp. next-seen) right
  * payload across left rows (`last`/`first(ignoreNulls)`). At equal
  * timestamps the right row sorts on the inclusive side of the frame,
  * which yields the `<=`/`>=` contracts. Versus the naive formulation
  * (range join left×right + argmin per left row): no range explosion —
  * cost is one sort of |L|+|R| within each partition bucket ("nearest"
  * needs both frame directions: two sorts, still ONE exchange).
  *
  * Skew: a window exchange gets NO help from AQE (AQE's skew
  * mitigation splits skewed partitions in sort-merge JOINs only), so
  * with a single per-key window one hot key would put |L|+|R| rows of
  * that key through one task's sort. The default two-phase form
  * (`timeBuckets` > 1) pre-splits every key by a coarse time bucket:
  *
  *   1. window within (keys, bucket) — the hot key's rows spread over
  *      up to `timeBuckets` tasks;
  *   2. per-(keys, bucket) summary = latest (and/or earliest) right
  *      payload in the bucket (`max_by`/`min_by`, map-side combinable);
  *   3. a second window over the per-bucket summaries (rows = #keys ×
  *      #buckets, tiny) computes each bucket's carry = last right
  *      payload from any PRIOR bucket (backward) / first from any
  *      LATER bucket (forward);
  *   4. broadcast the carry table back onto (keys, bucket);
  *      payload = coalesce(in-bucket match, carry).
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

  /** Carry-table broadcast ceiling (#keys x timeBuckets rows): above
    * this the per-bucket join runs as a plain shuffle instead of a
    * forced broadcast. ~4M summary rows of payload structs is
    * comfortably inside executor memory; a 100M-key table is not. */
  private val MaxBroadcastCarryRows = 4000000L

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], payloadPrefix: String = "asof_",
      timeBuckets: Int = 32, direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val needB = direction != "forward"
    val needF = direction != "backward"
    val keyCols = keys.map(col)
    // "nearest" needs the matched right TIME to compare distances; ride
    // it inside the payload struct so every carry path moves it along
    val payFields = if (direction == "nearest")
      payloadCols.map(col) :+ col(rightTime).as("__rt")
    else payloadCols.map(col)
    val payload = struct(payFields: _*)
    val leftType = StructType(left.schema.fields)
    // a NULL rightTime can never satisfy the time bound, but would sort
    // at a frame edge (nulls-first ascending) and become a carried
    // payload — exclude it up front. A NULL key right row can never
    // match either (NULL = NULL is not a match), but Window.partitionBy
    // groups null keys into one partition, so it must also be excluded
    // or it would pair with null-key left rows.
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
        // One agg pass for the bucket bounds — plus the key-cardinality
        // estimate the carry-broadcast gate needs (free in the same
        // pass). Exact bounds aren't required for correctness (any
        // monotone map works); they just spread the buckets evenly.
        val bounds = u.agg(min(ord(col("__t"))).as("mn"),
          max(ord(col("__t"))).as("mx"),
          approx_count_distinct(struct(keyCols: _*)).as("nk")).head()
        if (bounds.isNullAt(0) || bounds.getDouble(0) == bounds.getDouble(1)) {
          singlePhase(u, keyCols, needB, needF)
        } else {
          val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
          val b = bucketExpr(ord(col("__t")), mn, mx, timeBuckets)
          // the carry table is #keys x timeBuckets rows of payload: a
          // FORCED broadcast (Spark obeys the hint regardless of size)
          // would OOM on a high-cardinality key — gate it on the
          // estimated row count and fall back to a plain shuffle join
          // (same results; the big side pays one more exchange)
          val carryRows = bounds.getLong(2) * timeBuckets
          twoPhase(u.withColumn("__b", b), keys, keyCols, needB, needF,
            broadcastCarry = carryRows <= MaxBroadcastCarryRows)
        }
      case _ => singlePhase(u, keyCols, needB, needF)
    }

    val best = direction match {
      case "backward" => col("__mb")
      case "forward" => col("__mf")
      case "nearest" =>
        // exact integer distance where the type allows (micros/days);
        // double ordinal otherwise — document ties as FP-dependent then
        val ex = exactOrdinal(u.schema("__t").dataType)
        val dB = ex(col("__t")) - ex(col("__mb.__rt"))
        val dF = ex(col("__mf.__rt")) - ex(col("__t"))
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(dB <= dF, col("__mb"))
          .otherwise(col("__mf"))
    }
    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      payloadCols.map(c => col(s"__best.$c").as(payloadPrefix + c))
    // a NULL left time matches NOTHING (the doc contract, and DuckDB
    // ASOF semantics) — masked HERE so every plan shape agrees: in
    // singlePhase a null __t sorts nulls-first and its forward frame
    // would otherwise see every right row; in twoPhase `least` sends
    // the null ordinal to the last bucket where the backward carry
    // would match it
    val bestSafe = when(col("__t").isNull,
      lit(null).cast(r0.schema("__p").dataType)).otherwise(best)
    matched.withColumn("__best", bestSafe).select(outCols.toSeq: _*)
  }

  /** Nearest-match convenience: closer of backward/forward, tie →
    * backward. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], payloadPrefix: String = "asof_",
      timeBuckets: Int = 32): DataFrame =
    apply(left, right, keys, leftTime, rightTime, payloadCols,
      payloadPrefix, timeBuckets, direction = "nearest")

  /** Monotone double ordinal of a time-like column, for bucketing.
    * None → type has no cheap numeric ordinal; fall back to one phase.
    */
  private def timeOrdinal(dt: DataType): Option[Column => Column] = dt match {
    case DateType => Some(_.cast(TimestampType).cast(DoubleType))
    case TimestampType | TimestampNTZType => Some(_.cast(DoubleType))
    case _: NumericType => Some(_.cast(DoubleType))
    case _ => None
  }

  /** EXACT integer ordinal for nearest-distance comparison: micros for
    * timestamps, days for dates (a double-seconds tie test would be
    * FP-rounding-dependent and diverge from integer-epoch oracles). */
  private def exactOrdinal(dt: DataType): Column => Column = dt match {
    case DateType => c => datediff(c, to_date(lit("1970-01-01"))).cast(LongType)
    case TimestampType | TimestampNTZType => unix_micros(_)
    case ByteType | ShortType | IntegerType | LongType => _.cast(LongType)
    case _ => _.cast(DoubleType)
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

  /** All rows of a key through one window partition. Both frame
    * directions share ONE hash exchange; "nearest" adds a second
    * in-partition sort (tie order differs), not a second shuffle. */
  private def singlePhase(u: DataFrame, keyCols: Seq[Column],
      needB: Boolean, needF: Boolean): DataFrame = {
    // backward: right (side 0) sorts BEFORE left at equal __t, so a
    // tied right row is inside the preceding-inclusive frame; forward:
    // right sorts AFTER left, inside the following-inclusive frame
    val wB = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withB = if (needB)
      u.withColumn("__mb", last(col("__p"), ignoreNulls = true).over(wB)) else u
    val withF = if (needF)
      withB.withColumn("__mf", first(col("__p"), ignoreNulls = true).over(wF))
    else withB
    withF.filter(col("__side") === 1)
  }

  /** Hot keys split across `timeBuckets` window partitions; cross-
    * bucket carry travels through a tiny per-bucket summary table.
    */
  private def twoPhase(bucketed: DataFrame, keys: Seq[String],
      keyCols: Seq[Column], needB: Boolean, needF: Boolean,
      broadcastCarry: Boolean): DataFrame = {
    val partCols = keyCols :+ col("__b")
    val wLocalB = Window.partitionBy(partCols: _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLocalF = Window.partitionBy(partCols: _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val local0 = if (needB)
      bucketed.withColumn("__mb0", last(col("__p"), ignoreNulls = true).over(wLocalB))
    else bucketed
    val local1 = if (needF)
      local0.withColumn("__mf0", first(col("__p"), ignoreNulls = true).over(wLocalF))
    else local0
    val local = local1.filter(col("__side") === 1)
    // Latest / earliest right payload per (keys, bucket). The `when`
    // nulls the ordering key for left rows and max_by/min_by skip null
    // ordering keys, so buckets holding only left rows still appear
    // (null summary) — they must, or their carry would be lost in the
    // join below.
    val rightT = when(col("__side") === 0, col("__t"))
    val aggs =
      (if (needB) Seq(max_by(col("__p"), rightT).as("__sb")) else Nil) ++
        (if (needF) Seq(min_by(col("__p"), rightT).as("__sf")) else Nil)
    val summary = bucketed.groupBy(partCols: _*).agg(aggs.head, aggs.tail: _*)
    val wPrev = Window.partitionBy(keyCols: _*).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCols: _*).orderBy(col("__b").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val carry0 = if (needB)
      summary.withColumn("__cb", last(col("__sb"), ignoreNulls = true).over(wPrev))
    else summary
    val carry1 = if (needF)
      carry0.withColumn("__cf", first(col("__sf"), ignoreNulls = true).over(wNext))
    else carry0
    val carryCols = partCols ++
      (if (needB) Seq(col("__cb")) else Nil) ++
      (if (needF) Seq(col("__cf")) else Nil)
    val carry = carry1.select(carryCols: _*)
    val joined = local.join(
      if (broadcastCarry) broadcast(carry) else carry, keys :+ "__b", "left")
    val withB = if (needB)
      joined.withColumn("__mb", coalesce(col("__mb0"), col("__cb"))) else joined
    if (needF) withB.withColumn("__mf", coalesce(col("__mf0"), col("__cf")))
    else withB
  }
}
