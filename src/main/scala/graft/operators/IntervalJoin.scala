package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed interval join — the range join Spark would otherwise plan
  * as a broadcast-nested-loop (quadratic, and driver-bound by the
  * broadcast): every point row pairs with every interval row of equal
  * keys whose half-open window `[start, end)` contains the point.
  *
  * Shape (the standard distributed range-join decomposition): pick a
  * bucket width, map each point to `floor(t / width)`, EXPLODE each
  * interval across the buckets it covers (`sequence` — ⌈len/width⌉+1
  * rows per interval), then a plain hash equi-join on (keys, bucket)
  * followed by the residual `start <= t < end` filter. Each point lands
  * in exactly one bucket and an interval contributes each covered
  * bucket once, so no dedup pass is needed — the equi-join IS the
  * candidate pruning, and Catalyst/AQE handle distribution, broadcast
  * choice, and skew exactly as for any other shuffle join.
  *
  * Scale knob: `bucketWidthSeconds` trades explosion (intervals spanning many
  * buckets) against candidate fan-in (many intervals per bucket). Set
  * it near the TYPICAL interval length — explosion stays O(1) per
  * interval while a bucket only sees intervals that genuinely overlap
  * it. `maxBucketsPerInterval` fails fast on a pathological width
  * (e.g. an open-ended interval exploding into millions of rows)
  * instead of silently materializing the explosion.
  *
  * Points with NULL time and intervals with NULL/empty windows drop out
  * (inner-join semantics over a range predicate — SQL range joins drop
  * them the same way).
  */
object IntervalJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTime: String, startCol: String, endCol: String,
      intervalCols: Seq[String], intervalPrefix: String = "iv_",
      bucketWidthSeconds: Long = 3600L,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidthSeconds > 0, "bucketWidthSeconds must be positive")
    val widthUs = lit(bucketWidthSeconds * 1000000L)
    val keyCols = keys.map(col)
    val p = points
      .filter(keys.map(col(_).isNotNull)
        .foldLeft(col(pointTime).isNotNull)(_ && _))
      .withColumn("__b", floorDiv(micros(col(pointTime)), widthUs))
    // half-open [start, end): the last covered bucket is the one
    // holding end - 1 micro, so an interval ending exactly on a bucket
    // boundary does not bleed into the next bucket
    val iv = intervals
      .filter(keys.map(col(_).isNotNull)
        .foldLeft(col(startCol).isNotNull && col(endCol).isNotNull &&
          col(startCol) < col(endCol))(_ && _))
      .withColumn("__b0", floorDiv(micros(col(startCol)), widthUs))
      .withColumn("__b1", floorDiv(micros(col(endCol)) - lit(1L), widthUs))
    val guarded = iv.withColumn("__nb", col("__b1") - col("__b0") + lit(1L))
      .withColumn("__b", explode(when(
        col("__nb") <= lit(maxBucketsPerInterval.toLong),
        sequence(col("__b0"), col("__b1")))
        .otherwise(raise_error(concat(
          lit(s"IntervalJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets — widen bucketWidth or " +
            "raise maxBucketsPerInterval ("), col("__nb"), lit(")"))))))
    val ivSel = guarded.select(
      (keyCols :+ col("__b") :+
        struct((Seq(startCol, endCol) ++ intervalCols).distinct.map(col): _*)
          .as("__iv")): _*)
    val joined = p.join(ivSel, keys :+ "__b")
      .filter(col(pointTime) >= col(s"__iv.$startCol") &&
        col(pointTime) < col(s"__iv.$endCol"))
    val outCols = points.columns.map(col) ++
      intervalCols.map(c => col(s"__iv.$c").as(intervalPrefix + c))
    joined.select(outCols.toSeq: _*)
  }

  /** Exact integer micros for time-like columns (bucket ids must agree
    * between the point and interval sides bit-for-bit). */
  private def micros(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Floored division that stays correct for negative micros (pre-1970
    * timestamps) — SQL integer division truncates toward zero. */
  private def floorDiv(us: Column, widthUs: Column): Column =
    floor(us.cast(DoubleType) / widthUs.cast(DoubleType)).cast(LongType)
}
