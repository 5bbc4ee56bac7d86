package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional Z-order (Morton-curve) file layout.
  *
  * A table laid out by ONE sort key prunes scans only on that key; a
  * 100 TB fact table queried by several independent predicates (station
  * AND time, user AND value range) needs min/max file statistics that
  * are tight on EVERY clustered dimension at once. Z-ordering
  * interleaves the bits of per-dimension range buckets so rows close in
  * any dimension land in the same files, making parquet row-group /
  * file skipping effective for all clustered columns — the public
  * technique behind Delta/Iceberg `ZORDER BY` clustering, re-expressed
  * here as plain DataFrame range partitioning + in-partition sort.
  *
  * Scale shape: bucket boundaries come from `approxQuantile` (one
  * sample-based pass, driver gets `2^bits − 1` numbers per column);
  * bucketing + bit interleaving are pure column expressions; the final
  * exchange is ONE `repartitionByRange` on the z-value (range, so file
  * sizes stay balanced even under skewed dimensions) followed by an
  * in-partition sort. No window, no collect of data rows.
  */
object ZOrderLayout {

  /** Interleave the low `bits` bits of each (non-negative) column:
    * result bit `b·N + j` = bit `b` of `cols(j)`. With per-dimension
    * bucket ids in [0, 2^bits), adjacent z-values differ little in
    * every dimension — the Morton curve. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62,
      "need 1+ columns and bits*dims <= 62")
    val n = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-depth bucket ids in [0, 2^bits) for `colName`, from
    * `approxQuantile` boundaries. The bucket id is a sum of boundary
    * comparisons — a flat codegen-friendly expression, no UDF and no
    * broadcast join. Ties/repeated boundaries degrade gracefully
    * (skewed values collapse into fewer distinct buckets). */
  private def requireOrderable(df: DataFrame, colName: String): Unit = {
    import org.apache.spark.sql.types.{DateType, NumericType, StringType,
      TimestampType}
    df.schema(colName).dataType match {
      case _: NumericType | _: TimestampType | _: DateType | _: StringType => ()
      case other => throw new IllegalArgumentException(
        s"z-order column $colName has type $other; " +
          "need numeric/timestamp/date/string")
    }
  }

  private def isString(df: DataFrame, colName: String): Boolean =
    df.schema(colName).dataType ==
      org.apache.spark.sql.types.StringType

  /** Bucket-id expression from precomputed boundaries: a sum of
    * boundary comparisons — a flat codegen-friendly expression, no UDF
    * and no broadcast join. Ties/repeated boundaries degrade
    * gracefully (skewed values collapse into fewer distinct
    * buckets). */
  private def bucketExpr(colName: String, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(colName).cast("double") > b, 1L).otherwise(0L)
    }

  /** Per-column boundary strings for every string dimension from ONE
    * bounded `takeSample` over the tuple of string columns (driver
    * gets ~32·2^bits rows, never data-sized) — the same reservoir
    * idea Spark's own RangePartitioner uses, and one scan however
    * many string dims there are. Samples sort under Spark's OWN
    * string ordering (UTF8String — byte-wise unsigned), not Java's
    * UTF-16 `String` order: the bucket expression compares with the
    * engine, so boundaries chosen in a different collation would
    * space buckets unevenly for non-BMP data. */
  private def stringBounds(df: DataFrame, strCols: Seq[String],
      nBuckets: Int): Map[String, Seq[String]] = {
    if (strCols.isEmpty) return Map.empty
    import org.apache.spark.unsafe.types.UTF8String
    val rows = df.select(strCols.map(col): _*).rdd
      .takeSample(withReplacement = false, num = nBuckets * 32, seed = 41L)
    strCols.zipWithIndex.map { case (c, i) =>
      val sample = rows.flatMap(r => Option(r.getString(i)))
        .sortWith((a, b) =>
          UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
      val bounds: Seq[String] =
        if (sample.isEmpty) Nil
        else (1 until nBuckets)
          .map(j => sample((j.toLong * sample.length / nBuckets).toInt
            .min(sample.length - 1)))
          .distinct
      c -> bounds
    }.toMap
  }

  /** Bucket ids from precomputed string boundaries; comparison is the
    * engine's native string ordering, so buckets are range-contiguous
    * and the per-file min/max string bounds of the laid-out files
    * prune string predicates (see SnapshotTable.StrStat). */
  private def stringBucketExpr(colName: String,
      bounds: Seq[String]): Column =
    bounds.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(col(colName) > lit(b), 1L).otherwise(0L)
    }

  /** Lay `df` out on the Z-curve over `cols`: range-partition into
    * `numFiles` partitions by the interleaved z-value and sort within
    * each, so a subsequent parquet write produces files whose min/max
    * stats are tight on EVERY dimension in `cols`. Write with
    * `.sortWithinPartitions`-preserving `df.write.parquet` directly —
    * no further repartition. Bucket boundaries come from ONE pass per
    * column KIND — a multi-column approxQuantile over the numeric
    * dims, a bounded takeSample over the string dims — not one per
    * dimension (per-leaf that is the difference between ~3 and k+1
    * reads under a compaction sweep). */
  def layout(df: DataFrame, cols: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    cols.foreach(requireOrderable(df, _))
    if (cols.size == 1) {
      // one dimension: the Morton curve degenerates to a plain range
      // sort, so do it EXACTLY — repartitionByRange's own sampling
      // picks the boundaries (works for strings too) and the
      // in-partition sort is on the raw column, giving per-file
      // min/max stats as tight as the data allows instead of
      // bucket-granular ones
      return df.repartitionByRange(numFiles, col(cols.head))
        .sortWithinPartitions(cols.head)
    }
    val nBuckets = 1 << bits
    val numCols = cols.filterNot(isString(df, _))
    val strCols = cols.filter(isString(df, _))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val qNames = numCols.indices.map(i => s"__q$i")
    val casted = df.select(numCols.zip(qNames).map { case (c, q) =>
      col(c).cast("double").as(q)
    }: _*)
    // boundary discovery is ONE pass per column KIND, not per column:
    // one multi-column approxQuantile over the numeric dims, one
    // bounded takeSample over the tuple of string dims
    val allBounds =
      if (numCols.isEmpty) Array.empty[Array[Double]]
      else casted.stat.approxQuantile(qNames.toArray, probs, 0.001)
    val numBuckets = numCols.zip(allBounds).map { case (c, bounds) =>
      c -> bucketExpr(c, bounds)
    }.toMap
    val strBounds = stringBounds(df, strCols, nBuckets)
    val buckets = cols.map(c =>
      if (isString(df, c)) stringBucketExpr(c, strBounds(c))
      else numBuckets(c))
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
