package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine diagnostics BEFORE a shuffle decision: what the salting /
  * AQE-skew-join / bucketing choice should be driven by, measured
  * instead of guessed. At 100 TB a mis-chosen shuffle key is the
  * difference between a balanced stage and one straggler task holding
  * a 4-hour job — these profiles are the cheap (one aggregate each)
  * pre-flight read.
  */
object SkewProfile {

  /** One-row group-size distribution profile of a candidate key:
    * key cardinality, total rows, the largest group, exact
    * interpolated p50/p90/p99 of group size, the heaviest key's share
    * of all rows, and max/p50 (the straggler multiplier a uniform
    * hash partitioning would suffer). Two aggregates: one shuffle on
    * the key, then a scalar rollup. Ratios are IEEE doubles of exact
    * integer inputs, rounded at 6 — engine-stable.
    */
  def keySkewProfile(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_rows"),
        round(expr("percentile(cnt, 0.5)"), 6).as("p50"),
        round(expr("percentile(cnt, 0.9)"), 6).as("p90"),
        round(expr("percentile(cnt, 0.99)"), 6).as("p99"),
        round(max(col("cnt")).cast("double") / sum(col("cnt")), 6)
          .as("top_share"),
        round(max(col("cnt")) / expr("percentile(cnt, 0.5)"), 6)
          .as("straggler_ratio"))

  /** Rows per deterministic hash bucket for a candidate partitioning
    * key — the balance a `repartition(keys)` would actually achieve,
    * auditable on ANY engine (md5 bucketing, not Spark's internal
    * Murmur3, so the oracle can reproduce it bit-for-bit; real hash
    * partitioners spread at least as well). One aggregate over the
    * scan; `share_ppm` is an exact integer (rows·1e6 div total).
    */
  def partitionBalance(df: DataFrame, keys: Seq[Column],
      buckets: Int = 32): DataFrame = {
    // must divide the 256-value hash space: a non-divisor count would
    // bake a modulo bias into the audit itself (e.g. 48 buckets -> the
    // first 16 get 6/256 of the space, the rest 5/256 — a ~20% skew a
    // real hash partitioner would not have)
    require(buckets >= 2 && buckets <= 256 && 256 % buckets == 0,
      s"buckets must divide 256 (2,4,8,...,256), got $buckets")
    val b = graft.text.Curation.hashBucket(concat_ws("|", keys: _*)) % buckets
    val counts = df.groupBy(b.as("bucket")).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_rows"),
        // integer division: Spark casts double->long by TRUNCATION but
        // DuckDB by ROUNDING, so a double divide here would drift
        expr("n_rows * 1000000 DIV __t").cast("long").as("share_ppm"))
  }
}
