package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * sampling/splits and token-budget sharding.
  *
  * Sampling is CONTENT-HASH based, not RNG based: membership depends
  * only on the key, so it is reproducible across runs/engines, stable
  * under re-partitioning, and consistent between pipeline stages (the
  * same doc never flips between train and eval). Hash = first two md5
  * hex digits → a uniform 0..255 bucket (md5 keeps the DuckDB oracle
  * bit-exact; for finer granularity take more digits).
  */
object Curation {

  /** Uniform 0..255 bucket from the key's md5 prefix. */
  def hashBucket(key: Column): Column = {
    val hexVal = (p: Int) =>
      (instr(lit("0123456789abcdef"), substring(md5(key.cast("string")), p, 1)) - 1)
    (hexVal(1) * 16 + hexVal(2)).cast("int")
  }

  /** Keep ≈ numerator/256 of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, key: Column, numerator: Int): DataFrame =
    df.filter(hashBucket(key) < numerator)

  /** Assign train/val/test splits by hash bucket: [0, valStart) train,
    * [valStart, testStart) val, [testStart, 256) test. */
  def assignSplit(key: Column, valStart: Int = 230, testStart: Int = 243): Column = {
    val b = hashBucket(key)
    when(b < valStart, "train").when(b < testStart, "val").otherwise("test")
  }

  /** Offset-binned sharding: shard = floor(cumulative-tokens-before /
    * budget) in `orderCol` order. Semantics to be aware of: a shard can
    * exceed the budget by at most the one document that straddles its
    * boundary, and an oversized document (> budget) occupies one shard
    * id while the following document skips ahead — shard ids are
    * monotone but NOT dense. This is the windowable (one-pass,
    * engine-portable) formulation; strict greedy bin-packing is a
    * sequential fold and cannot be expressed as a frame window.
    *
    * The global ordered window is intentional for reproducible shard
    * manifests (one pass over doc METADATA, not text); at extreme doc
    * counts shard within partitions first, then renumber.
    */
  def packShards(df: DataFrame, tokenCol: String, budget: Long,
      orderCol: String = "doc_id"): DataFrame = {
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("shard", floor(col("__before") / budget).cast("long"))
      .drop("__before")
  }
}
