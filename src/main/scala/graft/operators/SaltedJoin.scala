package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating equi-join: when one join key carries a hot spot
  * (e.g. one station producing most readings), a plain shuffle join
  * lands the hot key on one task. Salting splits each key into
  * `buckets` sub-keys on the large side (deterministic hash of a
  * discriminator column, NOT rand() — keeps retries/oracles stable)
  * and replicates the small side once per bucket.
  *
  * Result is exactly the plain inner join; only the physical
  * distribution changes. AQE's skew-join handles sort-merge skew
  * automatically at runtime — this operator is for the planned-ahead
  * case (known hot dimension keys, broadcast-too-big small side).
  */
object SaltedJoin {

  def inner(
      large: DataFrame, small: DataFrame,
      key: String, buckets: Int, discriminator: Column): DataFrame = {
    // buckets=0 would be pmod-by-zero: an ANSI runtime error, or with
    // ANSI off a NULL salt that matches nothing — a silently EMPTY
    // "inner join", the worst failure shape
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(buckets)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
