package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.SkewProfile
import org.apache.spark.sql.functions._

/** Engine-diagnostics queries (g-family) — [[graft.operators.SkewProfile]]:
  * the measured pre-flight reads behind shuffle decisions (salting,
  * AQE skew thresholds, bucketing keys). The reference hand-tunes
  * none of this (single-node pandas); at cluster scale these are the
  * numbers that decide whether a join key is usable.
  */
object DiagnosticsOps {

  /** DuckDB mirror of Curation.hashBucket over an expression. */
  private def bucketSql(e: String): String = {
    def hx(p: Int) =
      s"(strpos('0123456789abcdef', substr(md5($e), $p, 1)) - 1)"
    s"CAST(${hx(1)} * 16 + ${hx(2)} AS INTEGER)"
  }

  def defs: Seq[QueryDef] = Seq(

    // --- G1: key-skew profile ---------------------------------------
    // Group-size distribution of a candidate shuffle key: one shuffle
    // on the key + a scalar rollup. straggler_ratio = max/p50 is the
    // multiplier one task suffers under uniform hash partitioning.
    QueryDef.sql(
      "g1_skew_profile",
      """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  max(cnt) AS max_rows,
        |  round(quantile_cont(cnt, 0.5), 6) AS p50,
        |  round(quantile_cont(cnt, 0.9), 6) AS p90,
        |  round(quantile_cont(cnt, 0.99), 6) AS p99,
        |  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
        |    AS top_share,
        |  round(CAST(max(cnt) AS DOUBLE) / quantile_cont(cnt, 0.5), 6)
        |    AS straggler_ratio
        |FROM c""".stripMargin) { (s, dir) =>
      SkewProfile.keySkewProfile(Tables.lineitem(s, dir), Seq("l_partkey"))
    },

    // --- G2: hash-partition balance audit ---------------------------
    // Rows per deterministic md5 bucket for a candidate partitioning
    // key — engine-reproducible (no Murmur3), share in exact ppm via
    // integer division (Spark DIV ≡ DuckDB //; a double divide would
    // drift on the cast: Spark truncates, DuckDB rounds).
    QueryDef.sql(
      "g2_partition_balance", {
        val b = s"${bucketSql("CAST(o_custkey AS VARCHAR)")} % 32"
        s"""WITH b AS (SELECT $b AS bucket FROM orders),
           |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
           |  FROM b GROUP BY bucket),
           |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tt FROM c)
           |SELECT bucket, n_rows,
           |  CAST(n_rows * 1000000 // tt AS BIGINT) AS share_ppm
           |FROM c, t ORDER BY bucket""".stripMargin
      }) { (s, dir) =>
      SkewProfile.partitionBalance(Tables.orders(s, dir),
        Seq(col("o_custkey")), buckets = 32)
        .orderBy("bucket")
    })
}
