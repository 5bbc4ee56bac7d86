package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Distribution statistics from exact integer power sums (a19–a20).
  *
  * Spark has `corr`/`skewness`/`kurtosis` built in, but their streaming
  * float accumulators are partition-order-dependent and use different
  * update formulas than other engines — the results cannot be
  * hash-verified. These queries instead aggregate raw power sums in
  * exact integer arithmetic (decimal in Spark, HUGEINT in DuckDB):
  * integer sums are order-independent, so the derived doubles are
  * bit-identical across partitionings AND engines as long as the final
  * expression shape matches. `pow` is deliberately avoided (libm
  * implementations differ by ulps across runtimes); only +,-,*,/ and
  * the IEEE-correctly-rounded `sqrt` appear after the exact stage.
  *
  * Inputs are fixed-point quantized first (qty integral, price in
  * cents via round(*100) — the raw double*100 carries FP dust).
  * Scale shape: one map-side-combined groupBy each; the moment math
  * is a constant-width scalar epilogue.
  */
object StatsOps {

  private val xy =
    """SELECT l_returnflag AS flag,
      |  CAST(round(l_quantity) AS BIGINT) AS x,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // --- A19: per-group linear regression + correlation -------------
    QueryDef.sql(
      "a19_bivariate_regr",
      s"""WITH q AS ($xy),
         |s AS (SELECT flag, CAST(count(*) AS HUGEINT) AS n,
         |  CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |  CAST(sum(x*x) AS HUGEINT) AS sxx,
         |  sum(CAST(y AS HUGEINT) * y) AS syy,
         |  CAST(sum(x*y) AS HUGEINT) AS sxy FROM q GROUP BY flag)
         |SELECT flag, CAST(n AS BIGINT) AS n,
         |  CAST(sx AS BIGINT) AS sum_qty,
         |  CAST(sy AS BIGINT) AS sum_price_cents,
         |  round(CAST(n*sxy - sx*sy AS DOUBLE)
         |    / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_cents_per_unit,
         |  round((CAST(sy AS DOUBLE)
         |      - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
         |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept_cents,
         |  round(CAST(n*sxy - sx*sy AS DOUBLE)
         |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
         |    6) AS corr,
         |  round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
         |    / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
         |    6) AS r2
         |FROM s ORDER BY flag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
        .groupBy("flag")
        .agg(
          expr("CAST(count(*) AS DECIMAL(38,0))").as("n"),
          expr("CAST(sum(x) AS DECIMAL(38,0))").as("sx"),
          expr("CAST(sum(y) AS DECIMAL(38,0))").as("sy"),
          expr("CAST(sum(x*x) AS DECIMAL(38,0))").as("sxx"),
          expr("sum(CAST(y AS DECIMAL(38,0)) * y)").as("syy"),
          expr("CAST(sum(x*y) AS DECIMAL(38,0))").as("sxy"))
        .selectExpr(
          "flag",
          "CAST(n AS BIGINT) AS n",
          "CAST(sx AS BIGINT) AS sum_qty",
          "CAST(sy AS BIGINT) AS sum_price_cents",
          """round(CAST(n*sxy - sx*sy AS DOUBLE)
            |  / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope_cents_per_unit""".stripMargin,
          """round((CAST(sy AS DOUBLE)
            |    - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
            |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) AS intercept_cents""".stripMargin,
          """round(CAST(n*sxy - sx*sy AS DOUBLE)
            |  / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
            |  6) AS corr""".stripMargin,
          """round((CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE))
            |  / (CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)),
            |  6) AS r2""".stripMargin)
        .orderBy("flag")
    },

    // --- A20: per-group higher moments (skewness, excess kurtosis) --
    // x = qty <= 50, so even the 4th power sum fits a plain BIGINT;
    // central moments are derived from raw sums in double with the
    // same expression shape on both engines.
    QueryDef.sql(
      "a20_higher_moments",
      """WITH q AS (SELECT l_returnflag AS flag,
        |  CAST(round(l_quantity) AS BIGINT) AS x FROM lineitem),
        |s AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS s1, CAST(sum(x*x) AS BIGINT) AS s2,
        |  CAST(sum(x*x*x) AS BIGINT) AS s3,
        |  CAST(sum(x*x*x*x) AS BIGINT) AS s4 FROM q GROUP BY flag),
        |d AS (SELECT flag, n, s1, s2, s3, s4,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |  CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |  CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |  CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4 FROM s)
        |SELECT flag, n, s1 AS sum_qty,
        |  round(mu, 6) AS mean,
        |  round(r2 - mu*mu, 6) AS variance_pop,
        |  round((r3 - 3*mu*r2 + 2*mu*mu*mu)
        |    / ((r2 - mu*mu) * sqrt(r2 - mu*mu)), 6) AS skewness,
        |  round((r4 - 4*mu*r3 + 6*mu*mu*r2 - 3*mu*mu*mu*mu)
        |    / ((r2 - mu*mu) * (r2 - mu*mu)) - 3, 6) AS excess_kurtosis
        |FROM d ORDER BY flag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("x"))
        .groupBy("flag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("s1"),
          sum(expr("x*x")).as("s2"),
          sum(expr("x*x*x")).as("s3"),
          sum(expr("x*x*x*x")).as("s4"))
        .selectExpr("flag", "n", "s1", "s2", "s3", "s4",
          "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu",
          "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2",
          "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3",
          "CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4")
        .selectExpr(
          "flag", "n", "s1 AS sum_qty",
          "round(mu, 6) AS mean",
          "round(r2 - mu*mu, 6) AS variance_pop",
          """round((r3 - 3*mu*r2 + 2*mu*mu*mu)
            |  / ((r2 - mu*mu) * sqrt(r2 - mu*mu)), 6) AS skewness""".stripMargin,
          """round((r4 - 4*mu*r3 + 6*mu*mu*r2 - 3*mu*mu*mu*mu)
            |  / ((r2 - mu*mu) * (r2 - mu*mu)) - 3, 6) AS excess_kurtosis""".stripMargin)
        .orderBy("flag")
    },

    // --- A21: CUPED variance-reduced experiment readout -------------
    // The A/B-test read with pre-period adjustment (Deng et al. 2013):
    // per user, pre-cutoff spend X and post-cutoff spend Y (exact
    // cents); θ = cov(X,Y)/var(X) POOLED from integer power sums
    // (decimal/HUGEINT — n·Sxx overflows int64 at the 10× replica);
    // per deterministic md5 arm, adjusted mean = E[Y] − θ(E[X] − E[X]
    // pooled). Identical final expression shape on both engines, so
    // the FP epilogue is bit-reproducible like a19/a20. Scale shape:
    // one user-level rollup + one 1-row global broadcast + a 2-row arm
    // rollup.
    QueryDef.sql(
      "a21_cuped", {
        val arm =
          "(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2"
        s"""WITH u AS (
           |  SELECT user_id, CAST($arm AS BIGINT) AS arm,
           |    CAST(COALESCE(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
           |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
           |    CAST(COALESCE(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
           |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
           |  FROM events GROUP BY user_id),
           |g AS (
           |  SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    sum(CAST(x AS HUGEINT) * x) AS sxx,
           |    sum(CAST(x AS HUGEINT) * y) AS sxy
           |  FROM u),
           |t AS (
           |  SELECT CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS theta,
           |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gx
           |  FROM g),
           |a AS (
           |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
           |    CAST(sum(x) AS BIGINT) AS sx_a, CAST(sum(y) AS BIGINT) AS sy_a
           |  FROM u GROUP BY arm)
           |SELECT arm, n_users, sy_a AS sum_post_cents,
           |  round(CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE), 4) AS mean_post_cents,
           |  round(theta, 6) AS theta,
           |  round(CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)
           |    - theta * (CAST(sx_a AS DOUBLE) / CAST(n_users AS DOUBLE) - gx), 4)
           |    AS cuped_mean_cents
           |FROM a, t ORDER BY arm""".stripMargin
      }) { (s, dir) =>
      // Spark spells DuckDB's strpos(s, sub) as instr(s, sub) — same
      // 1-based, 0-if-absent contract, so the arm bucket is identical
      val arm =
        "(instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING)), 1, 1)) - 1) % 2"
      val cutoff = "TIMESTAMP '2024-01-15 00:00:00'"
      val u = Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          expr(s"""CAST(COALESCE(sum(CASE WHEN ts < $cutoff
                   |  THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)"""
            .stripMargin).as("x"),
          expr(s"""CAST(COALESCE(sum(CASE WHEN ts >= $cutoff
                   |  THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)"""
            .stripMargin).as("y"))
        .withColumn("arm", expr(s"CAST($arm AS BIGINT)"))
      val g = u.agg(
        expr("CAST(count(*) AS DECIMAL(38,0))").as("n"),
        expr("CAST(sum(x) AS DECIMAL(38,0))").as("sx"),
        expr("CAST(sum(y) AS DECIMAL(38,0))").as("sy"),
        expr("sum(CAST(x AS DECIMAL(38,0)) * x)").as("sxx"),
        expr("sum(CAST(x AS DECIMAL(38,0)) * y)").as("sxy"))
        .selectExpr(
          "CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS theta",
          "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gx")
      val a = u.groupBy("arm").agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).as("sx_a"),
        sum(col("y")).as("sy_a"))
      a.crossJoin(broadcast(g))
        .selectExpr("arm", "n_users", "sy_a AS sum_post_cents",
          "round(CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE), 4) AS mean_post_cents",
          "round(theta, 6) AS theta",
          """round(CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)
            |  - theta * (CAST(sx_a AS DOUBLE) / CAST(n_users AS DOUBLE) - gx), 4)
            |  AS cuped_mean_cents""".stripMargin)
        .orderBy("arm")
    })
}
