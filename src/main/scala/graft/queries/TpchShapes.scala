package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Classic analytic query shapes (TPC-H Q3/Q5/Q6 flavored, adapted to
  * the driver's schema subset) — bench depth for the relational core:
  * selective-scan aggregation, shipping-priority top join, and the
  * multi-dim star join with region pruning.
  */
object TpchShapes {

  def defs: Seq[QueryDef] = Seq(

    // Q6 shape: pure selective-scan aggregation (predicate pushdown
    // does all the work; plan should be scan→filter→partial/final agg)
    QueryDef.sql(
      "q6_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Q3 shape: shipping-priority join, grouped revenue ranking
    QueryDef.sql(
      "q3_shipping_priority",
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") < lit("1997-06-01 00:00:00").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") > lit("1997-06-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Q5 shape: multi-dim star with region pruning, local-supplier join
    QueryDef.sql(
      "q5_local_supplier_volume",
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o   ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n   ON c.c_nationkey = n.n_nationkey
        |JOIN region r   ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        // supplier scales with SF — leave the strategy to AQE; only the
        // fixed-size nation/region dims keep explicit broadcast hints
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q4 shape: EXISTS decorrelates to a LEFT SEMI join — orders in a
    // date window that have at least one returned lineitem, counted by
    // priority. The semi join shuffles on orderkey with the date
    // filter already pushed into the orders scan; the probe side
    // reduces to distinct orderkeys map-side (semi joins never
    // multiply rows, so no dedup pass is needed after).
    QueryDef.sql(
      "q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01 00:00:00").cast("timestamp"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q17 shape: correlated scalar-aggregate subquery (per-part 20% of
    // average quantity) decorrelated into a grouped frame joined back.
    // The brand filter semi-prunes lineitem FIRST, so the per-part
    // average aggregates only the ~1/25 of lineitem that can matter,
    // and the tiny (partkey, threshold) frame broadcasts back — two
    // passes over the pruned slice, zero over the full table. The
    // threshold compare is exact: quantities are integer-valued, so
    // avg = exact-sum / count is the same double in any engine or
    // partition order. Money aggregates in integer cents.
    QueryDef.sql(
      "q17_small_qty_revenue",
      """WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
        |li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey),
        |thr AS (
        |  SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS max_qty
        |  FROM li GROUP BY l_partkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM li JOIN thr ON l_partkey = t_partkey
        |WHERE l_quantity < max_qty""".stripMargin) { (s, dir) =>
      val pk = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val li = Tables.lineitem(s, dir)
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg("l_quantity")).as("max_qty"))
        .select("t_partkey", "max_qty")
      li.join(broadcast(thr), col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("max_qty"))
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_cents"))
    },

    // Q14 shape: promo revenue share over one shipdate month — two
    // conditional aggregates off ONE scan+join pass; money in integer
    // cents, the share in basis points (floor through double, exact at
    // these magnitudes)
    QueryDef.sql(
      "q14_promo_share",
      """WITH li AS (
        |  SELECT p.p_type,
        |    CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |    AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
        |SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(floor(10000.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |    / sum(cents)) AS BIGINT) AS promo_share_bp
        |FROM li""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-09-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_type"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long").as("cents"))
      val promo = sum(when(col("p_type") === "PROMO", col("cents")).otherwise(0L))
      li.agg(promo.as("promo_cents"), sum(col("cents")).as("total_cents"),
        floor(lit(10000.0) * promo / sum(col("cents"))).cast("long")
          .as("promo_share_bp"))
    },

    // Q10 shape: returned-item revenue by customer over one quarter —
    // the classic "who returned the most" top-k; fact side filtered
    // before the joins, dims broadcast, money in integer cents
    QueryDef.sql(
      "q10_returned_customers",
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY revenue_cents DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-10-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .select("c_custkey", "c_name", "n_name", "revenue_cents")
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    },

    // Q7 shape: bilateral trade volume between two nations by ship
    // year — the five-way join with the symmetric nation-pair
    // predicate; both nation hops broadcast, money in integer cents
    QueryDef.sql(
      "q7_nation_volume",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q13 shape: customer order-count distribution — the left join
    // that must keep zero-order customers, double aggregation
    QueryDef.sql(
      "q13_custdist",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    })
}
