package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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
      """SELECT round(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
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
        // exact 1e-4-unit sum (the q1 discipline): double sums flip
        // round(.,2) boundaries on partial-agg ordering
        .agg(round(sum(round(col("l_extendedprice") * col("l_discount") * 10000, 0)
          .cast("decimal(38,0)")) / 10000.0, 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Q3 shape: shipping-priority join, grouped revenue ranking
    QueryDef.sql(
      "q3_shipping_priority",
      """SELECT o_orderkey,
        |  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue,
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
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
          .cast("decimal(38,0)")) / 10000.0, 2).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Q5 shape: multi-dim star with region pruning, local-supplier join
    QueryDef.sql(
      "q5_local_supplier_volume",
      """SELECT n.n_name,
        |  round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS revenue
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
        .agg(round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
          .cast("decimal(38,0)")) / 10000.0, 2).as("revenue"))
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
        // the Brand#23 slice is ~1/25 of part, which still scales with
        // SF — AQE decides (see q7's supplier note)
        .join(pk, col("l_partkey") === col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val thr = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * avg("l_quantity")).as("max_qty"))
        .select("t_partkey", "max_qty")
      li.join(thr, col("l_partkey") === col("t_partkey"))
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
        // part scales with SF — AQE decides (see q7's supplier note)
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
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
        // supplier SCALES with SF — no broadcast hint (a forced hint is
        // obeyed at any size and OOMs at real scale); AQE still
        // broadcasts it at bench scale, where it fits
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
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
    },

    // Q8 shape: national market share — one nation's slice of a
    // region's part-filtered order volume per year. Share = ratio of
    // two ROUNDED sums (round-then-divide keeps the FP boundary
    // engine-stable; raw double-sum ratios drift with partial-agg
    // order). Fixed dims broadcast; the five-way fact join is AQE's.
    QueryDef.sql(
      "q8_market_share",
      """SELECT l_year,
        |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
        |    AS nation_volume,
        |  round(sum(volume), 2) AS total_volume,
        |  round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
        |    / round(sum(volume), 2), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
        |    l.l_extendedprice * (1 - l.l_discount) AS volume,
        |    ns.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_size <= 10
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
        |  JOIN orders o   ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
        |  JOIN region r   ON r.r_regionkey = nc.n_regionkey
        |  WHERE r.r_name = 'EUROPE'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY l_year ORDER BY l_year""".stripMargin) { (s, dir) =>
      val ns = Tables.nation(s, dir).select(
        col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
      val nc = Tables.nation(s, dir).select(
        col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val natVol = sum(when(col("supp_nation") === "NATION_3", col("volume"))
        .otherwise(lit(0)))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_size") <= 10),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(ns), col("ns_key") === col("s_nationkey"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nc), col("nc_key") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("r_regionkey") === col("nc_region"))
        .filter(col("r_name") === "EUROPE")
        .select(year(col("o_orderdate")).cast("long").as("l_year"),
          volume.as("volume"), col("supp_nation"))
        .groupBy("l_year")
        .agg(round(natVol, 2).as("nation_volume"),
          round(sum(col("volume")), 2).as("total_volume"),
          round(round(natVol, 2) / round(sum(col("volume")), 2), 6).as("mkt_share"))
        .orderBy("l_year")
    },

    // Q15 shape: top supplier(s) by a quarter's revenue — the
    // revenue-view-then-max pattern. The per-supplier rollup happens
    // once; the 1-row max broadcasts back (no global sort, and ties
    // all surface). Revenue compared ROUNDED on both sides — the
    // equality must not hinge on sub-cent FP noise.
    QueryDef.sql(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, dir) =>
      val revenue = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("max_revenue"))
      revenue.join(broadcast(top),
          col("total_revenue") === col("max_revenue"))
        .join(Tables.supplier(s, dir), col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },

    // Q18 shape: large-volume customers — the HAVING-on-fact-rollup
    // gate. sum(l_quantity) groups once on orderkey (map-side
    // combined); only qualifying orderkeys (a tiny frame) join back to
    // orders/customer, so the expensive side is one aggregation pass.
    QueryDef.sql(
      "q18_large_orders",
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, big.total_qty
        |FROM (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 300) big
        |JOIN orders o   ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          sum(col("l_quantity")).as("__raw"))
        .filter(col("__raw") > 300).drop("__raw")
        .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },

    // Q19 shape: bracketed OR-of-ANDs predicate revenue — the
    // disjunctive join filter that must still prune. The part side
    // pre-filters to the union of brackets before the join; the
    // residual bracket predicate applies post-join, so the join input
    // is the pruned slice, not all of part.
    QueryDef.sql(
      "q19_bracket_revenue",
      """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        |        AND l.l_quantity BETWEEN 10 AND 30)
        |   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
        |        AND l.l_quantity BETWEEN 5 AND 25)
        |   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 40
        |        AND l.l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, dir) =>
      val bracket1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity").between(10, 30)
      val bracket2 = col("p_brand") === "Brand#13" &&
        col("p_size").between(1, 25) && col("l_quantity").between(5, 25)
      val bracket3 = col("p_brand") === "Brand#20" &&
        col("p_size").between(10, 40) && col("l_quantity").between(20, 40)
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir)
            .filter(col("p_brand").isin("Brand#1", "Brand#13", "Brand#20")),
          col("p_partkey") === col("l_partkey"))
        .filter(bracket1 || bracket2 || bracket3)
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
    },

    // Q22 shape: rich-but-RECENTLY-inactive accounts — scalar-subquery
    // threshold + anti join. The balance threshold is computed in
    // INTEGER CENTS (exact sum / exact count — the same rational in
    // any engine or partition order) because a double-sum average in a
    // FILTER flips hash equality on partial-agg ordering noise.
    QueryDef.sql(
      "q22_inactive_rich",
      """WITH cents AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |thresh AS (
        |  SELECT CAST(sum(bal_cents) AS DOUBLE) / count(*) AS avg_cents
        |  FROM cents WHERE bal_cents > 0)
        |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  round(sum(c.bal_cents) / 100.0, 2) AS totacctbal
        |FROM cents c, thresh t
        |WHERE c.bal_cents > t.avg_cents
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin) { (s, dir) =>
      val cents = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val thresh = cents.filter(col("bal_cents") > 0)
        .agg((sum(col("bal_cents")).cast("double") / count(lit(1)))
          .as("avg_cents"))
      cents.crossJoin(broadcast(thresh))
        .filter(col("bal_cents") > col("avg_cents"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
            .select(col("o_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("bal_cents")) / 100.0, 2).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // Q21 shape (waiting-supplier multi-EXISTS), adapted to the
    // driver's columns: in a finished multi-supplier order, the
    // supplier whose LATEST shipment strictly trails every other
    // supplier's "kept the order waiting". The oracle keeps TPC-H's
    // correlated EXISTS / NOT-EXISTS formulation; the Spark plan is
    // the scale-right rewrite — ONE (order, supplier) aggregate, two
    // same-partitioning windows (max + count-at-max share a single
    // exchange), an orders equi-join, a broadcast supplier dim, and a
    // TakeOrdered top-20. No lineitem self-joins: the EXISTS pair
    // would scan and shuffle lineitem three times.
    QueryDef.sql(
      "q21_waiting_supplier",
      """WITH ls AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
        |  FROM lineitem GROUP BY l_orderkey, l_suppkey)
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM ls l1
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F'
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate >= l1.ms)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ls = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("ms"))
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = ls
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("max1", max(col("ms")).over(w))
        .withColumn("cnt_at_max",
          sum(when(col("ms") === col("max1"), 1L).otherwise(0L)).over(w))
        .filter(col("n_supp") >= 2 && col("ms") === col("max1") &&
          col("cnt_at_max") === 1)
      flagged
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        // supplier scales with SF — AQE decides (see q7's note)
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }) ++ partsuppDefs

  // ---- partsupp-derived shapes (Q2/Q9/Q11/Q16/Q20) -----------------
  //
  // The driver testdata carries no partsupp table, so BOTH engines
  // derive the same one from part × supplier keys: dbgen's own
  // supplier-assignment closed form (TPC-H spec 4.2.3 — part p's i-th
  // supplier is (p + i·(S/4 + p/S)) mod S, i ∈ 0..3, here 0-based
  // keys) plus integer availqty/supplycost as fixed functions of the
  // keys. All-BIGINT arithmetic → bit-identical across engines. The
  // derived table is |part|·4 rows (80k at sf0.1) — broadcast-sized
  // by construction at any sf, and the derivation itself is
  // scan-level: part keys × a 4-element literal array × one 1-row
  // supplier-count scalar (no data shuffle).
  //
  // Two honesty caveats, identical in both engines so parity holds:
  // at S=10 (sf0.001) the stride can collide mod S, duplicating a
  // (part, supplier) pair with different offers; and the testdata's
  // lineitem picked l_suppkey independently of this formula, so the
  // Q9/Q20 composite-key joins match ~4/S of lineitems — the JOIN
  // SHAPE (the thing these queries exist to exercise) is unchanged.

  private val psSuppkeySql =
    "(p_partkey + i * (s_cnt // 4 + p_partkey // s_cnt)) % s_cnt"

  /** DuckDB CTEs `sc` (supplier count) + `partsupp`. */
  private val partsuppSql: String =
    s"""sc AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier),
       |partsupp AS (
       |  SELECT p_partkey AS ps_partkey,
       |    $psSuppkeySql AS ps_suppkey,
       |    (p_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty,
       |    (p_partkey * 31 + ($psSuppkeySql) * 17) % 99901 + 100
       |      AS ps_supplycost_cents
       |  FROM part CROSS JOIN sc
       |  CROSS JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS i) it)""".stripMargin

  /** Spark twin of [[partsuppSql]]. */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sc = Tables.supplier(s, dir).agg(count(lit(1)).cast("long").as("s_cnt"))
    val suppkey = "(p_partkey + i * (s_cnt div 4 + p_partkey div s_cnt)) % s_cnt"
    Tables.part(s, dir).select(col("p_partkey"))
      .crossJoin(broadcast(sc))
      .select(col("p_partkey"), col("s_cnt"),
        explode(array((0L to 3L).map(lit(_)): _*)).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        expr(suppkey).as("ps_suppkey"),
        expr("(p_partkey * 7 + i * 13) % 9999 + 1").as("ps_availqty"),
        expr(s"(p_partkey * 31 + ($suppkey) * 17) % 99901 + 100")
          .as("ps_supplycost_cents"))
  }

  private def partsuppDefs: Seq[QueryDef] = Seq(

    // Q2 shape: min-cost supplier per part within a region — the
    // correlated-min join. Plan: partsupp (broadcast-sized) joins
    // broadcast dims; the per-part min and the rejoin share one
    // ps_partkey exchange; part filter lands before the rejoin.
    QueryDef.sql(
      "q2_min_cost_supplier",
      s"""WITH $partsuppSql,
         |cost AS (
         |  SELECT ps.ps_partkey, ps.ps_supplycost_cents,
         |         s.s_acctbal, s.s_name, n.n_name
         |  FROM partsupp ps
         |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
         |  JOIN nation n   ON n.n_nationkey = s.s_nationkey
         |  JOIN region r   ON r.r_regionkey = n.n_regionkey
         |  WHERE r.r_name = 'EUROPE'),
         |best AS (
         |  SELECT ps_partkey, min(ps_supplycost_cents) AS min_cost
         |  FROM cost GROUP BY 1)
         |SELECT c.s_acctbal, c.s_name, c.n_name,
         |  c.ps_partkey AS p_partkey, p.p_brand,
         |  c.ps_supplycost_cents AS supplycost_cents
         |FROM cost c
         |JOIN best b ON b.ps_partkey = c.ps_partkey
         |           AND c.ps_supplycost_cents = b.min_cost
         |JOIN part p ON p.p_partkey = c.ps_partkey
         |WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin) { (s, dir) =>
      val n = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val cost = partsupp(s, dir)
        .join(Tables.supplier(s, dir), col("s_suppkey") === col("ps_suppkey"))
        .join(broadcast(n), col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(r), col("r_regionkey") === col("n_regionkey"))
        .select(col("ps_partkey"), col("ps_supplycost_cents"),
          col("s_acctbal"), col("s_name"), col("n_name"))
      val best = cost.groupBy("ps_partkey")
        .agg(min(col("ps_supplycost_cents")).as("min_cost"))
      cost.join(best, Seq("ps_partkey"))
        .filter(col("ps_supplycost_cents") === col("min_cost"))
        .join(Tables.part(s, dir)
            .filter(col("p_size") <= 15 && col("p_type") === "ECONOMY")
            .select(col("p_partkey"), col("p_brand")),
          col("p_partkey") === col("ps_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("ps_partkey").as("p_partkey"), col("p_brand"),
          col("ps_supplycost_cents").as("supplycost_cents"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q9 shape: product-line profit by nation × year. Money stays
    // integer end-to-end: revenue rounds to cents PER ROW (identical
    // double → identical floor in both engines), then BIGINT sums —
    // order-independent, so the nation×year rollup hash-matches.
    QueryDef.sql(
      "q9_product_profit",
      s"""WITH $partsuppSql
         |SELECT n.n_name AS nation,
         |  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(
         |    CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)
         |    - ps.ps_supplycost_cents * CAST(floor(l.l_quantity) AS BIGINT)
         |  ) AS BIGINT) AS profit_cents
         |FROM lineitem l
         |JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
         |JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
         |                AND ps.ps_suppkey = l.l_suppkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation n   ON n.n_nationkey = s.s_nationkey
         |JOIN orders o   ON o.o_orderkey = l.l_orderkey
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").like("%red%"))
            .select(col("p_partkey")),
          col("p_partkey") === col("l_partkey"))
        .join(partsupp(s, dir),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
            .cast("long")
            - col("ps_supplycost_cents") * floor(col("l_quantity")).cast("long"))
          .cast("long").as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 shape: important stock — regional inventory value per part
    // vs a scale-invariant share threshold (2× the mean part value,
    // not TPC-H's absolute fraction, so the predicate stays selective
    // at every sf; region not nation, so the filtered supplier set is
    // non-empty even at sf0.001's 10 suppliers). Integer value → total enters as a 1-row broadcast
    // scalar; one ps_partkey aggregation.
    QueryDef.sql(
      "q11_important_stock",
      s"""WITH $partsuppSql,
         |natps AS (
         |  SELECT ps.ps_partkey,
         |    ps.ps_supplycost_cents * ps.ps_availqty AS v
         |  FROM partsupp ps
         |  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
         |  JOIN nation n   ON n.n_nationkey = s.s_nationkey
         |  JOIN region r   ON r.r_regionkey = n.n_regionkey
         |  WHERE r.r_name = 'EUROPE'),
         |agg AS (
         |  SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
         |  FROM natps GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(v) AS BIGINT) AS total,
         |         CAST(count(DISTINCT ps_partkey) AS BIGINT) AS np
         |  FROM natps)
         |SELECT a.ps_partkey, a.value_cents
         |FROM agg a CROSS JOIN tot
         |WHERE a.value_cents * np > 2 * total
         |ORDER BY value_cents DESC, ps_partkey""".stripMargin) { (s, dir) =>
      val natps = partsupp(s, dir)
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("s_suppkey") === col("ps_suppkey"))
        .join(broadcast(Tables.nation(s, dir)
            .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
              col("r_regionkey") === col("n_regionkey"))
            .select(col("n_nationkey"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
      val agg = natps.groupBy("ps_partkey")
        .agg(sum(col("v")).cast("long").as("value_cents"))
      val tot = natps.agg(sum(col("v")).cast("long").as("total"),
        countDistinct(col("ps_partkey")).cast("long").as("np"))
      agg.crossJoin(broadcast(tot))
        .filter(col("value_cents") * col("np") > lit(2) * col("total"))
        .select(col("ps_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("ps_partkey"))
    },

    // Q16 shape: supplier diversity per (brand, type, size) with a
    // NOT-IN supplier exclusion (negative balance proxies the spec's
    // complaint-comment filter — the schema carries no s_comment).
    // The exclusion compiles to a broadcast anti-join; the distinct
    // count rides one (brand, type, size) exchange.
    QueryDef.sql(
      "q16_part_supplier_cnt",
      s"""WITH $partsuppSql
         |SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
         |  CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM partsupp ps
         |JOIN part p ON p.p_partkey = ps.ps_partkey
         |WHERE p.p_brand <> 'Brand#2'
         |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
         |  AND ps.ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      partsupp(s, dir)
        .join(Tables.part(s, dir)
            .filter(col("p_brand") =!= "Brand#2" &&
              col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
          col("p_partkey") === col("ps_partkey"))
        .join(Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
            .select(col("s_suppkey")),
          col("s_suppkey") === col("ps_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q20 shape: suppliers holding excess stock (availqty > half the
    // year's shipped quantity) of a part-name family, in one nation.
    // The inner existence test is a LEFT SEMI chain: shipped pairs
    // aggregate ONCE on (part, supp), then probe partsupp — never a
    // row-per-lineitem join into the supplier scan.
    QueryDef.sql(
      "q20_excess_stock",
      s"""WITH $partsuppSql,
         |shipped AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY 1, 2),
         |excess AS (
         |  SELECT DISTINCT ps.ps_suppkey
         |  FROM partsupp ps
         |  JOIN part p    ON p.p_partkey = ps.ps_partkey
         |                AND p.p_name LIKE 'small%'
         |  JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
         |                 AND sh.l_suppkey = ps.ps_suppkey
         |  WHERE 2 * ps.ps_availqty > sh.qty)
         |SELECT s.s_name, n.n_name
         |FROM supplier s
         |JOIN nation n ON n.n_nationkey = s.s_nationkey
         |WHERE n.n_name = 'NATION_3'
         |  AND s.s_suppkey IN (SELECT ps_suppkey FROM excess)
         |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val shipped = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(floor(col("l_quantity")).cast("long")).cast("long").as("qty"))
      val excess = partsupp(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").like("small%"))
            .select(col("p_partkey")),
          col("p_partkey") === col("ps_partkey"))
        .join(shipped,
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .filter(lit(2) * col("ps_availqty") > col("qty"))
        .select(col("ps_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .filter(col("n_name") === "NATION_3")
            .select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .join(excess, col("ps_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    })
}
