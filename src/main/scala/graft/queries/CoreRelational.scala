package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 operator inventory, re-expressed over the driver's
  * synthetic tables so the DuckDB oracle can verify each semantic.
  *
  * Mapping (reference → here):
  *  - P1/P4 column normalize+project      → p1_normalize_project
  *  - P5 equality-predicate ledger filter → p5_eq_filter
  *  - P6 value-blacklist filter           → p6_blacklist_filter
  *  - P7 time-range predicate             → p7_time_range
  *  - P8 interval OVERLAPS                → p8_interval_overlap
  *  - P9 null-bounds guard                → p9_null_bounds_guard
  *  - J1 dim equi-join                    → j1_dim_join
  *  - J2 left enrich join                 → j2_enrich_left_join
  *  - J3 3-way star join                  → j3_star_join
  *  - J4 anti-join vs ledger              → j4_anti_join
  *  - J7 semi-join (ANY list)             → j7_semi_join
  *  - J8 keep-latest dedup (DELETE self-join, ingestObsTasks.py:45-56)
  *                                        → j8_keep_latest_dedup
  *  - J9 rerun-detection gate             → j9_rerun_gate
  *  - A1 min/max bounds, A2 distinct, A3 sorted value collection,
  *    A5 drop_duplicates(subset), A6/A7 fixed-category pivot
  *    (crosstab), A8 JSON agg             → a1..a8_*
  *  - O1-O4 sorts are folded into every query's ORDER BY.
  *  - U1 vertical concat                  → u1_union
  *
  * Performance notes (100 TB thinking): dimension joins broadcast the
  * small side explicitly; aggregations rely on partial (map-side)
  * aggregation, window dedup shuffles once on its partition keys; all
  * scans project only needed columns so parquet pruning kicks in.
  */
object CoreRelational {

  /** The as-of fixture every j10/j10b/j11/j12 arm shares: purchases as
    * the probe side, clicks keyed-unique per (user, ts) — AsOfJoin's
    * determinism contract. ONE definition so a tie-rule change cannot
    * desynchronize the four direction/plan variants. */
  private def asofSides(ev: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("click_ts"))
      .agg(max("event_id").as("click_event_id"))
      .select("user_id", "click_ts", "click_event_id")
    (purchases, clicks)
  }

  def defs: Seq[QueryDef] = Seq(

    // --- A-class baseline aggregation (TPC-H Q1 flavored) ------------
    QueryDef.sql(
      "q1_sum_agg",
      // money sums run over EXACT integer units (price/disc carry 2
      // decimals each, so price*(1-disc) is exact at 4): a double sum
      // is partial-agg-order dependent and can flip round(.,2) at a
      // boundary across shuffle-partition counts — the a10/q9 cents
      // discipline applied to the flagship shape (sums in decimal /
      // DuckDB HUGEINT for SF headroom; qty is integer-valued, its
      // double sum is exact)
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2)                        AS sum_qty,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
        |  round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
        |  round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*), 4) AS avg_disc,
        |  count(*)                                         AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(round(col("l_extendedprice") * 100, 0).cast(dec)) / 100.0, 2)
            .as("sum_base_price"),
          round(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
            .cast(dec)) / 10000.0, 2).as("sum_disc_price"),
          round(sum(round(col("l_discount") * 100, 0).cast(dec)) / 100.0 /
            count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- P1/P4/F2: normalize, rename, cast, project ------------------
    QueryDef.sql(
      "p1_normalize_project",
      """SELECT c_custkey AS custkey, CAST(c_custkey AS VARCHAR) AS custkey_str,
        |  upper(c_name) AS name_uc, lower(c_mktsegment) AS segment_lc
        |FROM customer ORDER BY custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(
        col("c_custkey").as("custkey"),
        col("c_custkey").cast("string").as("custkey_str"),
        upper(col("c_name")).as("name_uc"),
        lower(col("c_mktsegment")).as("segment_lc"))
        .orderBy("custkey")
    },

    // --- P5: equality-predicate filter (ledger-scan shape) -----------
    QueryDef.sql(
      "p5_eq_filter",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click' AND value > 100.0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "click" && col("value") > 100.0)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // --- P6: value-blacklist filter ----------------------------------
    QueryDef.sql(
      "p6_blacklist_filter",
      """SELECT event_id, event_type FROM events
        |WHERE event_type NOT IN ('click', 'view')
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(!col("event_type").isin("click", "view"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    },

    // --- P7: time-range predicate ------------------------------------
    QueryDef.sql(
      "p7_time_range",
      """SELECT event_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-03 00:00:00'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp") &&
          col("ts") <= lit("2024-01-03 00:00:00").cast("timestamp"))
        .select(
          col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .orderBy("event_id")
    },

    // --- P8 + F7: interval overlap (half-open OVERLAPS semantics) ----
    QueryDef.sql(
      "p8_interval_overlap",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderdate < TIMESTAMP '1996-03-01 00:00:00'
        |  AND o_orderdate + INTERVAL 30 DAY > TIMESTAMP '1996-02-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") + expr("INTERVAL 30 DAYS") > lit("1996-02-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    },

    // --- P9: null-bounds guard (skip file when min & max both null) --
    QueryDef.sql(
      "p9_null_bounds_guard",
      """SELECT user_id, err_min, err_max,
        |  (err_min IS NULL AND err_max IS NULL) AS skip_ingest
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'error' THEN value END) AS err_min,
        |    max(CASE WHEN event_type = 'error' THEN value END) AS err_max
        |  FROM events GROUP BY 1)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "error", col("value"))).as("err_min"),
          max(when(col("event_type") === "error", col("value"))).as("err_max"))
        .withColumn("skip_ingest", col("err_min").isNull && col("err_max").isNull)
        .orderBy("user_id")
    },

    // --- J1: dimension equi-join chain (broadcast small dims) --------
    QueryDef.sql(
      "j1_dim_join",
      """SELECT c.c_custkey, n.n_name, r.r_name
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'AMERICA'
        |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")
    },

    // --- J2 + F8: left enrich join, missing key → '' -----------------
    QueryDef.sql(
      "j2_enrich_left_join",
      """SELECT l.l_orderkey, l.l_linenumber, coalesce(s.s_name, '') AS s_name
        |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, dir) =>
      // supplier scales with SF — no broadcast hint; AQE picks BHJ while
      // the build side fits and can fall back to SMJ at scale
      Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("s_name"), lit("")).as("s_name"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // --- J3: 3-way star join + aggregation ---------------------------
    QueryDef.sql(
      "j3_star_join",
      """SELECT c.c_mktsegment,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        // customer scales with SF — leave the strategy to AQE
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("c_mktsegment")
    },

    // --- J4: anti-join (new files vs ledger shape) -------------------
    QueryDef.sql(
      "j4_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // --- J7: semi-join via in-list (ANY(array)) ----------------------
    QueryDef.sql(
      "j7_semi_join",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49.0)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      Tables.supplier(s, dir)
        .join(
          Tables.lineitem(s, dir).filter(col("l_quantity") >= 49.0)
            .select(col("l_suppkey").as("s_suppkey")),
          Seq("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // --- J13: full outer reconciliation ------------------------------
    // the two-snapshot diff audit (ledger vs store, last period vs
    // this): per-part activity in the two halves of the date range,
    // FULL OUTER joined so parts present on only one side surface with
    // a status instead of silently dropping — the one join type the
    // reference surface never exercises
    QueryDef.sql(
      "j13_full_outer_diff",
      """WITH h1 AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_h1,
        |    round(sum(l_quantity), 2) AS qty_h1
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey),
        |h2 AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_h2,
        |    round(sum(l_quantity), 2) AS qty_h2
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey)
        |SELECT coalesce(h1.l_partkey, h2.l_partkey) AS l_partkey,
        |  coalesce(h1.n_h1, 0) AS n_h1, coalesce(h2.n_h2, 0) AS n_h2,
        |  coalesce(h1.qty_h1, 0.0) AS qty_h1, coalesce(h2.qty_h2, 0.0) AS qty_h2,
        |  CASE WHEN h1.l_partkey IS NULL THEN 'only_h2'
        |       WHEN h2.l_partkey IS NULL THEN 'only_h1'
        |       ELSE 'both' END AS status
        |FROM h1 FULL OUTER JOIN h2 ON h2.l_partkey = h1.l_partkey
        |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val cut = lit("1998-01-01").cast("timestamp")
      def half(pred: Column, n: String, q: String) =
        li.filter(pred).groupBy("l_partkey")
          .agg(count(lit(1)).as(n), round(sum(col("l_quantity")), 2).as(q))
      val h1 = half(col("l_shipdate") < cut, "n_h1", "qty_h1")
      val h2 = half(col("l_shipdate") >= cut, "n_h2", "qty_h2")
        .withColumnRenamed("l_partkey", "pk2")
      h1.join(h2, col("pk2") === col("l_partkey"), "full_outer")
        .select(
          coalesce(col("l_partkey"), col("pk2")).as("l_partkey"),
          coalesce(col("n_h1"), lit(0L)).as("n_h1"),
          coalesce(col("n_h2"), lit(0L)).as("n_h2"),
          coalesce(col("qty_h1"), lit(0.0)).as("qty_h1"),
          coalesce(col("qty_h2"), lit(0.0)).as("qty_h2"),
          when(col("l_partkey").isNull, "only_h2")
            .when(col("pk2").isNull, "only_h1")
            .otherwise("both").as("status"))
        .orderBy("l_partkey")
    },

    // --- J8: keep-latest dedup (reference DELETE self-join) ----------
    // Highest (ts, event_id) wins per (user_id, event_type) — the
    // precedence-column restatement of "highest serial id wins"
    // (reference ingestObsTasks.py:45-56).
    QueryDef.sql(
      "j8_keep_latest_dedup",
      """SELECT user_id, event_type, event_id, value FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, event_type
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    },

    // --- J10: as-of join (latest prior right row per key) ------------
    QueryDef.sql(
      "j10_asof_join",
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_event_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, p.purchase_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  c.click_event_id AS asof_click_event_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.user_id, p.purchase_event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val (purchases, clicks) = asofSides(ev)
      graft.operators.AsOfJoin(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_event_id", "click_ts"))
        .select(col("user_id"), col("purchase_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("asof_click_event_id"),
          date_format(col("asof_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_click_ts"))
        .orderBy("user_id", "purchase_event_id")
    },

    // --- J10b: same as-of semantics on the single-exchange plan ------
    // (timeBuckets=1, the plan for known well-distributed keys) — both
    // physical strategies stay oracle-checked against DuckDB's native
    // ASOF JOIN, not just the default.
    QueryDef.sql(
      "j10b_asof_single",
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_event_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, p.purchase_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  c.click_event_id AS asof_click_event_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS asof_click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.user_id, p.purchase_event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val (purchases, clicks) = asofSides(ev)
      graft.operators.AsOfJoin(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_event_id", "click_ts"), timeBuckets = 1)
        .select(col("user_id"), col("purchase_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("asof_click_event_id"),
          date_format(col("asof_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("asof_click_ts"))
        .orderBy("user_id", "purchase_event_id")
    },

    // --- J9: rerun-detection gate (>1 distinct marker) ---------------
    QueryDef.sql(
      "j9_rerun_gate",
      """SELECT user_id, count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY 1
        |HAVING count(DISTINCT event_type) > 3
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(countDistinct(col("event_type")).as("n_types"))
        .filter(col("n_types") > 3)
        .orderBy("user_id")
    },

    // --- A1: min/max time bounds per group ---------------------------
    QueryDef.sql(
      "a1_minmax_bounds",
      """SELECT event_type,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS t_min,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS t_max,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_min"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t_max"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // --- A2: DISTINCT -------------------------------------------------
    QueryDef.sql(
      "a2_distinct",
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    },

    // --- A3: sorted distinct value collection ------------------------
    QueryDef.sql(
      "a3_collect_sorted",
      """SELECT n.n_name,
        |  string_agg(DISTINCT c.c_mktsegment, ',' ORDER BY c.c_mktsegment) AS segments
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))
        .orderBy("n_name")
    },

    // --- A5: drop_duplicates(subset) with deterministic precedence ---
    QueryDef.sql(
      "a5_argmin_dedup",
      """SELECT p_brand, p_partkey, p_name FROM part
        |QUALIFY row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) = 1
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
      Tables.part(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_brand", "p_partkey", "p_name")
        .orderBy("p_brand")
    },

    // --- A6: EAV/crosstab pivot with FIXED category list -------------
    // 'refund' never occurs → column must still exist, all NULL
    // (reference A7 contract, scripts/get_obs_timeseries_station_data.sql:31-38).
    QueryDef.sql(
      "a6_eav_pivot",
      """SELECT user_id,
        |  round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'refund'   THEN value END), 2) AS refund,
        |  round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "refund", "signup", "view"))
        .agg(round(sum(col("value")), 2))
        .orderBy("user_id")
    },

    // --- A7: time-series pivot (hour buckets × fixed categories) -----
    QueryDef.sql(
      "a7_timeseries_pivot",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
        |  round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'refund'   THEN value END), 2) AS refund,
        |  round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("bucket", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("bucket")
        .pivot("event_type", Seq("click", "error", "purchase", "refund", "signup", "view"))
        .agg(round(sum(col("value")), 2))
        .orderBy("bucket")
    },

    // --- A8: JSON aggregation (ordered array of objects) -------------
    QueryDef.sql(
      "a8_json_agg",
      """SELECT user_id,
        |  '[' || string_agg(
        |      '{"t":"' || strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '","e":"' || event_type || '"}',
        |      ',' ORDER BY strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), event_type, event_id
        |  ) || ']' AS js
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("user_id"),
          struct(
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("t"),
            col("event_type").as("e"),
            col("event_id").as("i")).as("rec"))
        .groupBy("user_id")
        .agg(array_sort(collect_list(col("rec"))).as("recs"))
        .select(
          col("user_id"),
          concat(
            lit("["),
            array_join(
              transform(col("recs"), r =>
                concat(lit("{\"t\":\""), r.getField("t"),
                  lit("\",\"e\":\""), r.getField("e"), lit("\"}"))),
              ","),
            lit("]")).as("js"))
        .orderBy("user_id")
    },

    // --- U1: vertical concat (union of station sets shape) -----------
    QueryDef.sql(
      "u1_union",
      """SELECT c_name AS name, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS name, 'supplier' AS kind FROM supplier
        |ORDER BY name, kind""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(col("c_name").as("name"), lit("customer").as("kind"))
        .unionByName(
          Tables.supplier(s, dir).select(col("s_name").as("name"), lit("supplier").as("kind")))
        .orderBy("name", "kind")
    },

    // --- S3 + F4: filename timemark extraction (reference regex) -----
    QueryDef.sql(
      "s3_filename_extract",
      """SELECT event_id,
        |  'noaaweb_stationdata_water_level_' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.csv' AS fname,
        |  regexp_extract(
        |    'noaaweb_stationdata_water_level_' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || '.csv',
        |    '([0-9]+-[0-9]+-[0-9]+T[0-9]+:[0-9]+:[0-9]+)', 1) AS timemark
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("fname",
          concat(lit("noaaweb_stationdata_water_level_"),
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit(".csv")))
        .select(
          col("event_id"), col("fname"),
          regexp_extract(col("fname"),
            "([0-9]+-[0-9]+-[0-9]+T[0-9]+:[0-9]+:[0-9]+)", 1).as("timemark"))
        .orderBy("event_id")
    },

    // --- F1-F3/F10: string scalar suite ------------------------------
    QueryDef.sql(
      "f_string_funcs",
      """SELECT p_partkey,
        |  p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
        |  upper(p_name) AS name_uc,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  split_part(p_name, ' ', -1) AS last_word,
        |  length(p_name) AS name_len,
        |  substr(p_type, 1, 3) AS type_pfx
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
        upper(col("p_name")).as("name_uc"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        element_at(split(col("p_name"), " "), -1).as("last_word"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 3).as("type_pfx"))
        .orderBy("p_partkey")
    },

    // --- F5-F7: datetime scalar suite --------------------------------
    QueryDef.sql(
      "f_datetime_funcs",
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d') AS day_str,
        |  CAST(hour(ts) AS INTEGER) AS hr,
        |  strftime(ts + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS plus36h,
        |  (ts < TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 31 DAY) AS before_lookback,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
        hour(col("ts")).as("hr"),
        date_format(col("ts") + expr("INTERVAL 36 HOURS"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("plus36h"),
        (col("ts") < lit("2024-02-01 00:00:00").cast("timestamp") - expr("INTERVAL 31 DAYS")).as("before_lookback"),
        unix_timestamp(col("ts")).as("epoch_s"))
        .orderBy("event_id")
    },

    // --- A10: ROLLUP / grouping sets ---------------------------------
    // Subtotal + grand-total levels in one pass (Spark rollup ≡ SQL
    // GROUP BY ROLLUP); money sums in exact integer cents, and the
    // grouping_id bitmask (leftmost col = MSB, identical encodings in
    // Spark and DuckDB) disambiguates rollup-null from data-null.
    QueryDef.sql(
      "a10_rollup",
      """SELECT coalesce(o_orderstatus, '<all>') AS status,
        |  coalesce(o_orderpriority, '<all>') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("sum_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("gid"), col("n_orders"), col("sum_cents"))
        .orderBy("gid", "status", "priority")
    },

    // --- O5: running / sliding window aggregates ---------------------
    // Per-key ordered analytics: running max, 3-row sliding min,
    // lag/lead neighbors, cumulative conditional count. One hash
    // exchange on user_id serves every frame; measures are raw values
    // or integer sums (order-independent), never FP accumulation.
    QueryDef.sql(
      "o5_running_window",
      """SELECT user_id, event_id,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  lag(event_id) OVER w AS prev_event_id,
        |  lead(event_id) OVER w AS next_event_id,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max_value,
        |  min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_min_value,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_errors
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        max(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("run_max_value"),
        min(col("value")).over(w.rowsBetween(-2, Window.currentRow))
          .as("mov_min_value"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("run_errors"))
        .orderBy("user_id", "rn")
    },

    // --- J11: FORWARD as-of join -------------------------------------
    // Same skew-safe union+window machinery as j10, opposite frame
    // direction: each purchase picks the EARLIEST click at-or-after it.
    QueryDef.sql(
      "j11_asof_forward",
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_event_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, p.purchase_event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  c.click_event_id AS next_click_event_id,
        |  strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS next_click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts <= c.click_ts
        |ORDER BY p.user_id, p.purchase_event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val (purchases, clicks) = asofSides(ev)
      graft.operators.AsOfJoin(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_event_id", "click_ts"),
        payloadPrefix = "next_", direction = "forward")
        .select(col("user_id"), col("purchase_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("next_click_event_id"),
          date_format(col("next_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("next_click_ts"))
        .orderBy("user_id", "purchase_event_id")
    },

    // --- J12: NEAREST as-of join -------------------------------------
    // Closer of the backward/forward matches; exact ties (integer
    // micros both engines) resolve backward. One shuffle, both frame
    // directions in the same window partitioning.
    QueryDef.sql(
      "j12_asof_nearest",
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_event_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (
        |  SELECT p.user_id, p.purchase_event_id, p.ts,
        |    c.click_event_id AS bid, c.click_ts AS bts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts >= c.click_ts),
        |f AS (
        |  SELECT p.purchase_event_id,
        |    c.click_event_id AS fid, c.click_ts AS fts
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts <= c.click_ts)
        |SELECT b.user_id, b.purchase_event_id,
        |  strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  CASE WHEN bid IS NULL THEN fid WHEN fid IS NULL THEN bid
        |       WHEN epoch_us(b.ts) - epoch_us(bts)
        |         <= epoch_us(fts) - epoch_us(b.ts) THEN bid ELSE fid
        |  END AS near_click_event_id,
        |  strftime(
        |    CASE WHEN bid IS NULL THEN fts WHEN fid IS NULL THEN bts
        |         WHEN epoch_us(b.ts) - epoch_us(bts)
        |           <= epoch_us(fts) - epoch_us(b.ts) THEN bts ELSE fts
        |    END, '%Y-%m-%d %H:%M:%S.%f') AS near_click_ts
        |FROM b JOIN f USING (purchase_event_id)
        |ORDER BY b.user_id, b.purchase_event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val (purchases, clicks) = asofSides(ev)
      graft.operators.AsOfJoin(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_event_id", "click_ts"),
        payloadPrefix = "near_", direction = "nearest")
        .select(col("user_id"), col("purchase_event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("near_click_event_id"),
          date_format(col("near_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("near_click_ts"))
        .orderBy("user_id", "purchase_event_id")
    },

    // --- F13: JSON extraction ----------------------------------------
    // Path extraction + schema'd parse of the props JSON column (the
    // reference's property payloads travel as JSON strings). Both
    // routes stay row-local scalar expressions — JSON never becomes a
    // shuffle key, and the typed route (from_json) is the one a 100 TB
    // pipeline should batch-parse once and reuse.
    QueryDef.sql(
      "f_json_funcs",
      """SELECT event_id,
        |  CAST(props::JSON->>'k' AS BIGINT) AS k_path,
        |  CAST(props::JSON->>'k' AS BIGINT) AS k_typed,
        |  (CAST(props::JSON->>'k' AS BIGINT) % 7 = 0) AS k_div7,
        |  CAST(props::JSON->>'missing' AS BIGINT) AS k_absent
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k").as("k_typed"),
        (get_json_object(col("props"), "$.k").cast("long") % 7 === 0).as("k_div7"),
        get_json_object(col("props"), "$.missing").cast("long").as("k_absent"))
        .orderBy("event_id")
    },

    // --- A12: exact percentiles --------------------------------------
    // Exact interpolated quantiles (Spark `percentile` ≡ DuckDB
    // quantile_cont: lower + frac·(upper−lower) over the sorted set).
    // Quantities are integer-valued so interpolants are exact binary
    // fractions — cross-engine stable; round(6) belts-and-braces. The
    // approx sketch counterpart (a9) audits against these exact values.
    QueryDef.sql(
      "a12_percentiles",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
        .orderBy("l_returnflag")
    },

    // --- U2/U3: set operations ---------------------------------------
    // INTERSECT / EXCEPT (set) and INTERSECT ALL / EXCEPT ALL
    // (multiset) in one audit frame. Spark plans set ops as aggregated
    // joins (left-semi/anti after distinct; count-compare for ALL) —
    // the declarative forms shuffle once on the compared columns and
    // AQE sizes the sides, so nothing here needs hand-planning. The
    // ALL arms re-aggregate to (value, multiplicity) so the output
    // stays small and hash-stable regardless of duplicate counts.
    QueryDef.sql(
      "u2_setops",
      """WITH nb AS (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT SELECT s_nationkey FROM supplier),
        |nc AS (
        |  SELECT c_nationkey AS k FROM customer
        |  EXCEPT SELECT s_nationkey FROM supplier),
        |pe AS (
        |  SELECT o_orderpriority AS v FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
        |pc AS (
        |  SELECT o_orderpriority AS v FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
        |SELECT op, val, n FROM (
        |  SELECT 'nation_both' AS op, CAST(k AS VARCHAR) AS val,
        |    CAST(1 AS BIGINT) AS n FROM nb
        |  UNION ALL
        |  SELECT 'nation_cust_only', CAST(k AS VARCHAR), CAST(1 AS BIGINT) FROM nc
        |  UNION ALL
        |  SELECT 'prio_o_minus_f', v, CAST(count(*) AS BIGINT) FROM pe GROUP BY v
        |  UNION ALL
        |  SELECT 'prio_o_meet_f', v, CAST(count(*) AS BIGINT) FROM pc GROUP BY v)
        |ORDER BY op, val""".stripMargin) { (s, dir) =>
      val cust = Tables.customer(s, dir).select(col("c_nationkey").as("k"))
      val supp = Tables.supplier(s, dir).select(col("s_nationkey").as("k"))
      val open = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select(col("o_orderpriority").as("v"))
      val filled = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderpriority").as("v"))
      def tag(df: org.apache.spark.sql.DataFrame, op: String) =
        df.select(lit(op).as("op"), col("k").cast("string").as("val"),
          lit(1L).as("n"))
      def tagCounts(df: org.apache.spark.sql.DataFrame, op: String) =
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
          .select(lit(op).as("op"), col("v").as("val"), col("n"))
      tag(cust.intersect(supp), "nation_both")
        .unionByName(tag(cust.except(supp), "nation_cust_only"))
        .unionByName(tagCounts(open.exceptAll(filled), "prio_o_minus_f"))
        .unionByName(tagCounts(open.intersectAll(filled), "prio_o_meet_f"))
        .orderBy("op", "val")
    },

    // --- A11: CUBE ----------------------------------------------------
    // Full 2^n grouping lattice in one pass (Spark cube ≡ GROUP BY
    // CUBE): every (returnflag × linestatus) margin plus both
    // single-dim margins and the grand total, gid disambiguating
    // rollup-null from data-null. Money in exact integer cents.
    QueryDef.sql(
      "a11_cube",
      """SELECT coalesce(l_returnflag, '<all>') AS rflag,
        |  coalesce(l_linestatus, '<all>') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rflag, lstatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_cents"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("rflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("lstatus"),
          col("gid"), col("n_items"), col("sum_qty"), col("sum_cents"))
        .orderBy("gid", "rflag", "lstatus")
    },

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // MUST pair with NULL keys — the semantics a plain equi-join
    // silently drops
    QueryDef.sql(
      "p11_null_safe_join",
      """WITH k AS (
        |  SELECT n_nationkey, n_name, NULLIF(n_regionkey, 0) AS rk
        |  FROM nation)
        |SELECT a.n_name AS a_name, b.n_name AS b_name
        |FROM k a JOIN k b
        |  ON a.rk IS NOT DISTINCT FROM b.rk
        | AND a.n_nationkey < b.n_nationkey
        |ORDER BY a_name, b_name""".stripMargin) { (s, dir) =>
      val k = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"),
          nullif(col("n_regionkey"), lit(0)).as("rk"))
      val a = k.toDF("a_key", "a_name", "a_rk")
      val b = k.toDF("b_key", "b_name", "b_rk")
      a.join(b, col("a_rk") <=> col("b_rk") && col("a_key") < col("b_key"))
        .select(col("a_name"), col("b_name"))
        .orderBy("a_name", "b_name")
    },

    // value-based RANGE window frame (not ROWS): neighbors within a
    // ±5000-cent band of each row's own value — ordering and frame in
    // exact integer cents so both engines agree bit-for-bit
    QueryDef.sql(
      "o8_range_frame",
      """WITH c AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events)
        |SELECT user_id, event_id, cents,
        |  CAST(count(*) OVER w AS BIGINT) AS n_within_band,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_within_band
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY cents
        |  RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, cents, event_id""".stripMargin) { (s, dir) =>
      val base = Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("cents"))
        .rangeBetween(-5000L, Window.currentRow)
      base.select(
        col("user_id"), col("event_id"), col("cents"),
        count(lit(1)).over(w).cast("long").as("n_within_band"),
        sum(col("cents")).over(w).cast("long").as("cents_within_band"))
        .orderBy("user_id", "cents", "event_id")
    },

    // argmax/argmin + boolean aggregate surface: max_by/min_by with a
    // composite UNIQUE ordering key (chars then id — ties would
    // otherwise be engine-arbitrary; the 2^40 stride keeps the pack
    // injective up to a trillion doc ids, where *1e6 broke at 1e6
    // docs and made tie winners engine-arbitrary again), bool_or/
    // bool_and gates
    QueryDef.sql(
      "a16_argmax_funcs",
      """SELECT lang,
        |  CAST(arg_max(doc_id, n_chars * 1099511627776 + doc_id) AS BIGINT) AS longest_doc,
        |  CAST(arg_min(doc_id, n_chars * 1099511627776 + doc_id) AS BIGINT) AS shortest_doc,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  bool_or(n_chars > 400) AS any_long,
        |  bool_and(n_chars > 40) AS all_nontrivial
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val key = col("n_chars") * 1099511627776L + col("doc_id") // 2^40 stride
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          max_by(col("doc_id"), key).as("longest_doc"),
          min_by(col("doc_id"), key).as("shortest_doc"),
          max(col("n_chars")).as("max_chars"),
          bool_or(col("n_chars") > 400).as("any_long"),
          bool_and(col("n_chars") > 40).as("all_nontrivial"))
        .orderBy("lang")
    },

    // melt/unpivot — the inverse of the A6/A7 pivots: wide measure
    // columns to (key, measure, value) rows, the long form every
    // per-measure rollup or ML feature table starts from. Spark's
    // native unpivot (an Expand node — scan-level fan-out of
    // #measures, no shuffle, no join); bounded here by the orderkey
    // filter for a row-level hash compare
    QueryDef.sql(
      "a17_unpivot", {
        val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(m => s"SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS value " +
            "FROM lineitem WHERE l_orderkey < 100")
          .mkString("\nUNION ALL ")
        s"""$arms
           |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin
      }) { (s, dir) =>
      Tables.lineitem(s, dir).filter(col("l_orderkey") < 100)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // explicit GROUPING SETS — the third lattice form next to ROLLUP/
    // CUBE: exactly the (lang), (source), () slices, no cross products
    QueryDef.sql(
      "a15_grouping_sets",
      """SELECT coalesce(lang, '<all>') AS lang_g,
        |  coalesce(source, '<all>') AS source_g,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY gid, lang_g, source_g""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("source")), Seq.empty),
          col("lang"), col("source"))
        .agg(
          grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .select(
          coalesce(col("lang"), lit("<all>")).as("lang_g"),
          coalesce(col("source"), lit("<all>")).as("source_g"),
          col("gid"), col("n_docs"), col("sum_chars"))
        .orderBy("gid", "lang_g", "source_g")
    },

    // --- O6: ranking-function suite ----------------------------------
    // rank/dense_rank/percent_rank/cume_dist run over a TIE-FUL order
    // (event_type) — their outputs depend only on the key, so ties are
    // deterministic; ntile/nth_value need a TOTAL order (value,
    // event_id) because they split tied rows by position. One hash
    // exchange on user_id serves both windows (same partitioning).
    QueryDef.sql(
      "o6_rank_suite",
      """SELECT user_id, event_id,
        |  CAST(rank() OVER wt AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
        |  round(percent_rank() OVER wt, 6) AS prnk,
        |  round(cume_dist() OVER wt, 6) AS cdist,
        |  CAST(ntile(4) OVER wv AS BIGINT) AS quartile,
        |  first_value(event_id) OVER wvf AS smallest_event,
        |  nth_value(event_id, 2) OVER wvf AS second_event
        |FROM events
        |WINDOW
        |  wt AS (PARTITION BY user_id ORDER BY event_type),
        |  wv AS (PARTITION BY user_id ORDER BY value, event_id),
        |  wvf AS (PARTITION BY user_id ORDER BY value, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val wt = Window.partitionBy(col("user_id")).orderBy(col("event_type"))
      val wv = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      val wvf = wv.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        rank().over(wt).cast("long").as("rnk"),
        dense_rank().over(wt).cast("long").as("drnk"),
        round(percent_rank().over(wt), 6).as("prnk"),
        round(cume_dist().over(wt), 6).as("cdist"),
        ntile(4).over(wv).cast("long").as("quartile"),
        first(col("event_id")).over(wvf).as("smallest_event"),
        nth_value(col("event_id"), 2).over(wvf).as("second_event"))
        .orderBy("user_id", "event_id")
    },

    // --- O7: lag/lead neighbors --------------------------------------
    // The temporal-context projection every sequence feature build
    // starts from: each event annotated with its per-user predecessor/
    // successor type and the inter-event gap. lag and lead share ONE
    // window spec, so the whole query is a single Sort+Exchange on
    // user_id — integer-µs gaps, engine-exact.
    QueryDef.sql(
      "o7_lag_lead",
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |  lag(event_type) OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_us"))
        .orderBy("user_id", "event_id")
    },

    // --- P10: bucketed interval JOIN ---------------------------------
    // P8 is a scalar-window filter; this is the JOIN form (points ×
    // per-key windows) that naive Spark plans as a broadcast nested
    // loop. IntervalJoin turns it into explode-to-buckets + hash
    // equi-join + residual — linear, shuffle-partitioned, AQE-eligible.
    QueryDef.sql(
      "p10_interval_join",
      """WITH iv AS (
        |  SELECT user_id, event_id AS window_id, ts AS w_start,
        |    ts + INTERVAL 1 HOUR AS w_end
        |  FROM events WHERE event_type = 'error')
        |SELECT p.event_id, iv.window_id
        |FROM events p JOIN iv
        |  ON p.user_id = iv.user_id
        | AND p.ts >= iv.w_start AND p.ts < iv.w_end
        |ORDER BY p.event_id, iv.window_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val iv = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("window_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      graft.operators.IntervalJoin.pointInInterval(
        ev.select("event_id", "user_id", "ts"), iv, Seq("user_id"),
        "ts", "w_start", "w_end", Seq("window_id"), intervalPrefix = "",
        bucketWidthSeconds = 1800L)
        .select(col("event_id"), col("window_id"))
        .orderBy("event_id", "window_id")
    })
}
