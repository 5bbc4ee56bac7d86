package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining SURVEY §2 inventory rows not naturally exercised by the
  * other modules.
  *
  *  - S1/S6: headerless CSV staging sink + schema'd CSV scan — the
  *    reference's `data_copy_*.csv` handoff (createIngestObsData.py:196)
  *    round-tripped through Spark's CSV source.
  *  - F11/F12: isnull guard + nested-list flatten.
  *
  * S4 (parameterized JDBC scan) is proven directly against an embedded
  * Derby database in sources.JdbcScanSpec (scan + write sink, pushdown
  * asserted); p5_eq_filter/p7_time_range exercise the same predicate
  * shapes over the parquet source for the hash-oracle gate.
  */
object Coverage {

  /** see s1_csv_roundtrip */
  private lazy val csvStageDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_csv_stage")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Recursive delete of the registered scratch dirs at JVM exit —
    * the temp snapshot copies below would otherwise leak one dir per
    * (JVM, sf) onto a long-lived host (`File.deleteOnExit` cannot
    * remove non-empty directories). ONE shared hook draining a queue
    * (not a hook per dir), and the walk stream is closed. */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { dir =>
        try {
          import scala.jdk.CollectionConverters._
          val stream = java.nio.file.Files.walk(
            java.nio.file.Paths.get(dir))
          try stream.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
          finally stream.close()
        } catch { case _: Throwable => () }
      }))
  private def cleanupOnExit(dir: String): Unit = {
    cleanupHook
    scratchDirs.add(dir)
    ()
  }

  /** see s5_snapshot_sql — one snapshot-table copy of `nation` per
    * (JVM, sf dir), built through the registered `snapshot` format's
    * WRITE path (SaveMode.Overwrite is idempotent across repeated
    * invocations: re-runs add a version, live rows stay identical). */
  private val snapNationDirs =
    scala.collection.concurrent.TrieMap[String, String]()
  private def snapNationDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    snapNationDirs.getOrElseUpdate(dir, {
      val d = java.nio.file.Files
        .createTempDirectory("graft_snap_cov").toString
      cleanupOnExit(d)
      Tables.nation(s, dir).write.format("snapshot").mode("overwrite")
        .option("statCols", "n_nationkey").save(d)
      d
    })

  /** see s6_sql_dml — one snapshot-table copy of `nation` per
    * (JVM, sf dir) with a FIXED SQL DML sequence applied exactly once
    * (memoized): DELETE FROM, UPDATE, and a three-clause MERGE INTO,
    * all through the path-addressed statements the GraftExtensions
    * rules resolve. Queries then only READ the final state, so every
    * re-invocation (bench passes, determinism audit) is idempotent. */
  private val sqlDmlDirs =
    scala.collection.concurrent.TrieMap[String, String]()
  private def sqlDmlDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    sqlDmlDirs.getOrElseUpdate(dir, {
      val d = java.nio.file.Files
        .createTempDirectory("graft_sqldml").toString
      cleanupOnExit(d)
      Tables.nation(s, dir).write.format("snapshot").mode("overwrite")
        .option("statCols", "n_nationkey").save(d)
      s.sql(s"DELETE FROM snapshot.`$d` WHERE n_nationkey % 5 = 0")
      s.sql(s"UPDATE snapshot.`$d` SET n_name = upper(n_name) " +
        "WHERE n_regionkey = 2")
      Tables.nation(s, dir).createOrReplaceTempView("s6_dml_nation_src")
      s.sql(
        s"""MERGE INTO snapshot.`$d` t
           |USING (SELECT n_nationkey AS k, n_name AS nm
           |       FROM s6_dml_nation_src WHERE n_nationkey < 8) s
           |ON t.n_nationkey = s.k
           |WHEN MATCHED AND t.n_regionkey = 1 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET n_name = concat(s.nm, '!')
           |WHEN NOT MATCHED THEN INSERT
           |  (n_nationkey, n_name, n_regionkey)
           |  VALUES (s.k + 100, s.nm, 9)
           |""".stripMargin)
      d
    })

  /** see s7_partitioned_layout — one PARTITIONED snapshot copy of
    * `customer` per (JVM, sf dir): written through the provider with
    * `partitionBy(c_nationkey)`, which the format honors as its
    * recorded range-clustering layout (every write clusters + records
    * stats on the column, reads prune partition predicates from the
    * manifest). */
  private val layoutDirs =
    scala.collection.concurrent.TrieMap[String, String]()
  private def layoutDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    layoutDirs.getOrElseUpdate(dir, {
      val d = java.nio.file.Files
        .createTempDirectory("graft_snap_layout").toString
      cleanupOnExit(d)
      Tables.customer(s, dir).write.format("snapshot").mode("overwrite")
        .partitionBy("c_nationkey").save(d)
      d
    })

  /** see s8_v2_catalog — one V2-catalog warehouse per (JVM, sf dir):
    * `supplier` lands through [[graft.sources.SnapshotCatalog]] via
    * the ATOMIC `CREATE OR REPLACE TABLE ... AS SELECT` staging path
    * and reads back through the catalog's V1Scan bridge, so the whole
    * v2 addressing surface (catalog resolution, staged commit, scan
    * pushdown) sits under the DuckDB hash gate. Catalog name is
    * per-dir: Spark caches catalog instances by name, so a second sf
    * dir in the same JVM needs its own. */
  private val v2Tables =
    scala.collection.concurrent.TrieMap[String, String]()
  private def v2Table(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    v2Tables.getOrElseUpdate(dir, {
      val wh = java.nio.file.Files
        .createTempDirectory("graft_snap_v2wh").toString
      cleanupOnExit(wh)
      val cat = s"graftv2_${Integer.toHexString(dir.hashCode).takeRight(6)}"
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.SnapshotCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
      Tables.supplier(s, dir).createOrReplaceTempView("graft_v2_src")
      s.sql(s"CREATE OR REPLACE TABLE $cat.main.supplier AS " +
        "SELECT * FROM graft_v2_src")
      s"$cat.main.supplier"
    })

  /** see s9_copy_into — one COPY-INTO'd snapshot table per (JVM, sf
    * dir): a slice of `part` staged to CSV, loaded with the SQL
    * `COPY INTO` statement TWICE — the ledger must no-op the replay,
    * so a dedup bug doubles the rows and breaks the DuckDB hash. */
  private val copyIntoDirs =
    scala.collection.concurrent.TrieMap[String, String]()
  private def copyIntoDir(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    copyIntoDirs.getOrElseUpdate(dir, {
      val stage = java.nio.file.Files
        .createTempDirectory("graft_copy_stage").toString
      val d = java.nio.file.Files
        .createTempDirectory("graft_copy_into").toString
      cleanupOnExit(stage); cleanupOnExit(d)
      val src = Tables.part(s, dir)
        .filter(col("p_partkey") <= 500)
        .select("p_partkey", "p_brand", "p_size")
      src.coalesce(2).write.mode("overwrite")
        .option("header", "true").csv(stage)
      // schema-seed with an empty frame so COPY must CAST the CSV text
      new graft.sources.SnapshotTable(s, d).appendWithStats(
        src.limit(0), Nil)
      val copy = s"COPY INTO snapshot.`$d` FROM '$stage' " +
        "FILEFORMAT = CSV PATTERN = '*.csv' " +
        "FORMAT_OPTIONS ('header' = 'true')"
      s.sql(copy).collect()
      s.sql(copy).collect() // replay: exactly-once or the hash breaks
      d
    })

  /** see s10_generated_column — one v2 table with a GENERATED ALWAYS
    * AS column per (JVM, sf dir): `orders` lands through SQL INSERT
    * with the generated column OMITTED (Spark null-fills it; the
    * write-path fill computes it), so the fill itself sits under the
    * DuckDB hash gate. */
  private val genColTables =
    scala.collection.concurrent.TrieMap[String, String]()
  private def genColTable(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    genColTables.getOrElseUpdate(dir, {
      val wh = java.nio.file.Files
        .createTempDirectory("graft_snap_genwh").toString
      cleanupOnExit(wh)
      val cat = s"graftgen_${Integer.toHexString(dir.hashCode).takeRight(6)}"
      s.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.SnapshotCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
      s.sql(s"""CREATE TABLE IF NOT EXISTS $cat.main.orders (
        |  o_orderkey BIGINT, o_orderdate DATE,
        |  o_year INT GENERATED ALWAYS AS (year(o_orderdate)))
        |PARTITIONED BY (o_year)""".stripMargin)
      Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
        .createOrReplaceTempView("graft_gen_src")
      if (s.sql(s"SELECT 1 FROM $cat.main.orders LIMIT 1").isEmpty)
        s.sql(s"INSERT INTO $cat.main.orders (o_orderkey, o_orderdate) " +
          "SELECT o_orderkey, o_orderdate FROM graft_gen_src")
      s"$cat.main.orders"
    })

  def defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "s10_generated_column",
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |CAST(count(*) AS BIGINT) AS n_orders,
        |min(o_orderkey) AS first_key
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin) { (s, dir) =>
      // GENERATED ALWAYS AS end to end: the INSERT omits o_year, the
      // write-path fill computes it (and range-clusters on it — the
      // generated column IS the layout); the oracle restates the
      // expression over the original parquet, so a wrong or missing
      // fill breaks the hash
      val tbl = Coverage.genColTable(s, dir)
      s.sql(s"""SELECT o_year, CAST(count(*) AS BIGINT) AS n_orders,
        |min(o_orderkey) AS first_key
        |FROM $tbl GROUP BY o_year ORDER BY o_year""".stripMargin)
    },

    QueryDef.sql(
      "s9_copy_into",
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM part WHERE p_partkey <= 500
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      // idempotent batch file loading end to end: stage → COPY INTO ×2
      // → read back; the oracle restates the slice over the original
      // parquet, so a double-load OR a type-drifted CSV read breaks
      // the hash
      val d = Coverage.copyIntoDir(s, dir)
      s.read.format("snapshot").load(d)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum("p_size").cast("long").as("sum_size"))
        .orderBy("p_brand")
    },

    QueryDef.sql(
      "s8_v2_catalog",
      """SELECT s_nationkey, count(*) AS n_supp, min(s_name) AS first_name
        |FROM supplier WHERE s_acctbal > 1000
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      // the oracle runs the same filter over the original parquet: the
      // v2 catalog round trip must be row-invisible
      val tbl = Coverage.v2Table(s, dir)
      s.sql(s"""SELECT s_nationkey, count(*) AS n_supp,
        |min(s_name) AS first_name
        |FROM $tbl WHERE s_acctbal > 1000
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)
    },

    QueryDef.sql(
      "s7_partitioned_layout",
      """SELECT c_mktsegment, count(*) AS n_cust, min(c_name) AS first_name
        |FROM customer WHERE c_nationkey BETWEEN 5 AND 9
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      // partitionBy-honoring write path end to end: customer lands in
      // a snapshot table PARTITIONED BY (c_nationkey) — recorded as
      // the range-clustering layout — and the partition predicate
      // prunes from manifest stats before the parquet scan. Oracle
      // runs the same filter over the original parquet: the layout
      // must be row-invisible.
      val tmp = Coverage.layoutDir(s, dir)
      s.read.format("snapshot").load(tmp)
        .where(col("c_nationkey").between(5, 9))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), min("c_name").as("first_name"))
        .orderBy("c_mktsegment")
    },

    QueryDef.sql(
      "s1_csv_roundtrip",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey") { (s, dir) =>
      // stage to headerless CSV (S6) then scan with declared schema (S1);
      // ONE dir per JVM (mode=overwrite makes re-invocations safe,
      // distinct JVMs still get distinct dirs) — a dir per INVOCATION
      // leaked a nation-sized CSV copy into /tmp on every Verify/
      // bench/audit execution, unbounded on a long-lived host
      val tmp = Coverage.csvStageDir
      Tables.nation(s, dir)
        .write.mode("overwrite").option("header", "false").csv(tmp)
      s.read
        .schema(StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))))
        .option("header", "false")
        .csv(tmp)
        .orderBy("n_nationkey")
    },

    QueryDef.sql(
      "f_misc_funcs",
      """SELECT n_nationkey,
        |  array_to_string(flatten([[n_name], ['x', n_name]]), ',') AS flat,
        |  (n_regionkey IS NULL) AS region_isnull,
        |  coalesce(NULL, n_name, 'fallback') AS first_nonnull
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      Tables.nation(s, dir).select(
        col("n_nationkey"),
        array_join(flatten(array(array(col("n_name")), array(lit("x"), col("n_name")))), ",").as("flat"),
        col("n_regionkey").isNull.as("region_isnull"),
        coalesce(lit(null).cast("string"), col("n_name"), lit("fallback")).as("first_nonnull"))
        .orderBy("n_nationkey")
    },

    QueryDef.sql(
      "s5_snapshot_sql",
      """SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        |FROM nation WHERE n_nationkey >= 5
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      // S5 bulk-load sink through the REGISTERED batch format: nation
      // bulk-loaded into a stat-tracked snapshot table via
      // write.format("snapshot"), then read back through
      // read.format("snapshot") — the pushed n_nationkey filter prunes
      // from manifest stats before the parquet scan (the reference
      // serves the same shape from its DB views). Oracle runs on the
      // original parquet: the round trip must be row-identical.
      val tmp = Coverage.snapNationDir(s, dir)
      s.read.format("snapshot").load(tmp)
        .where(col("n_nationkey") >= 5)
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_nations"), min("n_name").as("first_name"))
        .orderBy("n_regionkey")
    },

    QueryDef.sql(
      "s6_sql_dml",
      """WITH del AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_regionkey = 2 THEN upper(n_name)
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey % 5 <> 0),
        |src AS (
        |  SELECT n_nationkey AS k, n_name AS nm
        |  FROM nation WHERE n_nationkey < 8),
        |merged AS (
        |  SELECT d.n_nationkey,
        |    CASE WHEN s.k IS NOT NULL AND d.n_regionkey <> 1
        |         THEN s.nm || '!' ELSE d.n_name END AS n_name,
        |    d.n_regionkey
        |  FROM del d LEFT JOIN src s ON d.n_nationkey = s.k
        |  WHERE NOT (s.k IS NOT NULL AND d.n_regionkey = 1)),
        |ins AS (
        |  SELECT s.k + 100 AS n_nationkey, s.nm AS n_name,
        |    9 AS n_regionkey
        |  FROM src s LEFT JOIN del d ON d.n_nationkey = s.k
        |  WHERE d.n_nationkey IS NULL)
        |SELECT * FROM (SELECT * FROM merged UNION ALL SELECT * FROM ins)
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      // SQL DML end-to-end through the REGISTERED statements: a
      // snapshot copy of nation goes through DELETE FROM (every 5th
      // key), UPDATE (region-2 comments upper-cased), and a
      // three-clause MERGE INTO (conditional delete, update,
      // conditional insert of shifted keys) — all path-addressed SQL
      // resolved by the GraftExtensions rules; the oracle reproduces
      // the same final state relationally over the original parquet.
      // The DML runs ONCE per (JVM, sf); the query reads the result.
      val tmp = Coverage.sqlDmlDir(s, dir)
      s.read.format("snapshot").load(tmp)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    })
}
