package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the sf dir given by
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (driver contract). A
  * warmup pass absorbs JVM/codegen/scan-init cost so per-query numbers
  * reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: one scan+agg+join through codegen, not timed. Must never
    // kill the run — the one-line JSON contract has to print even if a
    // table is missing (the per-query loop degrades per query).
    try {
      Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
      SparkEntry.queries("j3_star_join")(spark, sfDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed (continuing): ${e.getMessage}")
    }

    // a failed query is reported as -1.0 (and listed in "failed"), never
    // as its short elapsed time — a broken query must not read as fast
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
