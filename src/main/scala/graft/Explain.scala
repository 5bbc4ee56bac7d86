package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of registered queries —
  * used to audit pushdown (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin for dims), and WholeStageCodegen coverage.
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    // the bench session shape (local[$SPARK_GRAFT_CPUS], AQE, the
    // GraftExtensions SQL surface) so captured plans match what the
    // benchmark actually runs — local[4] plans hid partition-count
    // effects and failed on the snapshot-SQL queries
    val spark = Bench.session()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable =>
        println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
