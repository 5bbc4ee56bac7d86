package graft.tools
import graft.Tables
import graft.dedup.Dedup
import graft.queries.LlmOps
import org.apache.spark.sql.SparkSession
object DupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val sigs = Dedup.minHashSignatures(
      Dedup.shingles(Tables.documents(spark, dir), LlmOps.ShingleK, distinct = false),
      LlmOps.NumHashes).persist()
    sigs.count()
    val t1 = System.nanoTime()
    val pairs = Dedup.minHashCandidatePairs(sigs, LlmOps.NumHashes, LlmOps.RowsPerBand).persist()
    println(s"pairs: ${pairs.count()}")
    val t2 = System.nanoTime()
    val g = Dedup.dupGroups(pairs)
    println(s"groups: ${g.count()}")
    val t3 = System.nanoTime()
    println(f"sigs ${(t1-t0)/1e9}%.2fs pairs ${(t2-t1)/1e9}%.2fs dupGroups ${(t3-t2)/1e9}%.2fs")
    spark.stop()
  }
}
