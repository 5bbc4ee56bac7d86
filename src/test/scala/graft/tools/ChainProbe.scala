package graft.tools
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val chain = (1L until n.toLong).map(i => (i, i + 1)).toDF("a_doc_id", "b_doc_id")
    val g = Dedup.dupGroups(chain, maxIter = 80)
    println(s"distinct groups: ${g.select("group_rep").distinct().count()} (want 1)")
    spark.stop()
  }
}
