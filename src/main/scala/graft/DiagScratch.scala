package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis.{tokens, normalized}

/** Scratch diagnostic main for the optimization round — NOT part of the
  * engine surface; deleted before commit. */
object DiagScratch {
  def times(label: String, n: Int)(f: => Unit): Unit = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[diag] $label: min ${ts.min}%.3f  all ${ts.map(t => f"$t%.2f").mkString(",")}")
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = Bench.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val N = 4
    val docs = Tables.documents(spark, dir)
    val kernelNorm = graft.functions.CollapseNonAlnum(lower(col("text")))

    // equality on the full corpus
    val mism = docs.select(normalized(col("text")).as("a"), kernelNorm.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    println("[diag] normalize mismatches: " + mism)

    times("norm A regex (current)", N) {
      noop(docs.select(normalized(col("text")).as("n")))
    }
    times("norm B kernel", N) {
      noop(docs.select(kernelNorm.as("n")))
    }
    times("tokens A current", N) {
      noop(docs.select(tokens(normalized(col("text"))).as("t")))
    }
    times("tokens B kernel+split-regex", N) {
      noop(docs.select(
        when(length(kernelNorm) === 0, array())
          .otherwise(split(kernelNorm, "\\s+")).as("t")))
    }
    times("tokens C kernel+split-space", N) {
      noop(docs.select(
        when(length(kernelNorm) === 0, array())
          .otherwise(split(kernelNorm, " ")).as("t")))
    }
    // token equality
    val tmism = docs.select(tokens(normalized(col("text"))).as("a"),
        when(length(kernelNorm) === 0, array())
          .otherwise(split(kernelNorm, " ")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    println("[diag] token mismatches: " + tmism)
    spark.stop()
  }
}
