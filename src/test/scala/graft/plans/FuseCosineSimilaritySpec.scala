package graft.plans

import graft.SparkSuite
import graft.dedup.Vectors
import org.apache.spark.sql.functions._

class FuseCosineSimilaritySpec extends SparkSuite {
  import spark.implicits._

  // parquet-backed: a purely local relation would be constant-folded by
  // the main optimizer batch before user-provided rules ever run
  private lazy val vecs = {
    val p = java.nio.file.Files.createTempDirectory("graft-fuse").toString + "/v"
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f)),
      (2L, Seq(0.5f, -1.5f, 2.5f), Seq(1.0f, 1.0f, 1.0f)))
      .toDF("id", "a", "b").write.parquet(p)
    spark.read.parquet(p)
  }

  test("HOF cosine pattern is rewritten to the fused native expression") {
    spark.experimental.extraOptimizations = Seq(FuseCosineSimilarity)
    try {
      val hof = vecs.select(col("id"), Vectors.cosineHof(col("a"), col("b")).as("c"))
      val fusedInPlan = hof.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.CosineSimilarity]))
      assert(fusedInPlan, "optimizer did not fuse the HOF cosine pattern")
      // and the rewrite is value-preserving (bit-exact: both forms fold
      // left-to-right in doubles)
      val native = vecs.select(col("id"), Vectors.cosine(col("a"), col("b")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      hof.collect().foreach(r => assert(r.getDouble(1) == native(r.getLong(0))))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("raw float-lambda HOF (analyzer casts AROUND x*x) also fuses") {
    spark.experimental.extraOptimizations = Seq(FuseCosineSimilarity)
    try {
      // the user form without explicit per-element casts: over
      // array<float> the analyzer wraps the PRODUCT in the cast
      // (Add(s, Cast(Multiply(x,x)))) — the norm matcher must strip it
      // or float embeddings silently never fuse
      val hof = vecs.selectExpr("id",
        """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v) /
          |(sqrt(aggregate(a, 0D, (s, x) -> s + x * x)) *
          | sqrt(aggregate(b, 0D, (s, x) -> s + x * x))) AS c""".stripMargin)
      assert(hof.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.CosineSimilarity])),
        "float-element norm with analyzer-inserted cast did not fuse")
      hof.collect() // and it executes
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("array<string> cosine is NOT rewritten (kernel would throw at runtime)") {
    spark.experimental.extraOptimizations = Seq(FuseCosineSimilarity)
    try {
      val p = java.nio.file.Files.createTempDirectory("graft-fuse-s").toString + "/v"
      Seq((1L, Seq("1", "2"), Seq("3", "4"))).toDF("id", "a", "b").write.parquet(p)
      val sv = spark.read.parquet(p)
      val hof = sv.select(col("id"), Vectors.cosineHof(col("a"), col("b")).as("c"))
      assert(!hof.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.CosineSimilarity])),
        "rewrite fired for array<string> — the kernel has no string getter")
      // the implicit-cast HOF form still computes
      val c = hof.collect().head.getDouble(1)
      assert(c > 0.9 && c <= 1.0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("unrelated divisions are left untouched") {
    spark.experimental.extraOptimizations = Seq(FuseCosineSimilarity)
    try {
      val df = vecs.select((col("id") / lit(2.0)).as("d"))
      assert(df.count() == 2)
      assert(!df.queryExecution.optimizedPlan.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.CosineSimilarity])))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
