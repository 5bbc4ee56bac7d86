package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live Structured Streaming over the events table: watermarked
  * tumbling-window aggregation through a memory sink, checked against
  * the identical batch plan (the w1_tumbling_window semantics).
  */
class StreamingQuerySpec extends SparkSuite {

  private def normalizeTs(df: org.apache.spark.sql.DataFrame) =
    Tables.normalizeTs(df)

  test("watermarked windowed agg over a stream matches the batch result") {
    val dir = sf("sf0.001")
    // nanos timestamps: same legacy conf + conversion as Tables.events
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema

    // streaming parquet source wants a directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))

    val stream = normalizeTs(spark.readStream
      .schema(schema)
      .parquet(streamDir.toString))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("w1_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("w1_stream")
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")
      .collect()

    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")
      .collect()

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("watermarked SLIDING window over a stream matches the batch w6 semantics") {
    val dir = sf("sf0.001")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

    val stream = agg(normalizeTs(spark.readStream
      .schema(schema)
      .parquet(streamDir.toString))
      .withWatermark("ts", "1 hour"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("w6_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")
      .collect()

    val streamed = shape(spark.table("w6_stream"))
    val batch = shape(agg(Tables.events(spark, dir)))
    assert(streamed.nonEmpty)
    // every event lands in exactly size/slide = 2 windows
    val nEvents = Tables.events(spark, dir).count()
    assert(streamed.map(_.getAs[Long]("n")).sum == 2 * nEvents)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("cosine_similarity is SQL-callable via GraftExtensions registration") {
    // the extension class installs without error on a fresh extensions set
    new graft.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // extensions apply at session build; register directly on the live session
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(args(0), args(1)))
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[graft.functions.RollingHash].getName, "rolling_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RollingHash(args.head))
    // h("ab") = (97*131 + 98) mod 1e9+7
    val h = spark.sql("SELECT rolling_hash('ab') AS h").collect()(0).getLong(0)
    assert(h == 97L * 131 + 98)
  }

  test("canonical_url / registrable_domain are SQL-callable composites") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    import org.apache.spark.sql.graftbridge.ColumnBridge
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("canonical_url"),
      new ExpressionInfo(graft.text.Domains.getClass.getName, "canonical_url"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ColumnBridge.toExpression(
          graft.text.Domains.canonicalizeUrl(ColumnBridge.toColumn(args.head))))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("registrable_domain"),
      new ExpressionInfo(graft.text.Domains.getClass.getName, "registrable_domain"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ColumnBridge.toExpression(
          graft.text.Domains.domainOf(ColumnBridge.toColumn(args.head))))
    val r = spark.sql(
      "SELECT canonical_url('HTTPS://WWW.Example.COM.:443//a//b/?utm_source=x&b=2&a=1#frag') AS c, " +
        "registrable_domain('http://user@sub.example.co.uk:8080/a') AS d").head()
    assert(r.getString(0) == "https://example.com/a/b?a=1&b=2")
    assert(r.getString(1) == "example.co.uk")
  }
}
