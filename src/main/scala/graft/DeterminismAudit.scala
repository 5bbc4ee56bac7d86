package graft

import org.apache.spark.sql.SparkSession

/** Builder-local determinism audit (r6 action item): every registered
  * query runs TWICE — under different shuffle-partition counts, which
  * perturbs partitioning, merge order, and aggregation grouping — and
  * the sorted stringified results must be byte-identical. Any query
  * whose output depends on a tie (argmax without a total order,
  * LIMIT 1 over a non-unique sort, first() over an unordered group)
  * diverges here long before it diverges as a driver hash mismatch
  * (v6/v7's r6 failure class).
  *
  * Usage: `runMain graft.DeterminismAudit <sfDir> [prefixes]` —
  * exit 1 when any query is partition-sensitive.
  */
object DeterminismAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Seq[String]] =
      args.drop(1).headOption.map(_.split(',').toSeq.filter(_.nonEmpty))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // hold the whole suite's generated stages (see Bench.session)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.exists(name.startsWith))) {
        def run(parts: Int): Either[String, Seq[String]] =
          try {
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            Right(fn(spark, sfDir).collect().toSeq
              .map(_.toString).sorted)
          } catch { case e: Throwable => Left(e.getMessage) }
        (run(3), run(7)) match {
          case (Right(a), Right(b)) if a == b =>
            println(s"OK   $name (${a.length} rows)")
          case (Right(a), Right(b)) =>
            bad += 1
            val diff = a.zip(b).filter { case (x, y) => x != y } ++
              a.drop(b.length).map(x => (x, "<missing>")) ++
              b.drop(a.length).map(y => ("<missing>", y))
            println(s"NONDETERMINISTIC $name: ${diff.length} differing " +
              s"rows of ${a.length}/${b.length}; first: ${diff.headOption}")
          case (l, r) =>
            bad += 1
            println(s"ERROR $name: ${l.left.toOption.orElse(r.left.toOption).getOrElse("?")}")
        }
      }
    }
    spark.stop()
    if (bad > 0) { println(s"$bad queries partition-sensitive"); sys.exit(1) }
    else println("all queries deterministic across partitionings")
  }
}
