package graft.llm

import graft.SparkSuite
import graft.similarity.HybridRetrieval
import org.apache.spark.sql.functions._

class HybridRetrievalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val terms = Seq(
    // query doc 1 shares 3 terms with doc 10, 1 with doc 11, 0 with 12
    (1L, "alpha"), (1L, "beta"), (1L, "gamma"),
    (10L, "alpha"), (10L, "beta"), (10L, "gamma"), (10L, "delta"),
    (11L, "alpha"), (11L, "zeta"),
    (12L, "omega"))
    .toDF("doc_id", "term")

  test("lexicalTopK ranks by shared distinct terms, excludes self") {
    val out = HybridRetrieval.lexicalTopK(
      terms, terms.filter($"doc_id" === 1L), k = 5).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) == ((1L, 3L)))  // rank 1, overlap 3
    assert(out(11L) == ((2L, 1L)))
    assert(!out.contains(12L) && !out.contains(1L))
  }

  test("rrfFuse sums ppm contributions and handles one-armed candidates") {
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val vec = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val out = HybridRetrieval.rrfFuse(lex, vec, k = 10).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(5))).toMap
    // 11 is in both arms: 1e6/62 + 1e6/61 = 16129 + 16393
    assert(out(11L)._1 == 1000000L / 62 + 1000000L / 61)
    assert(out(10L)._1 == 1000000L / 61) // lexical only
    assert(out(12L)._1 == 1000000L / 62) // vector only
    // fused order: 11 (both arms) first
    assert(out(11L)._2 == 1L)
    // a missing arm is NULL rank, not a fabricated one
    val row12 = HybridRetrieval.rrfFuse(lex, vec, k = 10)
      .filter($"neighbor_id" === 12L).collect().head
    assert(row12.isNullAt(3)) // rank_a (lexical) null
  }
}
