package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-liveness-checked persist-and-memoize for frames shared
  * across queries (LSH signatures, graph edge lists, k-means
  * assignments, MMR candidates): the engine-level reuse a production
  * deployment gets from materialized intermediates. One
  * implementation — the liveness rule (serve a cached frame only
  * while its owning session is the active, un-stopped one; anything
  * else rebuilds) must not drift between copies, and keying on
  * session identity hashes is unsound (reusable after GC). */
final class QueryMemo {
  private val memo = scala.collection.concurrent.TrieMap[String, DataFrame]()

  def apply(key: String)(build: => DataFrame): DataFrame =
    memo.get(key) match {
      case Some(df) if !df.sparkSession.sparkContext.isStopped &&
          SparkSession.getActiveSession.exists(_ eq df.sparkSession) => df
      case _ =>
        val df = build.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        memo.put(key, df)
        df
    }
}
