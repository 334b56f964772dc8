package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.concurrent.TrieMap

/** Session-scoped cache for derived frames shared ACROSS queries — the
  * Spark form of the reference's "precompute once, reuse every query"
  * pattern (edge weights cached at service start, bfs.py:12-13; pickled
  * graph re-loaded per session, SURVEY.md §4).
  *
  * Several driver-contract queries derive the same intermediates (the
  * symmetric co-purchase edge list, BFS distances from the fixed source,
  * minhash signatures, exploded embedding components). Each query must
  * remain independently runnable, but when one session runs many — the
  * driver's Verify/Bench loops, a notebook session — rebuilding the
  * shared intermediate per query is pure waste. Entries are persisted
  * (deserialized, spillable) and keyed by (session, logical-key, input
  * dir); the WeakHashMap drops a session's entries when the session is
  * collected, and a fresh session never sees another session's frames.
  */
object DFCache {
  private val caches =
    new java.util.WeakHashMap[SparkSession, TrieMap[String, DataFrame]]()

  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = synchronized {
      var c = caches.get(s)
      if (c == null) { c = TrieMap.empty[String, DataFrame]; caches.put(s, c) }
      c
    }
    m.getOrElseUpdate(key, build.persist(StorageLevel.MEMORY_AND_DISK))
  }
}
