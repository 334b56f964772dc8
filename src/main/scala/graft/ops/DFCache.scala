package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Lazy localCheckpoint rather than persist(): persist keeps the full
    * logical lineage inside the InMemoryRelation, and several shared
    * intermediates here carry big unrolled plans (the walk corpora
    * embed per-step joins into the whole neighbor index) — every
    * consumer then re-runs Catalyst over that tree per action, and a
    * self-join doubles it (measured at the sf1 checkpoint: a cached
    * 2 000-row corpus count spent 80 ms executing and ~1.9 s PLANNING;
    * the skip-gram self-join ~5 s). localCheckpoint truncates the
    * consumer-visible plan to the materialized RDD, so downstream
    * planning cost is bounded by the CONSUMER query's own shape — the
    * same truncation discipline as DFGraphAlgs.mat between BSP rounds.
    * Lazy (eager=false) keeps build cost on first use, like persist.
    * On a cluster the executor-local blocks trade recompute-on-loss for
    * plan size, exactly as Spark documents for localCheckpoint; a
    * reliable checkpoint dir is the production knob (DFGraphAlgs
    * ReliableCheckpointConf precedent). */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = synchronized {
      var c = caches.get(s)
      if (c == null) { c = TrieMap.empty[String, DataFrame]; caches.put(s, c) }
      c
    }
    m.getOrElseUpdate(key, build.localCheckpoint(false))
  }
}
