package graft.ops

import org.apache.spark.sql.SparkSession

/** Explicit warm pass over the session-cached intermediates shared
  * across queries (DFCache entries). Bench runs this BEFORE the timed
  * per-query loop and reports it as its own `_shared_warmup` line:
  * otherwise the build cost of a shared frame (the exploded embedding
  * components, the BFS state, the co-purchase edge list) is charged to
  * whichever query happens to run first alphabetically, and per-query
  * deltas between rounds become unattributable (round-2 verdict: the
  * apparent `sim_lsh_topk` regression was exactly this artifact).
  */
object Warm {

  /** Names paired with builders so the warm pass can log per-entry. */
  private def entries(s: SparkSession, d: String) = Seq(
    "graph.relpairs" -> (() => GraphPack.relPairs(s, d)),
    "graph.edges"    -> (() => GraphPack.edges(s, d)),
    "graph.wedges"   -> (() => GraphPack.weightedEdges(s, d)),
    "graph.bfs"      -> (() => GraphPack.bfsDists(s, d)),
    "graph.tripairs" -> (() => GraphPack.triPairs(s, d)),
    "graph.ssspPred" -> (() => GraphPack.ssspState(s, d)),
    "graph.nbridx"   -> (() => GraphPack.nbrIndex(s, d)),
    "graph.rwcorpus" -> (() => GraphPack.rwCorpus(s, d)),
    "graph.n2vcorpus" -> (() => GraphPack.node2vecCorpus(s, d)),
    "graph.lmdists"  -> (() => GraphPack.landmarkDists(s, d)),
    "ml.edges"       -> (() => MLPack.edges(s, d)),
    "ml.edgesA"      -> (() => MLPack.edgesHalfA(s, d)),
    "ml.edgesB"      -> (() => MLPack.edgesHalfB(s, d)),
    "ml.pdegA"       -> (() => MLPack.pdegA(s, d)),
    "ml.aaScored"    -> (() => MLPack.aaScored(s, d)),
    "sim.comps"      -> (() => SimilarityPack.comps(s, d)),
    "sim.buckets"    -> (() => SimilarityPack.buckets(s, d)),
    "sim.ivfcent"    -> (() => SimilarityPack.kmeansCentroids(s, d)),
    "sim.ncomps"     -> (() => SimilarityPack.ncomps(s, d)),
    "sim.pqcent"     -> (() => SimilarityPack.pqCodebooks(s, d)),
    "sim.pqcodes"    -> (() => SimilarityPack.pqCodes(s, d)),
    "sim.ivfassign"  -> (() => SimilarityPack.ivfAssign(s, d)),
    "sim.sqstats"    -> (() => SimilarityPack.sqStats(s, d)),
    "sim.sqcodes"    -> (() => SimilarityPack.sqCodes(s, d)),
    "dedup.shingles"   -> (() => DedupPack.shingleRows(s, d)),
    "dedup.signatures" -> (() => DedupPack.signatures(s, d)),
    "dedup.simhash"    -> (() => DedupPack.simhashFingerprints(s, d)))

  /** Materialize every shared intermediate (count() forces the persist).
    * Returns (entry, seconds) per entry. */
  def sharedIntermediates(s: SparkSession, d: String): Seq[(String, Double)] =
    entries(s, d).map { case (name, build) =>
      val t0 = System.nanoTime()
      build().count()
      name -> (System.nanoTime() - t0) / 1e9
    } :+ {
      // Scalar memo, not a frame: the co-purchase graph's max out-degree
      // (the BSP hub-probe bound every graph query passes in). Warmed
      // here so the one aggregate that fills it is charged to shared
      // warmup, not to whichever graph query runs first.
      val t0 = System.nanoTime()
      GraphPack.maxCoDeg(s, d)
      "graph.maxdeg" -> (System.nanoTime() - t0) / 1e9
    }
}
