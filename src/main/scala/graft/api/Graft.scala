package graft.api

/** graft — a Spark-native analytics engine for social-graph analysis,
  * link prediction, and large-corpus training-data preparation.
  *
  * One import gives the whole user-facing surface; every operator takes
  * and returns plain DataFrames/Datasets, so they compose with any
  * existing Spark pipeline:
  *
  * {{{
  * import graft.api.Graft
  *
  * val dups   = Graft.dedup.lshNearDupPairs(corpus, "doc_id", "text", 0.8)
  * val topk   = Graft.similarity.bruteForceTopK(embeddings, "vec_id", "embedding", 0L, 10)
  * val terms  = Graft.text.tfidfTopTerms(corpus, "doc_id", "text", 3)
  * val sample = Graft.sampling.stratifiedSample(df, col("priority"), col("id"),
  *                Map("1-URGENT" -> 100), defaultRate = 10)
  * val ranks  = Graft.graph.pageRank(edges, iters = 5)         // (src, dst)
  * val dists  = Graft.graph.shortestPaths(wEdges, source = 1L, iters = 6)
  * val sess   = Graft.streams.sessionize(eventStream)           // batch or stream
  * }}}
  *
  * Families:
  *  - [[Dedup]] `Graft.dedup` — exact/keyed dedup, MinHash+LSH, SimHash,
  *    n-gram Jaccard, Bloom-bitset ingest gate (oracle-deterministic
  *    hashing).
  *  - [[Similarity]] `Graft.similarity` — cosine top-k, hyperplane-LSH
  *    buckets, IVF cells, near-dup pairs (native codegen'd cosine).
  *  - [[Text]] `Graft.text` — token stats, quality gates, language ID,
  *    fingerprints, TF-IDF keywords.
  *  - [[Sampling]] `Graft.sampling` — deterministic stratified sampling,
  *    canonical pair splits, negative sampling.
  *  - [[Search]] `Graft.search` — accent-fold key normalization, WRatio
  *    fuzzy scoring, index build, fuzzy top-k, blocked sim-join.
  *  - [[Analytics]] `Graft.analytics` — skew-safe salted aggregation,
  *    mean imputation, min-max normalization, degree CCDF.
  *  - [[Events]] `Graft.events` — batch tumbling windows and gap
  *    sessionization in exact integer micros.
  *  - [[graft.graph.DFGraphAlgs]] `Graft.graph` — PageRank (plain +
  *    multi-relation), BFS/SSSP (single/multi-source, with paths),
  *    connected components, degrees; fixed-round BSP DataFrame programs.
  *  - [[graft.streaming.StreamOps]] `Graft.streams` — event-time windows,
  *    session windows, exactly-once dedup, stream-static enrichment.
  *  - [[graft.multimodal.Multimodal]] `Graft.media` — binary media
  *    columns, typed metadata, per-partition batched decode.
  *  - [[graft.functions]] — `cosine_sim`, `minhash_sketch`,
  *    `bitset_agg`, `accent_fold` as native Catalyst expressions,
  *    registered through `graft.ext.GraftExtensions`
  *    (spark.sql.extensions).
  */
object Graft {
  val dedup: Dedup.type = Dedup
  val similarity: Similarity.type = Similarity
  val text: Text.type = Text
  val sampling: Sampling.type = Sampling
  val search: Search.type = Search
  val analytics: Analytics.type = Analytics
  val events: Events.type = Events
  val graph: graft.graph.DFGraphAlgs.type = graft.graph.DFGraphAlgs
  val streams: graft.streaming.StreamOps.type = graft.streaming.StreamOps
  val media: graft.multimodal.Multimodal.type = graft.multimodal.Multimodal
}
