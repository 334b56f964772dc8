package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DataFrame-native synchronous graph algorithms (fixed-round BSP).
  *
  * Each round is one co-partitioned shuffle join + aggregation on the
  * vertex id — the pattern that scales to 1000 executors: the edge list is
  * deduped and persisted once, every round reuses its partitioning, and
  * no data ever reaches the driver. Rank sums go through exact decimals so
  * results are shuffle-order-independent (see graft.ops.OpsUtil).
  *
  * Semantics match graft.graph.GraphAlgs (GraphX/Pregel) round for round;
  * GraphSpec asserts agreement on micro-graphs.
  */
object DFGraphAlgs {

  private def rsum(c: Column): Column =
    sum(c.cast("decimal(28,15)")).cast("double")

  /** Fixed-iteration PageRank over a directed edge list (src, dst):
    * r0 = 1; r_{k+1} = 0.15 + 0.85 * Σ_in r_k(src)/outdeg(src).
    * Returns (id, rank). Ref data_processor.py:56-78 (damping 0.85). */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val contrib = e.join(outdeg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var rank = nodes.select(col("id"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      val msgs = contrib.join(rank, contrib("src") === rank("id"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("m"))
        .groupBy(col("id")).agg(rsum(col("m")).as("msum"))
      rank = nodes.join(msgs, Seq("id"), "left")
        .select(col("id"),
          (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
    }
    rank
  }

  /** Fixed-round min-plus relaxation over weighted edges (src, dst, w)
    * from one source. Returns (id, dist) with unreached = null.
    * With w ≡ 1 this is BFS hop count. Ref bfs.py:91-147. */
  def shortestPaths(edges: DataFrame, source: Long, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      coalesce(col("w"), lit(1.0)).as("w")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var dist = nodes.select(col("id"),
      when(col("id") === source, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
    for (_ <- 1 to iters) {
      val relaxed = e.join(dist, e("src") === dist("id"))
        .filter(col("dist").isNotNull)
        .groupBy(col("dst").as("id")).agg(min(col("dist") + col("w")).as("reach"))
      dist = dist.join(relaxed, Seq("id"), "left")
        .select(col("id"), least(col("dist"), col("reach")).as("dist"))
    }
    dist
  }

  /** Undirected total degree per vertex. Ref data_processor.py:83-93. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
}
