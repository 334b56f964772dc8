package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.DFGraphAlgs

/** Dev-only: time each DFGraphAlgs entry on the bench graph at sf0.1. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe2] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cs = time("pairs") {
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + (1L << 40)).as("p"))
        .distinct().localCheckpoint(true)
    }
    val edges = time("edges") {
      cs.select(col("c").as("src"), col("p").as("dst"))
        .union(cs.select(col("p").as("src"), col("c").as("dst")))
        .localCheckpoint(true)
    }
    time("warm run pagerank") {
      DFGraphAlgs.pageRank(edges, 5).count()
    }
    time("pagerank x5") {
      DFGraphAlgs.pageRank(edges, 5).count()
    }
    // A/B: deep-plan pagerank with broadcast-hinted rank/msgs subtrees
    time("pagerank x5 bcast-deep") {
      val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
      val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val contrib = e.join(outdeg, "src")
        .select(col("src"), col("dst"), col("deg")).localCheckpoint(true)
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(true)
      var rank = nodes.select(col("id"), lit(1.0).as("rank"))
      for (_ <- 1 to 5) {
        val msgs = contrib.join(broadcast(rank), contrib("src") === rank("id"))
          .select(col("dst").as("id"),
            (col("rank") / col("deg")).as("m"))
          .groupBy(col("id"))
          .agg(sum(col("m").cast("decimal(28,15)")).cast("double").as("msum"))
        rank = nodes.join(broadcast(msgs), Seq("id"), "left")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
      }
      rank.count()
    }
    time("bfs x6") {
      DFGraphAlgs.shortestPaths(edges.withColumn("w", lit(1.0)), 1L, 6).count()
    }
    time("ssspPred x6") {
      DFGraphAlgs.shortestPathsWithPred(edges.withColumn("w", lit(1.0)), 1L, 6).count()
    }
    time("multiSource x6") {
      DFGraphAlgs.multiSourceShortestPaths(edges.withColumn("w", lit(1.0)), Seq(1L, 2L, 3L), 6).count()
    }
    spark.stop()
  }
}
