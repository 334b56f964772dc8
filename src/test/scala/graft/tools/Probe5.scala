package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: pageRankByRel variants at sf0.1 (round-3 perf item —
  * the composite-key PageRank doubled vs round 1; candidate fixes are
  * co-partitioned persists vs per-round checkpoints).
  */
object Probe5 {
  private def rsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(28,15)")).cast("double")

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
      System.err.println(f"[probe5] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def relEdges(): DataFrame = {
      val cs = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("l_returnflag").as("rel"), col("o_custkey").as("c"),
          (col("l_suppkey") + (1L << 40)).as("p"))
        .distinct()
      cs.select(col("rel"), col("c").as("src"), col("p").as("dst"))
        .union(cs.select(col("rel"), col("p").as("src"), col("c").as("dst")))
    }

    val iters = 5

    // A: current implementation (mat inputs, lazy 5-round plan)
    time("A current") {
      graft.graph.DFGraphAlgs.pageRankByRel(relEdges(), iters).count()
    }

    // B: co-partitioned persists — contrib hash-partitioned on (rel, src),
    // nodes on (rel, id); lazy rounds, single exchange per round expected.
    time("B copart-persist") {
      val e = relEdges()
      val outdeg = e.groupBy(col("rel"), col("src")).agg(count(lit(1)).as("deg"))
      val contrib = e.join(outdeg, Seq("rel", "src"))
        .select(col("rel"), col("src"), col("dst"), col("deg"))
        .repartition(col("rel"), col("src")).persist()
      val nodes = e.select(col("rel"), col("src").as("id"))
        .union(e.select(col("rel"), col("dst").as("id"))).distinct()
        .repartition(col("rel"), col("id")).persist()
      var rank = nodes.select(col("rel"), col("id"), lit(1.0).as("rank"))
      for (_ <- 1 to iters) {
        val msgs = contrib.join(rank,
            contrib("rel") === rank("rel") && contrib("src") === rank("id"))
          .select(contrib("rel").as("rel"), col("dst").as("id"),
            (col("rank") / col("deg")).as("m"))
          .groupBy(col("rel"), col("id")).agg(rsum(col("m")).as("msum"))
        rank = nodes.join(msgs, Seq("rel", "id"), "left")
          .select(col("rel"), col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
      }
      rank.count()
      contrib.unpersist(false); nodes.unpersist(false)
    }

    // C: per-round localCheckpoint of rank on top of the current inputs.
    time("C per-round mat") {
      val e = relEdges().localCheckpoint(true)
      val outdeg = e.groupBy(col("rel"), col("src")).agg(count(lit(1)).as("deg"))
      val contrib = e.join(outdeg, Seq("rel", "src"))
        .select(col("rel"), col("src"), col("dst"), col("deg")).localCheckpoint(true)
      val nodes = e.select(col("rel"), col("src").as("id"))
        .union(e.select(col("rel"), col("dst").as("id"))).distinct().localCheckpoint(true)
      var rank = nodes.select(col("rel"), col("id"), lit(1.0).as("rank"))
      for (_ <- 1 to iters) {
        val msgs = contrib.join(rank,
            contrib("rel") === rank("rel") && contrib("src") === rank("id"))
          .select(contrib("rel").as("rel"), col("dst").as("id"),
            (col("rank") / col("deg")).as("m"))
          .groupBy(col("rel"), col("id")).agg(rsum(col("m")).as("msum"))
        rank = nodes.join(msgs, Seq("rel", "id"), "left")
          .select(col("rel"), col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
          .localCheckpoint(true)
      }
      rank.count()
    }

    // B2: B again (cache/JIT-stabilized reading)
    time("B2 copart-persist") {
      val e = relEdges()
      val outdeg = e.groupBy(col("rel"), col("src")).agg(count(lit(1)).as("deg"))
      val contrib = e.join(outdeg, Seq("rel", "src"))
        .select(col("rel"), col("src"), col("dst"), col("deg"))
        .repartition(col("rel"), col("src")).persist()
      val nodes = e.select(col("rel"), col("src").as("id"))
        .union(e.select(col("rel"), col("dst").as("id"))).distinct()
        .repartition(col("rel"), col("id")).persist()
      var rank = nodes.select(col("rel"), col("id"), lit(1.0).as("rank"))
      for (_ <- 1 to iters) {
        val msgs = contrib.join(rank,
            contrib("rel") === rank("rel") && contrib("src") === rank("id"))
          .select(contrib("rel").as("rel"), col("dst").as("id"),
            (col("rank") / col("deg")).as("m"))
          .groupBy(col("rel"), col("id")).agg(rsum(col("m")).as("msum"))
        rank = nodes.join(msgs, Seq("rel", "id"), "left")
          .select(col("rel"), col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
      }
      rank.count()
      contrib.unpersist(false); nodes.unpersist(false)
    }

    // A2: current again
    time("A2 current") {
      graft.graph.DFGraphAlgs.pageRankByRel(relEdges(), iters).count()
    }

    spark.stop()
  }
}
