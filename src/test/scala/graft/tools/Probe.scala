package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the iterative graph family (not part of
  * the driver contract; run with SPARK_GRAFT_ONLY-style ad hoc args). */
object Probe {
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
    // warmup
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val pairs = time("relpairs") {
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("l_returnflag").as("rel"), col("o_custkey").as("c"),
          (col("l_suppkey") + (1L << 40)).as("p"))
        .distinct().localCheckpoint(true)
    }
    System.err.println(s"[probe] relpairs rows=${pairs.count()} parts=${pairs.rdd.getNumPartitions}")
    val edges = time("edges") {
      val cs = pairs.select(col("c"), col("p")).distinct()
      cs.select(col("c").as("src"), col("p").as("dst"))
        .union(cs.select(col("p").as("src"), col("c").as("dst")))
        .localCheckpoint(true)
    }
    System.err.println(s"[probe] edges rows=${edges.count()} parts=${edges.rdd.getNumPartitions}")

    // BFS rounds, timed individually
    val e = edges.withColumn("w", lit(1.0))
    val nodes = time("nodes") {
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct().localCheckpoint(true)
    }
    var dist = time("dist0") {
      nodes.select(col("id"),
        when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
        .localCheckpoint(true)
    }
    def round(d: org.apache.spark.sql.DataFrame) = {
      val relaxed = e.join(d, e("src") === d("id"))
        .filter(col("dist").isNotNull)
        .groupBy(col("dst").as("id")).agg(min(col("dist") + col("w")).as("reach"))
      d.join(relaxed, Seq("id"), "left")
        .select(col("id"), least(col("dist"), col("reach")).as("dist"))
    }
    for (k <- 1 to 6) {
      dist = time(s"bfs round $k (ckpt each)") { round(dist).localCheckpoint(true) }
    }
    var d2 = nodes.select(col("id"),
      when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
      .localCheckpoint(true)
    for (k <- 1 to 3) {
      d2 = time(s"bfs 2rounds $k (ckpt /2)") { round(round(d2)).localCheckpoint(true) }
    }
    var d3 = nodes.select(col("id"),
      when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
      .localCheckpoint(true)
    for (k <- 1 to 2) {
      d3 = time(s"bfs 3rounds $k (ckpt /3)") { round(round(round(d3))).localCheckpoint(true) }
    }
    // Variant: AQE disabled inside the loop
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var d4 = nodes.select(col("id"),
      when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
      .localCheckpoint(true)
    for (k <- 1 to 6) {
      d4 = time(s"bfs round $k (no AQE)") { round(d4).localCheckpoint(true) }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Variant: broadcast-hinted frontier
    def roundB(d: org.apache.spark.sql.DataFrame) = {
      val relaxed = e.join(broadcast(d), e("src") === d("id"))
        .filter(col("dist").isNotNull)
        .groupBy(col("dst").as("id")).agg(min(col("dist") + col("w")).as("reach"))
      d.join(broadcast(relaxed), Seq("id"), "left")
        .select(col("id"), least(col("dist"), col("reach")).as("dist"))
    }
    var d5 = nodes.select(col("id"),
      when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
      .localCheckpoint(true)
    for (k <- 1 to 6) {
      d5 = time(s"bfs round $k (bcast)") { roundB(d5).localCheckpoint(true) }
    }
    // Variant: co-partitioned edges (sorted once) + co-partitioned state
    val e6 = time("copart edges") {
      e.repartition(col("src")).sortWithinPartitions("src").localCheckpoint(true)
    }
    def roundC(d: org.apache.spark.sql.DataFrame) = {
      val relaxed = e6.join(d, e6("src") === d("id"))
        .filter(col("dist").isNotNull)
        .groupBy(col("dst").as("id")).agg(min(col("dist") + col("w")).as("reach"))
      d.join(relaxed, Seq("id"), "left")
        .select(col("id"), least(col("dist"), col("reach")).as("dist"))
    }
    var d6 = nodes.repartition(col("id")).select(col("id"),
      when(col("id") === 1L, lit(0.0)).otherwise(lit(null).cast("double")).as("dist"))
      .localCheckpoint(true)
    for (k <- 1 to 6) {
      d6 = time(s"bfs round $k (copart)") { roundC(d6).localCheckpoint(true) }
    }
    println("=== copart round plan ===")
    println(roundC(d6).queryExecution.executedPlan.toString.take(4000))
    time("final agg") {
      dist.filter(col("dist").isNotNull)
        .groupBy(col("dist").cast("int").as("dist")).agg(count(lit(1)))
        .collect()
    }
    System.err.println(s"[probe] d4=${d4.filter(col("dist").isNotNull).count()} d5=${d5.filter(col("dist").isNotNull).count()} d6=${d6.filter(col("dist").isNotNull).count()}")
    // equality check
    val n1 = dist.filter(col("dist").isNotNull).count()
    val n2 = d2.filter(col("dist").isNotNull).count()
    val n3 = d3.filter(col("dist").isNotNull).count()
    System.err.println(s"[probe] reached: each=$n1 half=$n2 third=$n3")
    spark.stop()
  }
}
