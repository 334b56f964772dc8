package graft.ops

// Temporary profiling harness — not part of the library surface.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes",
        graft.tables.Tables.scanSplitBytes("/root/repo/testdata_sf1", cpus))
      .config("spark.sql.files.openCostInBytes", 64L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/repo/testdata_sf1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-40s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r")
    }
    spark.range(100).selectExpr("id % 7 k", "id v").groupBy("k").sum("v").count()
    val t0 = System.nanoTime()
    graft.ops.Warm.sharedIntermediates(spark, d).foreach { case (n, t) =>
      println(f"[scratch] warm $n%-26s $t%8.2f s")
    }
    println(f"[scratch] warm TOTAL ${(System.nanoTime()-t0)/1e9}%8.2f s")
    spark.stop()
  }
}
