package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan/wall profile of sim_dedup_sweep (r12 regression hunt). */
object SweepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes",
        graft.tables.Tables.scanSplitBytes(sfDir, cpus.toInt))
      .config("spark.sql.files.openCostInBytes", 64L << 10)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sweep] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("buckets cache") {
      graft.ops.SimilarityPack.buckets(spark, sfDir).count()
    }
    val q = graft.ops.SimilarityPack.queries("sim_dedup_sweep")(spark, sfDir)
    time("sweep run") { q.count() }
    time("sweep rerun") { q.count() }
    println(q.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
