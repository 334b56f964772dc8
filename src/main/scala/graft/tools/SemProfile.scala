package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level wall-clock profile of the SemDeDup path (dedup_semantic):
  * times the component cache, the quantizer fit, and the within-cell
  * pair sweep separately so scale work is aimed at the measured
  * bottleneck instead of the assumed one (r12: the two-level assignment
  * probe was built against the 18.4× sf10 residual, but the cold query
  * barely moved — this tool exists so that never happens blind again).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SemProfile
  */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.graft.profile", "true")
      .config("spark.sql.files.maxPartitionBytes",
        graft.tables.Tables.scanSplitBytes(sfDir, cpus.toInt))
      .config("spark.sql.files.openCostInBytes", 64L << 10)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semprofile] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("comps cache") {
      graft.ops.SimilarityPack.comps(spark, sfDir).count()
    }
    val cells = time("semCells fit") {
      val c = graft.ops.SimilarityPack.semCells(spark, sfDir)
      c.count()
      c
    }
    time("pair sweep + verify") {
      graft.ops.SimilarityPack.queries("dedup_semantic")(spark, sfDir).count()
    }
    time("warm re-run") {
      graft.ops.SimilarityPack.queries("dedup_semantic")(spark, sfDir).count()
    }
    println(s"[semprofile] cells=${cells.count()}")
    spark.stop()
  }
}
