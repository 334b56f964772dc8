package graft.tools
import org.apache.spark.sql.SparkSession
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bf = graft.ops.SimilarityPack.queries("sim_bruteforce_topk")(spark, d)
        .collect().map(_.getLong(0)).toSet
      val ivf = graft.ops.SimilarityPack.queries("sim_ivf_topk")(spark, d)
        .collect().map(_.getLong(0)).toSet
      println(s"RECALL $d: ${bf.intersect(ivf).size}/10 (ivf=${ivf.size})")
    }
    spark.stop()
  }
}
