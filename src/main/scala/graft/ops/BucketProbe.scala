package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: LSH bucket-size profile + candidate-pair count of
  * the similarity pack's bucket index at a given fixture dir (required
  * first argument — e.g. `runMain graft.ops.BucketProbe /path/to/sf`). */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: BucketProbe <fixtureDir> — the parquet fixture directory to profile")
    val dir = args.head
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val b = SimilarityPack.buckets(s, dir)
    val sizes = b.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    sizes.agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_n"),
        sum(col("n") * (col("n") - 1) / 2).as("cand_pairs"),
        sum(col("n")).as("n_rows"))
      .show(false)
    sizes.orderBy(col("n").desc).show(10, false)
    s.stop()
  }
}
