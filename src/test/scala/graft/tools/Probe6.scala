package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for dedup_cluster_canonical (sf10 checkpoint
  * follow-up): candidate counts and per-stage times at two scales. */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/testdata_sf1", "/root/repo/testdata_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe6] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (d <- dirs) {
      println(s"[probe6] === $d ===")
      val sh = t("shingles")(graft.ops.DedupPack.shingleRows(spark, d).count())
      val sig = graft.ops.DedupPack.signatures(spark, d)
      t("signatures")(sig.count())
      val bands = graft.api.Dedup.lshBands(sig, 4).localCheckpoint(true)
      t("bands")(bands.count())
      val cand = graft.api.Dedup.lshCandidates(bands).localCheckpoint(true)
      val nc = t("candidates")(cand.count())
      val pairs = t("jaccard+filter") {
        graft.api.Dedup.jaccardOf(graft.ops.DedupPack.shingleRows(spark, d), cand)
          .filter(col("jaccard") >= 0.8)
          .select(col("i"), col("j")).localCheckpoint(true)
      }
      val np = pairs.count()
      val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
        .union(pairs.select(col("j").as("src"), col("i").as("dst")))
      t("components") {
        graft.graph.DFGraphAlgs.connectedComponents(edges, 8).count()
      }
      println(s"[probe6] shingle_rows=$sh candidates=$nc dup_pairs=$np")
    }
    spark.stop()
  }
}
