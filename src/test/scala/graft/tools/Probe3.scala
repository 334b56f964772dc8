package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextHash._

/** Dev-only: stage timing of the minhash signature pipeline at sf0.1. */
object Probe3 {
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
      System.err.println(f"[probe3] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    System.err.println(s"[probe3] docs=${docs.count()}")
    time("explode only") {
      docs.select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(shinglesFromWords(col("ws"), 3)).as("sh")).count()
    }
    val sh = time("explode+distinct (mat)") {
      docs.select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(shinglesFromWords(col("ws"), 3)).as("sh"))
        .distinct().localCheckpoint(true)
    }
    System.err.println(s"[probe3] shingle rows=${sh.count()}")
    time("h28") { sh.withColumn("h", h28(col("sh"))).agg(sum("h")).count() }
    val sig = time("sketch agg") {
      sh.withColumn("h", h28(col("sh")))
        .groupBy(col("doc_id"))
        .agg(call_function("minhash_sketch", col("h")).as("sig"))
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("j", "mh")))
        .localCheckpoint(true)
    }
    System.err.println(s"[probe3] sig rows=${sig.count()}")
    val bands = time("bands") {
      sig.groupBy(col("doc_id"), (col("j") / 4).cast("int").as("band"))
        .agg(sum((col("j") % 4 + 1) * col("mh")).as("bucket"))
        .localCheckpoint(true)
    }
    val cand = time("cand self-join") {
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
        .localCheckpoint(true)
    }
    System.err.println(s"[probe3] cand=${cand.count()}")
    val est = time("est") {
      cand.select(col("i").as("ci"), col("j").as("cj"))
        .join(sig.as("si"), col("ci") === col("si.doc_id"))
        .join(sig.as("sj"), col("cj") === col("sj.doc_id") && col("si.j") === col("sj.j"))
        .groupBy(col("ci").as("i"), col("cj").as("j"))
        .agg((sum(when(col("si.mh") === col("sj.mh"), 1).otherwise(0)) / lit(16.0)).as("est_jaccard"))
        .localCheckpoint(true)
    }
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = time("inter + final") {
      val iv = cand
        .join(sh.as("x"), col("i") === col("x.doc_id"))
        .join(sh.as("y"), col("j") === col("y.doc_id") && col("x.sh") === col("y.sh"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      est.join(iv, Seq("i", "j"))
        .join(sz.select(col("doc_id").as("i"), col("n").as("ni")), "i")
        .join(sz.select(col("doc_id").as("j"), col("n").as("nj")), "j")
        .select(col("i"), col("j"), round(col("est_jaccard"), 6),
          round(col("c") / (col("ni") + col("nj") - col("c")).cast("double"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.8).orderBy(col("i"), col("j")).collect().length
    }
    System.err.println(s"[probe3] out=$inter")
    spark.stop()
  }
}
