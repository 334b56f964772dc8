package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: phase timing of ml_train_eval's pipeline at sf0.1. */
object Probe4 {
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
      System.err.println(f"[probe4] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s")
      r
    }
    import graft.ops.TextHash.h28

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val e = time("edges") {
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
        .distinct().localCheckpoint(true)
    }
    val c = customer.select(col("c_custkey").as("id"))
    val pairs = time("pairSample") {
      c.crossJoin(spark.range(1, 6).select(col("id").as("delta")))
        .select(col("id").as("c1"), (col("id") + col("delta")).as("c2"))
        .join(c.select(col("id").as("c2")), "c2")
        .select(col("c1"), col("c2")).localCheckpoint(true)
    }
    System.err.println(s"[probe4] pairs=${pairs.count()}")
    val parity = h28(concat_ws("_", col("c"), col("p"))) % 2
    val eA = e.filter(parity === 0)
    val eB = e.filter(parity === 1)
    val labeled = time("labels (posB join)") {
      val posB = pairs
        .join(eB.select(col("c").as("c1"), col("p")), "c1")
        .join(eB.select(col("c").as("c2"), col("p").as("p2")), "c2")
        .filter(col("p") === col("p2"))
        .select(col("c1"), col("c2")).distinct()
        .withColumn("label", lit(1.0))
      pairs.join(posB, Seq("c1", "c2"), "left")
        .na.fill(0.0, Seq("label")).localCheckpoint(true)
    }
    val data = time("features") {
      val degA = eA.groupBy(col("p")).agg(count(lit(1)).as("pdeg"))
      val ewA = eA.join(degA, "p")
      val cn = labeled.select(col("c1"), col("c2"))
        .join(ewA.select(col("c").as("c1"), col("p"), col("pdeg")), "c1")
        .join(ewA.select(col("c").as("c2"), col("p").as("p2")), "c2")
        .filter(col("p") === col("p2"))
        .groupBy(col("c1"), col("c2"))
        .agg(count(lit(1)).cast("double").as("cn"),
          sum(lit(1.0) / log(col("pdeg") + 1)).as("aa"))
      val cdegA = eA.groupBy(col("c")).agg(count(lit(1)).cast("double").as("cdeg"))
      labeled.join(cn, Seq("c1", "c2"), "left")
        .join(cdegA.select(col("c").as("c1"), col("cdeg").as("deg1")), Seq("c1"), "left")
        .join(cdegA.select(col("c").as("c2"), col("cdeg").as("deg2")), Seq("c2"), "left")
        .na.fill(0.0, Seq("cn", "aa", "deg1", "deg2"))
        .withColumn("pref", log1p(col("deg1") * col("deg2")))
        .withColumn("deg1", log1p(col("deg1")))
        .withColumn("deg2", log1p(col("deg2")))
        .localCheckpoint(true)
    }
    val assembled = time("assemble+persist") {
      val a = new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("cn", "aa", "deg1", "deg2", "pref")).setOutputCol("features")
        .transform(data)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      a.count(); a
    }
    val split = h28(concat_ws("_", col("c1"), col("c2"))) % 10
    val train = assembled.filter(split < 8)
    val test = assembled.filter(split >= 8)
    val model = time("LR fit (10 iters)") {
      new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(10).setRegParam(0.01)
        .setLabelCol("label").setFeaturesCol("features")
        .fit(train)
    }
    val scored = time("transform+persist") {
      val sc = model.transform(test)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sc.count(); sc
    }
    time("2 metrics") {
      def metric(name: String) = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
        .setLabelCol("label").setMetricName(name).evaluate(scored)
      (metric("areaUnderROC"), metric("areaUnderPR"))
    }
    time("2 counts") { (train.count(), test.count()) }
    spark.stop()
  }
}
