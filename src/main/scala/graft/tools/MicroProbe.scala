package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmarks for expression-level cost questions raised by the
  * stage profiles (guide §1: measure before changing). Each probe is a
  * fixture-independent spark.range job, min-of-3, 32 slices — the same
  * discipline as Bench.calibrationProbe. Current probes answer: how much
  * of a BSP message round's CPU is the exact-decimal aggregation vs the
  * join/shuffle around it?
  *
  * Usage: runMain graft.tools.MicroProbe
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 40000000L
    def minOf(label: String)(job: () => Unit): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
      }.min
      System.err.println(f"[micro] $label%-42s $t%7.3f s")
    }
    val base = spark.range(0, n, 1, 32)
      .select((pmod(xxhash64(col("id")), lit(1000000L)) / lit(997.0)).as("x"),
        pmod(col("id"), lit(3000000L)).as("k"))
    minOf("double sum, global")(() =>
      base.select(sum(col("x"))).head())
    minOf("decimal(28,15) cast+sum, global")(() =>
      base.select(sum(col("x").cast("decimal(28,15)")).cast("double")).head())
    // The candidate rsum replacement's cost shape: integer part and
    // 10^15-unscaled fraction summed as LONGs (the real aggregate adds
    // carry normalization — same op class).
    minOf("long-pair split sums, global")(() =>
      base.select(
        sum(floor(col("x")).cast("long")),
        sum(((col("x") - floor(col("x"))) * lit(1e15)).cast("long"))).head())
    minOf("double sum, 3M groups")(() =>
      base.groupBy(col("k")).agg(sum(col("x"))).write
        .format("noop").mode("overwrite").save())
    minOf("decimal(28,15) sum, 3M groups")(() =>
      base.groupBy(col("k")).agg(sum(col("x").cast("decimal(28,15)")))
        .write.format("noop").mode("overwrite").save())
    minOf("long-pair split sums, 3M groups")(() =>
      base.groupBy(col("k")).agg(
        sum(floor(col("x")).cast("long")),
        sum(((col("x") - floor(col("x"))) * lit(1e15)).cast("long")))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
