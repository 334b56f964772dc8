package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Builds a 10× scale-up fixture (≈ sf1) from the sf0.1 tables, for the
  * BENCH_SF1 scale checkpoint: every plan claim (co-occurrence cap,
  * block-pair sweep, BSP loops, two-phase ranks) is otherwise validated
  * only at sf0.1; a 10× point catches secretly super-linear plans.
  *
  * Replication semantics — each replica is a DISJOINT copy of the world:
  * - Every entity key is offset by `replica × 10⁸` (far above any live
  *   key), so joins/graphs gain 10× rows without cross-replica edges.
  * - `region`/`nation` are fixed-size dimensions in TPC-H and stay as-is
  *   (replica customers reference the same nations — FKs hold).
  * - `documents.text` passes through a PER-REPLICA character bijection
  *   (translate over a 10-letter alphabet rotated by the replica id;
  *   replica 0 is identity). Within a replica the bijection preserves
  *   every duplicate/near-duplicate relationship exactly; across
  *   replicas it rewrites most shingles, so the dedup workload scales
  *   ~linearly instead of creating 10²× phantom cross-replica dup pairs
  *   no real corpus would have.
  * - `customer.c_name`/`supplier.s_name` are REGENERATED from the offset
  *   key (`Customer#%09d` of the new key) so names stay bijective with
  *   keys, as in the source fixture. Leaving them verbatim would give
  *   every name 10 exact copies and square the edit-distance-join
  *   output (measured: 2.18M → 217.85M candidate pairs, a 100× blowup
  *   that benchmarks the fixture artifact, not the plan); with the
  *   rewrite, cross-replica names differ in the leading replica digit —
  *   a constant 45 extra distance-1 pairs per base key, linear in n.
  * - `embeddings.embedding` is cyclically shifted by `replica × 7`
  *   positions: a coordinate permutation preserves all within-replica
  *   cosines (ANN index structure scales honestly) while cross-replica
  *   cosines decorrelate, so near-dup pair counts stay ~linear.
  * - `events.ts` passes through in the source fixture's own encoding
  *   (currently naive TIMESTAMP(MICROS); consumers adapt via
  *   OpsUtil.tsMicros) — the 10× user population over the same time
  *   range is the honest shape for watermark/state scaling.
  *
  * Output mirrors the driver fixture layout: one `<table>.parquet` FILE
  * per table (parquet is row-group-splittable, so a single file still
  * scans in parallel).
  */
object ScaleUp {
  private val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(0, replicas).select(col("id").as("__r"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    def off(c: String): org.apache.spark.sql.Column =
      (col(c) + col("__r") * Stride).as(c)

    // Per-replica text bijection: rotate a 10-letter alphabet by __r.
    val alpha = "aeiousrtln"
    val rotations = (0 until replicas)
      .map(r => alpha.drop(r % alpha.length) + alpha.take(r % alpha.length))
    def rotated = rotations.zipWithIndex.foldLeft(lit(null: String)) {
      case (acc, (rot, r)) => when(col("__r") === r,
        translate(col("text"), alpha, rot)).otherwise(acc)
    }

    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/__tmp_$name"
      // Bounded row groups (4 MB uncompressed): a parquet file can only
      // split at row-group boundaries, and the driver fixtures' single
      // giant row group serializes every scan stage — ana_correlation's
      // 6 M-row moment aggregation measured 19.9 s on ONE core at sf1
      // with 31 idle. Real lake tables are many-row-group by
      // construction; the checkpoint should test the splittable-scan
      // path the engine would actually run on a cluster (sessions pair
      // this with a fixture-sized spark.sql.files.maxPartitionBytes —
      // see Bench.scanSplitBytes).
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", 4 * 1024 * 1024)
        .parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(s"$dst/$name.parquet")
      if (target.exists()) target.delete()
      java.nio.file.Files.move(part.toPath, target.toPath)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
      System.err.println(s"[scaleup] $name done")
    }

    new java.io.File(dst).mkdirs()
    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))
    def named(pfx: String, key: String) =
      concat(lit(pfx), lpad((col(key) + col("__r") * Stride).cast("string"),
        9, "0"))
    write("customer", rep(Tables.customer(spark, src)).select(
      off("c_custkey"), named("Customer#", "c_custkey").as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
    write("supplier", rep(Tables.supplier(spark, src)).select(
      off("s_suppkey"), named("Supplier#", "s_suppkey").as("s_name"),
      col("s_nationkey"), col("s_acctbal")))
    write("part", rep(Tables.part(spark, src)).select(
      off("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")))
    write("orders", rep(Tables.orders(spark, src)).select(
      off("o_orderkey"), off("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))
    write("lineitem", rep(Tables.lineitem(spark, src)).select(
      off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))
    write("events", rep(Tables.events(spark, src)).select(
      off("event_id"), col("ts"), off("user_id"), col("event_type"),
      col("value"), col("props")))
    write("documents", rep(Tables.documents(spark, src)).select(
      off("doc_id"), rotated.as("text"), col("lang"), col("source"),
      col("n_chars")))
    write("embeddings", rep(Tables.embeddings(spark, src))
      .withColumn("__shift", pmod(col("__r") * 7, size(col("embedding"))))
      .select(
        off("vec_id"),
        concat(
          slice(col("embedding"), col("__shift") + 1,
            size(col("embedding")) - col("__shift")),
          slice(col("embedding"), lit(1), col("__shift"))).as("embedding"),
        col("label")))
    spark.stop()
  }
}
