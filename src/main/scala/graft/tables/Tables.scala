package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated TPC-H-ish fixtures (TESTDATA.md).
  *
  * These play the role of the reference's social tables (SURVEY.md §7.1):
  * `customer`/`supplier` ≈ nodes, `orders`/`lineitem` ≈ edges/relations,
  * `events` ≈ activity log, `documents`/`embeddings` back the
  * training-data-pipeline operators (dedup / similarity / text analysis).
  *
  * Scale note: each loader is a plain parquet scan so Catalyst pushes
  * filters and prunes columns into the file source; never pre-cache here.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fixture-sized scan split: `spark.sql.files.maxPartitionBytes` such
    * that the LARGEST table in `dir` splits across all `cpus` cores
    * (clamped to [1 MB, 128 MB]). The 128 MB default assumes a lake of
    * many files; a local fixture is one file per table, so without this
    * a 77 MB lineitem scans — and partial-aggregates — on one core with
    * 31 idle. Splitting only helps when the file's row groups are
    * smaller than the split (tools/ScaleUp writes 4 MB row groups for
    * exactly this reason); against single-row-group files the setting is
    * harmless. On a real cluster the default is right — this knob is
    * local-bench sizing, same discipline as shuffle.partitions = cpus.
    */
  def scanSplitBytes(dir: String, cpus: Int): Long = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    val parquet = files.filter(_.getName.endsWith(".parquet"))
    // No parquet found (unreadable dir, non-local path, misconfigured
    // sfDir): keep Spark's 128 MB default rather than falling through to
    // the pathological 1 MB floor — this knob only exists to SHRINK the
    // split for a known local fixture.
    if (parquet.isEmpty) return 128L << 20
    val largest = parquet.map(_.length()).foldLeft(0L)(math.max)
    math.min(128L << 20, math.max(1L << 20, largest / math.max(1, cpus)))
  }

  /** Spread a scan before HEAVY per-row work (shingling, tokenizing,
    * regex gates): one round-robin pass of the raw rows buys full-width
    * parallelism for a downstream stage that is a large multiple of the
    * input (a 3-shingle explode alone is ~50 rows out per row in).
    * Use ONLY where that multiple holds — then the shuffle is bounded
    * by a fraction of the work it parallelizes at any scale, and it
    * recovers the idle-core loss whenever the scan is under-split
    * (a local single-file fixture splits only at row-group boundaries,
    * so fused tokenize stages otherwise run on 1-2 of 32 cores; the
    * cluster analogs are a small-file source or a skewed split). For
    * cheap projections/aggregations, never spread — the scan-fused
    * form is strictly better. */
  def spread(df: DataFrame): DataFrame = {
    // SCAN-STARVATION GATE (r13 verdict: unconditional spread is fixture
    // tuning — at 100 TB the exchange would round-robin the whole table
    // for parallelism the scan already has). The starved case this knob
    // exists for is a FEW-FILE source (the local fixtures are one
    // single-row-group file per table, so every fused stage runs 1-2
    // wide no matter how many byte-range splits the scan planner cuts —
    // a file only yields rows at row-group boundaries). A source with at
    // least one file per core cannot be starved that way: every file
    // carries ≥ 1 row group, so the scan fans out to ≥ cores non-empty
    // tasks and the spread is pure shuffle cost — skip it. File count is
    // driver metadata (no job).
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val nFiles = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (nFiles >= cores) df else df.repartition(cores)
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
