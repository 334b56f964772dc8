package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AnalyticsPack, DedupPack, EtlPack, EventsPack, GraphPack, MLPack, MultimodalPack, RelationalPack, SearchPack, SimilarityPack, SourcesPack, StreamingPack, TextPack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-capability packs (one per SURVEY.md §2
  * category); each SQL-expressible query also publishes DuckDB oracle SQL
  * checked by the driver at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalPack.queries("hub_top10_customers")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalPack.queries ++ AnalyticsPack.queries ++ GraphPack.queries ++
      DedupPack.queries ++ SimilarityPack.queries ++ TextPack.queries ++
      SearchPack.queries ++ MLPack.queries ++ EventsPack.queries ++
      StreamingPack.queries ++ MultimodalPack.queries ++ SourcesPack.queries ++
      EtlPack.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalPack.oracle ++ AnalyticsPack.oracle ++ GraphPack.oracle ++
      DedupPack.oracle ++ SimilarityPack.oracle ++ TextPack.oracle ++
      SearchPack.oracle ++ MLPack.oracle ++ EventsPack.oracle ++
      StreamingPack.oracle ++ MultimodalPack.oracle ++ SourcesPack.oracle ++
      EtlPack.oracle

  /** [[oracleSql]] with the dir-keyed entries made EXPLICIT — the form
    * Verify dumps, so the emitted SQL always describes the dir the
    * queries just ran against (EtlPack: the sf-scaled landing volume;
    * SourcesPack: the scratch files the layout queries wrote), never
    * the last-writer-wins scale of some interleaved invocation. */
  def oracleSqlFor(dir: String): Map[String, String] =
    oracleSql ++ EtlPack.oracleFor(EtlPack.scaleFor(dir)) ++
      SourcesPack.oracleFor(dir)
}
