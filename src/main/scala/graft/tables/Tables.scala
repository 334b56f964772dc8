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
