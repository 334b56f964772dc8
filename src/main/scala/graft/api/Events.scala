package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic event-time operators over ANY event frame (batch form; the
  * streaming twins live in graft.streaming.StreamOps). Time columns are
  * integer epoch micros throughout — exact arithmetic, no timezone or
  * float drift.
  */
object Events {

  /** Tumbling-window aggregation: epoch-aligned windows of `windowUs`
    * micros per `keyCol`. Returns (window_start_us, key, n). */
  def windowCounts(events: DataFrame, tsUs: Column, keyCol: Column,
      windowUs: Long): DataFrame =
    events
      .groupBy((tsUs.divide(windowUs).cast("long") * windowUs).as("window_start_us"),
        keyCol.as("key"))
      .agg(count(lit(1)).as("n"))

  /** Gap-based sessionization (the SQL islands form): a session breaks
    * when the gap to the user's previous event exceeds `gapUs`. Returns
    * one row per (user, session) with n_events and exact duration. */
  def sessionize(events: DataFrame, user: Column, tsUs: Column,
      gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy(user).orderBy(tsUs)
    events
      .withColumn("__prev", lag(tsUs, 1).over(byUser))
      .withColumn("__brk", (col("__prev").isNull || tsUs - col("__prev") > gapUs).cast("int"))
      .withColumn("sid", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(user.as("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(tsUs) - min(tsUs)).as("dur_us"))
  }
}
