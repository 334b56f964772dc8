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

  /** AS-OF join (last-value semantics): every left row is enriched with
    * `rightVal` from the most recent right row of the same `key` with
    * right ts ≤ left ts (null when no prior right row exists) — the
    * point-in-time enrichment a feature pipeline needs (no training-time
    * leakage from future values).
    *
    * Scale shape: the classic range join (l.ts >= r.ts) detonates into a
    * nested-loop/range product; this is instead ONE union + ONE window
    * per key — both sides are tagged, unioned, and a running
    * last-non-null over (ts, right-first) carries the latest right value
    * forward to each left row. One shuffle on the key, per-row window
    * state, no pair enumeration; skew is bounded by per-key event volume
    * exactly like sessionization. Right rows are first reduced to one
    * value per (key, ts) (max — a deterministic tie rule) so equal-ts
    * right duplicates cannot make the answer order-dependent. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsUs: String,
      rightVal: String, outCol: String = "asof_value"): DataFrame = {
    val rv = right
      .groupBy(col(key), col(tsUs))
      .agg(max(col(rightVal)).as(outCol))
    val leftCols = left.columns
    require(!leftCols.contains(outCol),
      s"left frame already has column $outCol; pass a different outCol")
    require(!leftCols.contains("__isr"),
      "left frame already has the reserved helper column __isr; rename it")
    val l2 = left
      .withColumn("__isr", lit(0))
      .withColumn(outCol, lit(null).cast(rv.schema(outCol).dataType))
    val extras = leftCols.filterNot(c => c == key || c == tsUs)
    val r2 = extras.foldLeft(rv.withColumn("__isr", lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val ordered = (leftCols :+ "__isr" :+ outCol).map(col)
    // Right rows sort BEFORE left rows at equal ts (__isr desc), so a
    // right value stamped at exactly the left row's ts is visible to it
    // ("at or before" semantics — DuckDB's ASOF l.ts >= r.ts).
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsUs).asc, col("__isr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.select(ordered: _*).unionByName(r2.select(ordered: _*))
      .withColumn(outCol,
        last(when(col("__isr") === 1, col(outCol)), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)
      .drop("__isr")
  }

  /** Funnel step detection: for every `stepB` event, was there a `stepA`
    * event of the same key at-or-before it within `windowUs`? Returns the
    * B rows with `converted` (0/1) and the matched A timestamp (null when
    * outside the window). Same one-window shape as [[asofJoin]] — no
    * range join, one shuffle on the key. */
  def funnel(events: DataFrame, key: Column, tsUs: Column, step: Column,
      stepA: String, stepB: String, windowUs: Long): DataFrame = {
    val clash = Seq("__lastA", "converted", "a_ts_us")
      .filter(c => events.columns.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"input frame already has column(s) ${clash.mkString(", ")}; rename them")
    val w = Window.partitionBy(key)
      .orderBy(tsUs.asc, (step === stepA).cast("int").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__lastA",
        last(when(step === stepA, tsUs), ignoreNulls = true).over(w))
      .filter(step === stepB)
      .withColumn("converted",
        (col("__lastA").isNotNull && tsUs - col("__lastA") <= windowUs).cast("int"))
      .withColumn("a_ts_us",
        when(col("converted") === 1, col("__lastA")))
      .drop("__lastA")
  }

  /** N-step funnel chain (A then B then C …, each within `windowUs` of
    * the PREVIOUS qualifying step): the [[funnel]] single-window shape
    * folded once per transition — k−1 per-key windows for a k-step
    * chain, never a self-join over the log. Stage k marks a row
    * "qualified" when it is step k and the last stage-(k−1) qualifier
    * lies within the window; within a timestamp tie, qualifiers sort
    * before consumers (the same (ts, is-qual DESC) order as [[funnel]]),
    * and ties among equal qualifiers all carry the same timestamp, so
    * the fold is deterministic without a full row tie-break. Returns
    * the final-step rows with a `converted` flag. */
  def funnelChain(events: DataFrame, key: Column, tsUs: Column, step: Column,
      steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel chain needs at least two steps")
    // With steps(k) == steps(k-1) a stage-k row would see its OWN
    // stage-(k-1) qualifier (the window frame includes currentRow) and
    // self-qualify at a 0-µs gap instead of requiring a PRIOR
    // occurrence — reject the ambiguous spec rather than guess.
    steps.sliding(2).zipWithIndex.foreach { case (pair, i) =>
      require(pair.head != pair.last,
        s"adjacent funnel steps must differ (steps $i and ${i + 1} are " +
          s"both '${pair.head}'); a repeat-step funnel needs an explicit " +
          "occurrence index, not a chain of identical labels")
    }
    var df = events.select(key.as("__u"), tsUs.as("__ts"), step.as("__st"))
      .withColumn("__q0", when(col("__st") === steps.head, col("__ts")))
    for (k <- 1 until steps.size) {
      val prev = s"__q${k - 1}"
      val w = Window.partitionBy(col("__u"))
        .orderBy(col("__ts").asc, col(prev).isNotNull.cast("int").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df = df
        .withColumn(s"__l${k - 1}", last(col(prev), ignoreNulls = true).over(w))
        .withColumn(s"__q$k",
          when(col("__st") === steps(k) && col(s"__l${k - 1}").isNotNull &&
            col("__ts") - col(s"__l${k - 1}") <= windowUs, col("__ts")))
    }
    df.filter(col("__st") === steps.last)
      .select(col("__u").as("key"), col("__ts").as("ts_us"),
        col(s"__q${steps.size - 1}").isNotNull.cast("int").as("converted"))
  }

  /** SCD Type-2 from a change log: collapse each key's CONSECUTIVE runs
    * of the same `state` value (ordered by `tsUs`, ties broken by `ord`
    * — pass a unique column or run boundaries are nondeterministic) into
    * validity intervals. Returns one row per run: (key, state,
    * valid_from, valid_to, n_events, is_current, run) where valid_to is
    * the NEXT run's start (null on the current run) and run is the
    * per-key 1-based run sequence. All windows partition by the key —
    * nothing global. */
  def scd2Ranges(events: DataFrame, key: Column, tsUs: Column, ord: Column,
      state: Column): DataFrame = {
    val clash = Seq("__chg", "run", "valid_from", "valid_to", "is_current", "n_events")
      .filter(c => events.columns.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"input frame already has column(s) ${clash.mkString(", ")}; rename them")
    val w = Window.partitionBy(key).orderBy(tsUs, ord)
    val runs = events
      .withColumn("__chg",
        when(lag(state, 1).over(w).isNull || lag(state, 1).over(w) =!= state, 1)
          .otherwise(0))
      .withColumn("run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key.as("key"), col("run"), state.as("state"))
      .agg(min(tsUs).as("valid_from"), count(lit(1)).as("n_events"))
    // run is the tie-break: adjacent runs share valid_from when duplicate
    // timestamps straddle a boundary, and run order IS event order.
    val w2 = Window.partitionBy(col("key")).orderBy(col("valid_from"), col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

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
