package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables
import OpsUtil._

/** Relational/ETL operator pack — SURVEY.md §2.2 (projection/filter),
  * §2.3 (dedup), §2.4 (joins), §2.5 (aggregation), §2.6 (window/top-k).
  *
  * Each entry is a pure DataFrame program: filters sit next to the scan so
  * Catalyst pushes them into parquet, small dimension sides are broadcast,
  * and compared outputs are deterministic sets (exact decimal sums, explicit
  * tie-breaks on every top-k).
  */
object RelationalPack {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1+A5 — pricing summary (the reference's degree/stat aggregations
    // re-expressed on lineitem; ref notebook cells 83-84).
    "q1_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1+J4+W1 — top-10 hubs: degree per customer, enrich with name, top-k
    // with deterministic tie-break (ref notebook cells 95, 97).
    "hub_top10_customers" -> ((s, d) => {
      val deg = Tables.orders(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("degree"))
      deg.join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("degree"))
        .orderBy(col("degree").desc, col("c_custkey").asc)
        .limit(10)
    }),

    // P2/P3/P7/P8/P9 — cleaning: regex id extraction, scrub, empty→null,
    // cast-with-coercion (ref transformer.py:171,201,207-213).
    "etl_clean_project" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("bigint").as("name_id"),
          trim(regexp_replace(col("c_mktsegment"), "[\\r\\n\\t]+", " ")).as("segment_clean"),
          when(col("c_mktsegment") === "", lit(null)).otherwise(col("c_mktsegment")).as("segment_nn"),
          lower(col("c_name")).as("name_norm"))
        .filter(col("c_name").isNotNull && col("c_name") =!= "")
        .orderBy(col("c_custkey"))
    }),

    // P4/P5 — conjunctive regex validity filter + disjunctive garbage drop
    // (ref transformer.py:219-233): keep rows whose name matches the
    // Customer#NNN shape and whose segment is not itself an id-like token.
    "etl_regex_filter" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_name").rlike("^Customer#[0-9]+$"))
        .filter(!col("c_mktsegment").rlike("^[0-9]+$"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // D2 — keyed dedup audit (ref transformer.py:241).
    "dedup_keyed" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_distinct"))
        .orderBy(col("l_returnflag"))
    }),

    // D3 — canonical undirected-edge dedup via least/greatest
    // (ref transformer.py:116-134: (min,max,rel) key collapses A→B/B→A).
    "dedup_canonical_edges" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(
          least(col("l_orderkey"), col("l_suppkey")).as("k1"),
          greatest(col("l_orderkey"), col("l_suppkey")).as("k2"),
          col("l_returnflag").as("rel"))
        .distinct()
        .groupBy(col("rel")).agg(count(lit(1)).as("n_edges"))
        .orderBy(col("rel"))
    }),

    // D4 — node id universe: union of both edge endpoints, distinct
    // (ref notebook cell 35).
    "node_universe" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey").as("id"))
      val l = Tables.lineitem(s, d).select(col("l_suppkey").as("id"))
      o.union(l).distinct().orderBy(col("id"))
    }),

    // A2 — distinct ordered string-agg (ref join_unique, transformer.py:192-197);
    // array kept sorted so both engines agree on order.
    "agg_string_interests" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(concat_ws(", ", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
             count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),

    // A3/A4 — cardinality + null audit (ref transformer.py:203-206, nb 66-68).
    "agg_null_audit" -> ((s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_custkeys"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        sum(col("o_totalprice").isNull.cast("bigint")).as("null_totalprice"),
        sum((col("o_orderpriority").isNull || col("o_orderpriority") === "").cast("bigint")).as("empty_priority"))
    }),

    // A8 — histogram: 1000-wide buckets of order totalprice (ref nb cell 92).
    "agg_histogram_price" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy((floor(col("o_totalprice") / 1000) * 1000).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // S3-analog — year-partitioned aggregate: Catalyst prunes on the date
    // predicate the reference spliced into SPARQL (extractor.py:136-137).
    "agg_orders_by_year" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("order_year"))
    }),

    // A-family — ROLLUP grouping sets: per-(year, priority) counts plus
    // per-year and grand totals in ONE aggregation pass (the OLAP
    // subtotal shape — Spark expands grouping sets in a single shuffle,
    // no union of three group-bys). Null ordering pinned NULLS FIRST on
    // both engines (Spark's ASC default vs DuckDB's NULLS LAST differ).
    "agg_rollup_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("int").as("order_year"),
          col("o_orderpriority"), col("o_totalprice"))
        .rollup(col("order_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("order_year").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // A-family — CUBE grouping sets: all four aggregation lattices
    // (year×priority, year, priority, grand total) in ONE pass — the
    // grouping-set plan expands rows map-side, so the cube costs one
    // shuffle like the plain group-by, not four scans. Completes the
    // grouping-set family next to ROLLUP.
    "agg_cube_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("int").as("order_year"),
          col("o_orderpriority"), col("o_totalprice"))
        .cube(col("order_year"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("order_year").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // A-family — PIVOT to a wide per-year priority matrix (explicit value
    // list so the output schema is static — the distributed form never
    // needs a driver-side distinct to discover columns). Spark's pivot
    // compiles to conditional aggregation; the DuckDB twin writes that
    // form directly. Missing cells coalesce to 0 on both engines.
    "agg_pivot_priority" -> ((s, d) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val safe = Map(
        "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
        "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")
      val wide = Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("int").as("order_year"),
          col("o_orderpriority"))
        .groupBy(col("order_year"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
      val renamed = prios.foldLeft(wide)((df, p) => df.withColumnRenamed(p, safe(p)))
      renamed.select(col("order_year") +: prios.map(p =>
          coalesce(col(safe(p)), lit(0L)).as(safe(p))): _*)
        .orderBy(col("order_year"))
    }),

    // A-family — deterministic per-group mode: each nation's most common
    // customer market segment (tie → lexicographically smallest segment).
    // Count per (nation, segment) — a ≤ |nations|×|segments| domain with
    // full map-side combine — then one row_number over that tiny frame;
    // never a window over the raw rows.
    "agg_mode_per_group" -> ((s, d) => {
      val cnt = Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("n").desc, col("c_mktsegment").asc)
      cnt.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          col("c_mktsegment").as("modal_segment"), col("n"))
        .orderBy(col("nation"))
    }),

    // W-family — day-over-day deltas on the daily revenue series: one
    // aggregation collapses orders to ~2.4k (date) rows, then a single
    // unpartitioned lag() window over that BOUNDED date domain (the
    // calendar, not the data, sets its size — safe at any corpus scale).
    // Delta stays exact decimal; pct is one rounded double division.
    "win_lag_delta" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      val w = Window.orderBy(col("o_orderdate"))
      daily
        .withColumn("prev", lag(col("revenue"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_orderdate"), col("n_orders"), col("revenue"),
          (col("revenue") - col("prev")).as("delta"),
          round((col("revenue") - col("prev")).cast("double") / col("prev") * 100, 6)
            .as("pct_change"))
        .orderBy(col("o_orderdate"))
        .limit(3000)
    }),

    // W-family — 7-day MOVING average over the daily revenue series: the
    // RANGE-frame window form (value-based frame over the day ordinal,
    // not a row count — days with no orders widen a row frame but not a
    // range frame). Same bounded post-aggregation domain as
    // win_lag_delta; the frame sum stays exact decimal so the window
    // accumulation order can't leak into the hash.
    "win_moving_avg" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate"))
        .agg(sum(col("o_totalprice").cast("decimal(28,4)")).as("rev"))
        .withColumn("day", datediff(col("o_orderdate"), to_date(lit("1970-01-01"))))
      val w = Window.orderBy(col("day")).rangeBetween(-6, 0)
      daily
        .select(col("o_orderdate"),
          round(col("rev").cast("double"), 4).as("revenue"),
          round(sum(col("rev")).over(w).cast("double") / count(lit(1)).over(w), 6)
            .as("ma7"),
          count(lit(1)).over(w).as("n_days"))
        .orderBy(col("o_orderdate"))
        .limit(3000)
    }),

    // W-family — longest consecutive-day ordering streak per customer:
    // the canonical gaps-and-islands rank-difference trick (day ordinal
    // minus per-customer row_number is constant within a run). All
    // windows partition by customer; top-20 via TakeOrderedAndProject
    // with a total tie-break.
    "win_streaks" -> ((s, d) => {
      val days = Tables.orders(s, d)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("day"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      days
        .withColumn("isl", col("day") - row_number().over(w))
        .groupBy(col("o_custkey"), col("isl"))
        .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
        .select(col("o_custkey"), col("streak_days"), col("start_day"))
        .orderBy(col("streak_days").desc, col("o_custkey").asc, col("start_day").asc)
        .limit(20)
    }),

    // J1/J2/J3 — multi-hop dimension enrichment with broadcast joins.
    "join_enrich_region" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, col("c_nationkey") === col("n_nationkey"), "left")
        .join(r, col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("total_acctbal"))
        .orderBy(col("r_name"))
    }),

    // J6 anti — customers with no orders (taboo-check semantics,
    // ref ai_service.py:136-147).
    "join_anti_inactive" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J6 semi — existence check per segment.
    "join_semi_active" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
        .orderBy(col("c_mktsegment"))
    }),

    // A13/J5 — per-type dense sequence id (the reference's pyg_id,
    // transformer.py:173): row_number over (partition, stable order).
    "win_grouped_seqnum" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"),
          (row_number().over(w) - 1).cast("bigint").as("pyg_id"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // W3 — per-group top-k with deterministic tie-break (ref predicter.py:277-291).
    "win_topk_per_segment" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),

    // W-family breadth — distribution-position windows: quartile
    // (ntile), percent_rank, cume_dist per market segment. The ORDER BY
    // is a TOTAL order (acctbal desc, custkey asc), so ntile's row
    // placement and the peer groups of percent_rank/cume_dist are
    // engine-identical; the ≤200-key projection filter applies AFTER
    // the windows (positions are over the full segment).
    "win_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .filter(col("c_custkey") <= 200)
        .orderBy(col("c_custkey"))
    }),

    // W7 — sortedness validator (ref train_model.py:497-555 verifies
    // edge_index lexicographic order with diff masks): lag-window check
    // that lineitem line numbers ascend strictly within each order;
    // duplicated line numbers surface as violations. The window sort key
    // is a TOTAL order (the fixture has duplicate line numbers, and a
    // tie-ambiguous lag would attribute violations to different
    // returnflags run to run).
    "win_sortedness_check" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      Tables.lineitem(s, d)
        .withColumn("prev_ln", lag(col("l_linenumber"), 1).over(w))
        .select(col("l_returnflag"),
          (col("prev_ln").isNotNull && col("l_linenumber") <= col("prev_ln"))
            .cast("int").as("violation"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), sum(col("violation")).as("n_violations"))
        .orderBy(col("l_returnflag"))
    }),

    // Batch MERGE (upsert): a deterministic change batch — updates for
    // every key ≡ 3 (mod 10), inserts keyed above the live range for
    // every key ≡ 7 (mod 100) — merged into the customer dimension.
    // ONE full-outer equi-join on the key decides matched/new/kept per
    // row (the warehouse MERGE core); with both sides bucketed on the
    // key the exchange disappears entirely (etl_bucketed_join shows
    // that layout), otherwise it's a single key shuffle — never a scan
    // per branch. Insert keys sit at max(k) + 1 + k — derived from the
    // live range (one broadcast scalar), not a constant that a large
    // enough sf would collide with.
    "etl_merge_upsert" -> ((s, d) => {
      val tgt = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
      val upd = tgt.filter(col("k") % 10 === 3)
        .select(col("k"), col("name"), round(col("bal") + 100.0, 2).as("bal"))
      // Broadcast-scalar idiom (1-row aggregate, O(n) fanout — the same
      // shape as meanImpute/minmaxNormalize/gini); PlanSpec sanctions
      // exactly this one single-row nested-loop broadcast and still
      // forbids any unbounded nested loop in the MERGE itself.
      val off = tgt.agg((max(col("k")) + 1L).as("__off"))
      val ins = tgt.filter(col("k") % 100 === 7)
        .crossJoin(broadcast(off))
        .select((col("k") + col("__off")).as("k"),
          concat(lit("NEW#"), col("k") + col("__off")).as("name"),
          lit(0.0).as("bal"))
      val src = upd.unionByName(ins)
      tgt.select(col("k"), col("name").as("t_name"), col("bal").as("t_bal"))
        .join(src.select(col("k"), col("name").as("s_name"), col("bal").as("s_bal")),
          Seq("k"), "full_outer")
        .select(col("k").as("c_custkey"),
          coalesce(col("s_name"), col("t_name")).as("c_name"),
          coalesce(col("s_bal"), col("t_bal")).as("c_acctbal"),
          when(col("s_name").isNotNull && col("t_name").isNotNull, "update")
            .when(col("t_name").isNull, "insert")
            .otherwise("keep").as("action"))
        .orderBy(col("c_custkey"))
    }),

    // P13 — composite string key synthesis (ref notebook cell 31).
    "etl_composite_key" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(concat_ws("_",
          least(col("l_orderkey"), col("l_suppkey")),
          greatest(col("l_orderkey"), col("l_suppkey")),
          col("l_returnflag")).as("edge_key"))
        .groupBy(col("edge_key")).agg(count(lit(1)).as("n"))
        .orderBy(col("edge_key")).limit(100)
    })
  )

  val oracle: Map[String, String] = Map(
    "etl_merge_upsert" ->
      """WITH tgt AS (SELECT c_custkey AS k, c_name AS name, c_acctbal AS bal
        |  FROM customer),
        |off AS (SELECT max(k) + 1 AS o FROM tgt),
        |src AS (
        |  SELECT k, name, round(bal + 100.0, 2) AS bal FROM tgt WHERE k % 10 = 3
        |  UNION ALL
        |  SELECT k + o, 'NEW#' || CAST(k + o AS VARCHAR), 0.0
        |  FROM tgt, off WHERE k % 100 = 7)
        |SELECT COALESCE(t.k, s.k) AS c_custkey,
        |  COALESCE(s.name, t.name) AS c_name,
        |  COALESCE(s.bal, t.bal) AS c_acctbal,
        |  CASE WHEN s.name IS NOT NULL AND t.name IS NOT NULL THEN 'update'
        |       WHEN t.name IS NULL THEN 'insert'
        |       ELSE 'keep' END AS action
        |FROM tgt t FULL OUTER JOIN src s ON s.k = t.k
        |ORDER BY c_custkey""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "hub_top10_customers" ->
      """SELECT c_custkey, c_name, degree FROM (
        |  SELECT o_custkey, COUNT(*) AS degree FROM orders GROUP BY o_custkey
        |) d JOIN customer ON o_custkey = c_custkey
        |ORDER BY degree DESC, c_custkey ASC LIMIT 10""".stripMargin,

    "etl_clean_project" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_id,
        |  trim(regexp_replace(c_mktsegment, '[\r\n\t]+', ' ', 'g')) AS segment_clean,
        |  CASE WHEN c_mktsegment = '' THEN NULL ELSE c_mktsegment END AS segment_nn,
        |  lower(c_name) AS name_norm
        |FROM customer WHERE c_name IS NOT NULL AND c_name <> ''
        |ORDER BY c_custkey""".stripMargin,

    "etl_regex_filter" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE regexp_matches(c_name, '^Customer#[0-9]+$')
        |  AND NOT regexp_matches(c_mktsegment, '^[0-9]+$')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "dedup_keyed" ->
      """SELECT l_returnflag, COUNT(*) AS n_distinct FROM (
        |  SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag FROM lineitem
        |) GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "dedup_canonical_edges" ->
      """SELECT rel, COUNT(*) AS n_edges FROM (
        |  SELECT DISTINCT least(l_orderkey, l_suppkey) AS k1,
        |         greatest(l_orderkey, l_suppkey) AS k2,
        |         l_returnflag AS rel FROM lineitem
        |) GROUP BY rel ORDER BY rel""".stripMargin,

    "node_universe" ->
      """SELECT DISTINCT id FROM (
        |  SELECT o_custkey AS id FROM orders
        |  UNION ALL SELECT l_suppkey AS id FROM lineitem
        |) ORDER BY id""".stripMargin,

    "agg_string_interests" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ', ' ORDER BY c_mktsegment) AS segments,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "agg_null_audit" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT o_custkey) AS n_custkeys,
        |  COUNT(DISTINCT o_orderstatus) AS n_statuses,
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL OR o_orderpriority = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_priority
        |FROM orders""".stripMargin,

    "agg_histogram_price" ->
      """SELECT CAST(floor(o_totalprice / 1000) * 1000 AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "agg_orders_by_year" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         |  COUNT(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS total_price
         |FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |GROUP BY 1 ORDER BY order_year""".stripMargin,

    // GROUP BY ROLLUP in DuckDB emits the identical grouping sets; the
    // year expression must sit INSIDE the rollup list (position 1).
    "agg_rollup_orders" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY ROLLUP (1, o_orderpriority)
         |ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_pivot_priority" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
        |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin,

    "agg_cube_orders" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
         |  COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |GROUP BY CUBE (1, o_orderpriority)
         |ORDER BY order_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "agg_mode_per_group" ->
      """WITH cnt AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |rk AS (SELECT c_nationkey, c_mktsegment, n,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY n DESC, c_mktsegment ASC) AS rn
        |  FROM cnt)
        |SELECT n_name AS nation, c_mktsegment AS modal_segment, n
        |FROM rk JOIN nation ON c_nationkey = n_nationkey
        |WHERE rn = 1 ORDER BY nation""".stripMargin,

    "win_lag_delta" ->
      s"""WITH daily AS (SELECT o_orderdate, COUNT(*) AS n_orders,
         |    ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY o_orderdate),
         |lagged AS (SELECT o_orderdate, n_orders, revenue,
         |    lag(revenue) OVER (ORDER BY o_orderdate) AS prev
         |  FROM daily)
         |SELECT o_orderdate, n_orders, revenue,
         |  revenue - prev AS delta,
         |  round((revenue - prev) / prev * 100, 6) AS pct_change
         |FROM lagged WHERE prev IS NOT NULL
         |ORDER BY o_orderdate LIMIT 3000""".stripMargin,

    "win_moving_avg" ->
      """WITH daily AS (SELECT o_orderdate,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS rev,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) AS day
        |  FROM orders GROUP BY o_orderdate)
        |SELECT o_orderdate,
        |  round(CAST(rev AS DOUBLE), 4) AS revenue,
        |  round(CAST(SUM(rev) OVER (ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (ORDER BY day
        |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7,
        |  COUNT(*) OVER (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days
        |FROM daily ORDER BY o_orderdate LIMIT 3000""".stripMargin,

    "win_streaks" ->
      """WITH days AS (SELECT DISTINCT o_custkey,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) AS day
        |  FROM orders),
        |isl AS (SELECT o_custkey, day,
        |    day - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS isl
        |  FROM days)
        |SELECT o_custkey, COUNT(*) AS streak_days, MIN(day) AS start_day
        |FROM isl GROUP BY o_custkey, isl
        |ORDER BY streak_days DESC, o_custkey ASC, start_day ASC LIMIT 20""".stripMargin,

    "join_enrich_region" ->
      s"""SELECT r_name,
         |  COUNT(*) AS n_customers,
         |  ${dsumSql("c_acctbal")} AS total_acctbal
         |FROM customer
         |LEFT JOIN nation ON c_nationkey = n_nationkey
         |LEFT JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "join_anti_inactive" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_semi_active" ->
      """SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "win_grouped_seqnum" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) - 1 AS BIGINT) AS pyg_id
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin,

    "win_topk_per_segment" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rk
        |  FROM customer
        |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,

    "win_percentiles" ->
      """SELECT c_custkey, segment, c_acctbal, quartile, pct_rank, cume FROM (
        |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal,
        |    ntile(4) OVER w AS quartile,
        |    round(percent_rank() OVER w, 6) AS pct_rank,
        |    round(cume_dist() OVER w, 6) AS cume
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal DESC, c_custkey ASC)
        |) WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,

    "win_sortedness_check" ->
      """WITH l AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    lag(l_linenumber) OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS prev_ln
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(prev_ln IS NOT NULL AND l_linenumber <= prev_ln AS INT))
        |    AS BIGINT) AS n_violations
        |FROM l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "etl_composite_key" ->
      """SELECT concat_ws('_', least(l_orderkey, l_suppkey),
        |    greatest(l_orderkey, l_suppkey), l_returnflag) AS edge_key,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY edge_key LIMIT 100""".stripMargin
  )
}
