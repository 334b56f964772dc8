package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Source/sink pack — SURVEY.md §2.1: the reference's landing-zone formats
  * as real Spark sources and sinks, checked by round-tripping fixture
  * tables so the DuckDB oracle can verify the result against the
  * originals.
  *
  * - S6/S7 (ref extractor.py:150-169, transformer.py:91-114): the
  *   SPARQL-result shape — nested `{head, binding}` records — written as
  *   JSON and read back with schema inference, then flattened by nested
  *   struct projection (`col("binding.name")`), the Spark form of
  *   `pd.json_normalize` + `.value`-suffix projection.
  * - S8 (ref transformer.py:16-49): a directory of per-partition files
  *   where part of the schema lives in the file PATH, not the file body —
  *   Spark's Hive-style partition discovery recovers `r_regionkey` from
  *   the `r_regionkey=K/` directory names exactly as the reference parses
  *   `object_type` out of file names.
  *
  * Scale notes: JSON is the landing format only — everything downstream
  * is parquet. Both queries write through the normal committer (atomic
  * rename, safe under speculative execution) and read back with
  * parallelism = file count; at 100 TB the same code reads a whole
  * landing directory because `spark.read.json(dir)` takes directories.
  */
object SourcesPack {
  type Q = (SparkSession, String) => DataFrame

  /** Scratch dir for sink round-trips, keyed so sf dirs don't collide. */
  private def scratch(d: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_sources/${d.replaceAll("[^A-Za-z0-9.]", "_")}/$name"

  /** Per-row-group (file, rg, rows, min/max of ck and pc) read from the
    * REAL parquet footers of `dir` — the statistics a reader's
    * row-group pruning actually consults. Bounded driver-side metadata
    * pass (64 layout files here); at 100 TB these stats come from the
    * table-format manifest or a distributed listing, never a data scan. */
  private def footerZones(s: SparkSession, dir: String): DataFrame = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = s.sparkContext.hadoopConfiguration
    // Recurse one hive level: the deterministic layouts write one
    // pb=<bucket> directory per z/sort bucket.
    def list(f: java.io.File): Array[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty)
        .flatMap(c => if (c.isDirectory) list(c) else Array(c))
    val files = list(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getAbsolutePath)
    val rows = files.flatMap { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        rd.getFooter.getBlocks.asScala.toSeq.zipWithIndex.map { case (blk, i) =>
          // Loud, diagnosable failures on schema drift or stats-less
          // chunks (a writer may legally omit statistics) — a bare
          // .get/.asInstanceOf here surfaced as an opaque
          // NoSuchElementException inside the query.
          def mm(name: String): (Long, Long) = {
            val ch = blk.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .getOrElse(sys.error(s"footerZones: no column '$name' in ${f.getName} rg $i"))
            val st = ch.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue)
              sys.error(s"footerZones: no statistics for '$name' in ${f.getName} rg $i")
            (st.genericGetMin, st.genericGetMax) match {
              case (mn: Number, mx: Number) => (mn.longValue(), mx.longValue())
              case (mn, _) => sys.error(
                s"footerZones: non-numeric stats for '$name' in ${f.getName} rg $i (${mn.getClass.getName})")
            }
          }
          val (n1, x1) = mm("ck"); val (n2, x2) = mm("pc")
          (f.getName, i, blk.getRowCount, n1, x1, n2, x2)
        }
      } finally rd.close()
    }
    import s.implicits._
    rows.toSeq.toDF("file", "rg", "n", "min_ck", "max_ck", "min_pc", "max_pc")
  }

  val queries: Map[String, Q] = Map(
    // S6+S7 — JSON sink then scan+flatten: nation rows nested into the
    // SPARQL-binding shape, written as JSON lines, schema-inferred back,
    // flattened via nested struct projection.
    "src_json_roundtrip" -> ((s, d) => {
      val out = scratch(d, "nation_json")
      Tables.nation(s, d)
        .select(
          struct(col("n_nationkey").as("key")).as("head"),
          struct(col("n_name").as("name"), col("n_regionkey").as("region")).as("binding"))
        .write.mode(SaveMode.Overwrite).json(out)
      s.read.json(out)
        .select(
          col("head.key").cast("int").as("n_nationkey"),
          col("binding.name").as("n_name"),
          col("binding.region").cast("int").as("n_regionkey"))
        .orderBy(col("n_nationkey"))
    }),

    // CSV sink then scan — the interchange format every ingest still
    // meets: quoted strings (supplier comments carry commas), explicit
    // header, schema re-applied on read (never inferSchema at scale —
    // inference is a second full pass over the files). Round-trip must
    // be lossless for the quoted/escaped column.
    "src_csv_roundtrip" -> ((s, d) => {
      val out = scratch(d, "documents_csv")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"))
        .write.mode(SaveMode.Overwrite)
        .option("header", "true").option("quoteAll", "true")
        // The CSV WRITER trims field whitespace by default (both
        // ignore*WhiteSpace options default true on write) — a document
        // ending in whitespace/newline would round-trip lossily.
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(out)
      // multiLine keeps the round-trip lossless when a document's text
      // carries an embedded newline (quoteAll on the write quotes it;
      // without multiLine the read would split it into corrupt rows).
      // Tradeoff, stated: multiLine CSV files are not line-splittable —
      // parallelism comes from file count, which the partitioned write
      // above provides; parquet remains the scale format (SURVEY §4).
      s.read
        .schema("doc_id BIGINT, lang STRING, text STRING")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(out)
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("text_len"),
          md5(col("text")).as("text_md5"))   // content-exact round trip
        .orderBy(col("doc_id"))
    }),

    // S9 companion — ORC sink/scan roundtrip: the second columnar format
    // a lakehouse ingests (Spark's OrcFileFormat is built in, with the
    // same predicate-pushdown/column-pruning surface as parquet). Events
    // are written partitioned by event_type — the pushed-down equality
    // filter on the read side prunes to one partition directory, the
    // layout contract a 100 TB event store relies on — then aggregated;
    // the oracle computes the same aggregate from the parquet source, so
    // the roundtrip is value-exact including the timestamp column.
    "src_orc_roundtrip" -> ((s, d) => {
      val out = scratch(d, "events_orc")
      val e = Tables.events(s, d)
      e.withColumn("ts_us", OpsUtil.tsMicros(e))
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("event_type").orc(out)
      s.read.orc(out)
        .filter(col("event_type") === "purchase")   // partition-pruned scan
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
          OpsUtil.dsum(col("value")).as("total_value"))
    }),

    // Schema evolution across parquet generations: v1 files carry
    // (key, name), v2 files (key, regionkey); a mergeSchema read unions
    // the schemas and nulls the columns a generation lacks — the
    // landing-directory reality of any long-lived 100 TB dataset.
    // ANALYZE-style table profile — the stats collection every optimizer
    // and data catalog runs per column: row count, per-column null
    // counts, min/max bounds, and exact NDVs, in ONE scan (the distinct
    // counts share the expand; the KMV sketch is the bounded-memory
    // swap-in at 100 TB with no other plan change).
    "src_table_stats" -> ((s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("nulls_custkey"),
        countDistinct(col("o_custkey")).as("ndv_custkey"),
        countDistinct(col("o_orderstatus")).as("ndv_status"),
        countDistinct(col("o_orderpriority")).as("ndv_priority"),
        round(min(col("o_totalprice")), 4).as("min_price"),
        round(max(col("o_totalprice")), 4).as("max_price"),
        min(col("o_orderdate")).cast("date").as("min_date"),
        max(col("o_orderdate")).cast("date").as("max_date"))
    }),

    "src_schema_evolution" -> ((s, d) => {
      val out = scratch(d, "nation_evolve")
      val n = Tables.nation(s, d)
      n.select(col("n_nationkey"), col("n_name"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/v1")
      n.select(col("n_nationkey"), col("n_regionkey"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .agg(count(lit(1)).as("n_rows"),
          count(col("n_name")).as("n_with_name"),
          count(col("n_regionkey")).as("n_with_region"))
    }),

    // Bucketed sink + co-located join (the §4 shuffle-elimination story):
    // both sides written bucketed on the join key with the same bucket
    // count, so the fact-fact join runs with NO exchange on either side —
    // at 100 TB this is the difference between joining in place and
    // re-shuffling the lake. PlanSpec asserts the join-key exchanges are
    // absent from the physical plan.
    "etl_bucketed_join" -> ((s, d) => {
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val (liT, ordT) = (s"graft_li_$sfx", s"graft_ord_$sfx")
      // Drop catalog entries AND stale warehouse dirs (the in-memory
      // catalog forgets tables between sessions; the directories remain).
      Seq(liT, ordT).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.sessionState.conf.warehousePath + "/" + t)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      }
      // The two bucketed sinks are independent jobs writing disjoint
      // tables — run them CONCURRENTLY (guide §2.6: actions are only
      // sequential because the driver calls them sequentially; each
      // write uses 8 bucket tasks, so overlapped they fill the machine
      // the tail of one write would leave idle).
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = Seq(
        scala.concurrent.Future {
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
            .write.mode(SaveMode.Overwrite).format("parquet")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
        },
        scala.concurrent.Future {
          Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
            .write.mode(SaveMode.Overwrite).format("parquet")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordT)
        })
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      s.table(ordT)
        .join(s.table(liT), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(OpsUtil.dsum(col("l_extendedprice")).as("total_spend"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_custkey")).limit(1000)
    }),

    // Z-ORDER clustering audit (the §4 layout story, dimension 2): bucket
    // two query dimensions (customer, price) to 8 bits each, interleave
    // the bits into a Morton value, and range-split on it into 64 layout
    // partitions — then read back each partition's ZONE MAP (min/max per
    // dimension). Under a single-key sort every partition spans the full
    // range of the OTHER dimension; under Z-order every partition's
    // bounding box is narrow in BOTH — which is what lets file-level
    // min/max stats skip data for predicates on either column. The
    // physical rewrite at 100 TB is `repartitionByRange(n, zValue) →
    // sortWithinPartitions → parquet`; the audit here is the zone-map
    // table that layout yields, bit-replayed by the oracle.
    "etl_zorder_layout" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100, 0).cast("long").as("pc"))
      val stats = o.agg(min(col("ck")).as("mn1"), max(col("ck")).as("mx1"),
        min(col("pc")).as("mn2"), max(col("pc")).as("mx2"))
      o.crossJoin(broadcast(stats))
        .select(
          graft.api.Layout.rangeBucket(col("ck"), col("mn1"), col("mx1"), 256).as("b1"),
          graft.api.Layout.rangeBucket(col("pc"), col("mn2"), col("mx2"), 256).as("b2"))
        .select(col("b1"), col("b2"),
          shiftright(graft.api.Layout.zValue(col("b1"), col("b2")), 10).as("pid"))
        .groupBy(col("pid"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("b1")).as("min_b1"), max(col("b1")).as("max_b1"),
          min(col("b2")).as("min_b2"), max(col("b2")).as("max_b2"))
        .orderBy(col("pid"))
    }),

    // Z-ORDER data-skipping measured against a single-key sort, same
    // 64-partition budget: a rectangle predicate (1/8 of dim1 × 1/4 of
    // dim2) is tested against both layouts' zone maps; a partition is
    // scanned iff its bounding box intersects the rectangle. The output
    // row is the skipping scoreboard — rows scanned under each layout
    // vs rows actually matching — the measured form of "Z-order prunes
    // on every clustered dimension, sort only on the first".
    "etl_zorder_prune" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
        round(col("o_totalprice") * 100, 0).cast("long").as("pc"))
      val stats = o.agg(min(col("ck")).as("mn1"), max(col("ck")).as("mx1"),
        min(col("pc")).as("mn2"), max(col("pc")).as("mx2"))
      val b = o.crossJoin(broadcast(stats))
        .select(
          graft.api.Layout.rangeBucket(col("ck"), col("mn1"), col("mx1"), 256).as("b1"),
          graft.api.Layout.rangeBucket(col("pc"), col("mn2"), col("mx2"), 256).as("b2"))
        .select(col("b1"), col("b2"),
          shiftright(graft.api.Layout.zValue(col("b1"), col("b2")), 10).as("pid_z"),
          shiftright(col("b1"), 2).as("pid_s"))
      def hit(zone: DataFrame): DataFrame = zone
        .filter(col("max_b1") >= 64 && col("min_b1") <= 95 &&
          col("max_b2") >= 128 && col("min_b2") <= 191)
        .agg(count(lit(1)).as("parts_hit"), sum(col("n")).as("rows_scanned"))
      def zones(pid: String): DataFrame = b.groupBy(col(pid))
        .agg(count(lit(1)).as("n"),
          min(col("b1")).as("min_b1"), max(col("b1")).as("max_b1"),
          min(col("b2")).as("min_b2"), max(col("b2")).as("max_b2"))
      val hz = hit(zones("pid_z")).withColumnRenamed("parts_hit", "parts_hit_z")
        .withColumnRenamed("rows_scanned", "rows_scanned_z")
      val hs = hit(zones("pid_s")).withColumnRenamed("parts_hit", "parts_hit_s")
        .withColumnRenamed("rows_scanned", "rows_scanned_s")
      val tot = b.agg(count(lit(1)).as("total_rows"),
        sum((col("b1").between(64, 95) && col("b2").between(128, 191))
          .cast("long")).as("rows_matched"))
      hz.crossJoin(broadcast(hs)).crossJoin(broadcast(tot))
        .select(col("parts_hit_z"), col("rows_scanned_z"),
          col("parts_hit_s"), col("rows_scanned_s"),
          col("rows_matched"), col("total_rows"),
          round(lit(1.0) - col("rows_scanned_z").cast("double")
            / col("total_rows"), 6).as("skip_ratio_z"),
          round(lit(1.0) - col("rows_scanned_s").cast("double")
            / col("total_rows"), 6).as("skip_ratio_s"))
    }),

    // Z-ORDER on REAL parquet footers (the physical form of the two
    // zone-map audits above): write orders twice under the same
    // 64-partition budget — z-clustered (repartitionByRange on the
    // Morton value → sortWithinPartitions → parquet) and single-key
    // sorted — then score a rectangle predicate against the ACTUAL
    // row-group min/max statistics read from the files' footers. A row
    // group is scanned iff its stats box intersects the rectangle —
    // exactly the decision a parquet reader (or a lakehouse manifest
    // pruner) makes; the simulated zone-map table above is now
    // cross-checked by the physical layout. The footer read is a
    // bounded DRIVER-side metadata pass over 64 files (at 100 TB the
    // same min/max live in the table-format manifest, or are collected
    // by a distributed listing — never by scanning data). The oracle
    // reads the SAME files through DuckDB's parquet_metadata() — an
    // independent parquet-footer implementation — so a hash match
    // means both engines agree on what the physical layout can skip.
    "src_zorder_footer" -> ((s, d) => {
      val base = scratch(d, "zorder_phys")
      val o = Tables.orders(s, d).select(col("o_custkey").cast("long").as("ck"),
        round(col("o_totalprice") * 100, 0).cast("long").as("pc"))
      val st = o.agg(min(col("ck")).as("mn1"), max(col("ck")).as("mx1"),
        min(col("pc")).as("mn2"), max(col("pc")).as("mx2"))
      // ONE stats pass + ONE persisted bucket frame (r14, guide §2.4/§5):
      // the old shape recomputed o (and the stats crossJoin) separately
      // for each layout write, the rectangle probe, and the totals row —
      // six passes over orders per run; now the min/max row is collected
      // once, inlined as literals (same values the crossJoin delivered),
      // and both writes + the totals aggregate read the cached bucket
      // frame. Identical buckets, identical files, identical scoreboard.
      val sr0 = st.head()
      val b = o.select(col("ck"), col("pc"),
          graft.api.Layout.rangeBucket(col("ck"),
            lit(sr0.getLong(0)), lit(sr0.getLong(1)), 256).as("b1"),
          graft.api.Layout.rangeBucket(col("pc"),
            lit(sr0.getLong(2)), lit(sr0.getLong(3)), 256).as("b2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // DETERMINISTIC layout writes (r11 verdict): repartitionByRange's
      // boundaries come from per-run SAMPLING, so consecutive runs wrote
      // different files and the oracle could read a different generation
      // than the one the answer scored (the sf1 221/222 mismatch). The
      // bucket is now the same exact integer rule the zone-map audits
      // use (zv >> 10 and b1 >> 2 — 64 buckets each), routed with hash
      // repartition and written as one hive directory per bucket: the
      // layout is a pure function of the data, every re-run writes
      // identical files, and the per-bucket z-range stays contiguous
      // (a hash-collided flat layout would merge disjoint z-ranges into
      // one file and widen its stats box). The within-file sort carries
      // (ck, pc) tie-breaks so the row SEQUENCE — hence any row-group
      // split — is deterministic too.
      // Fill the bucket cache with one explicit pass, then run the two
      // layout writes CONCURRENTLY (guide §2.6 — they read the same
      // cached frame and write disjoint directories; overlapped, each
      // write's repartition/sort/encode back-fills the other's tail).
      // The fill comes first so the writes don't race to compute the
      // cache's partitions twice.
      b.count()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = Seq(
        scala.concurrent.Future {
          b.select(col("ck"), col("pc"),
              graft.api.Layout.zValue(col("b1"), col("b2")).as("zv"))
            .withColumn("pb", shiftright(col("zv"), 10))
            .repartition(64, col("pb"))
            .sortWithinPartitions(col("pb"), col("zv"), col("ck"), col("pc"))
            .select(col("ck"), col("pc"), col("pb"))
            .write.mode(SaveMode.Overwrite).partitionBy("pb").parquet(s"$base/z")
        },
        scala.concurrent.Future {
          b.select(col("ck"), col("pc"), shiftright(col("b1"), 2).as("pb"))
            .repartition(64, col("pb"))
            .sortWithinPartitions(col("pb"), col("ck"), col("pc"))
            .write.mode(SaveMode.Overwrite).partitionBy("pb").parquet(s"$base/s")
        })
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
      // The query rectangle: middle quarter of ck × middle quarter of pc,
      // integer-derived from the global min/max (oracle replays it from
      // the base table; same stats row as the bucket build above).
      val (mn1, mx1, mn2, mx2) = (sr0.getLong(0), sr0.getLong(1), sr0.getLong(2), sr0.getLong(3))
      val (lo1, hi1) = (mn1 + (mx1 - mn1) / 4, mn1 + (mx1 - mn1) / 2)
      val (lo2, hi2) = (mn2 + (mx2 - mn2) / 4, mn2 + (mx2 - mn2) / 2)
      def hit(zones: DataFrame, tag: String): DataFrame = zones
        .filter(col("max_ck") >= lo1 && col("min_ck") <= hi1 &&
          col("max_pc") >= lo2 && col("min_pc") <= hi2)
        .agg(count(lit(1)).as(s"rg_hit_$tag"), sum(col("n")).as(s"rows_scanned_$tag"))
      val hz = hit(footerZones(s, s"$base/z"), "z")
      val hs = hit(footerZones(s, s"$base/s"), "s")
      // Totals from the cached bucket frame (same ck/pc rows as o).
      val tot = b.agg(count(lit(1)).as("total_rows"),
        sum((col("ck").between(lo1, hi1) && col("pc").between(lo2, hi2))
          .cast("long")).as("rows_matched"))
      // Materialize the 1-row scoreboard eagerly so the bucket cache can
      // be released before the frame is consumed (als pattern).
      val out = hz.crossJoin(broadcast(hs)).crossJoin(broadcast(tot))
        .select(col("rg_hit_z"), col("rows_scanned_z"),
          col("rg_hit_s"), col("rows_scanned_s"),
          col("rows_matched"), col("total_rows"),
          round(lit(1.0) - col("rows_scanned_z").cast("double")
            / col("total_rows"), 6).as("skip_ratio_z"),
          round(lit(1.0) - col("rows_scanned_s").cast("double")
            / col("total_rows"), 6).as("skip_ratio_s"))
        .localCheckpoint()
      b.unpersist(false)
      out
    }),

    // Hive-style partitioned layout + DYNAMIC partition pruning: the
    // fact table is laid out partitioned by the dimension attribute it
    // is joined on (customer nation), and a REGION filter on the
    // dimension side prunes fact partitions AT RUNTIME through Spark's
    // DPP subquery — the scan reads 5 of 25 nation directories, decided
    // by the broadcast dim, not by a static literal. At 100 TB this is
    // the layout/pruning contract that turns a lake-wide scan into a
    // partition-local one. PlanSpec asserts the dynamicpruning
    // expression reaches the scan's partition filters.
    "src_partitioned_dpp" -> ((s, d) => {
      val out = scratch(d, "orders_by_nation")
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_nationkey"))
        .write.mode(SaveMode.Overwrite).partitionBy("c_nationkey").parquet(out)
      val dimN = Tables.nation(s, d)
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("n_nationkey"), col("n_name"))
      s.read.parquet(out)
        .join(dimN, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          OpsUtil.dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("n_name"))
    }),

    // P14 — snake_case conversion as the reference implements it: two
    // regex passes (acronym boundary, then lower/upper boundary) over a
    // dynamic name column. Runs on the reference's actual raw column
    // names carried as data; schema-level renames elsewhere apply the
    // same convention statically.
    "etl_snake_case" -> ((s, d) => {
      import s.implicits._
      CamelCols.toDF("raw")
        .select(col("raw"),
          lower(regexp_replace(
            regexp_replace(col("raw"), "(.)([A-Z][a-z]+)", "$1_$2"),
            "([a-z0-9])([A-Z])", "$1_$2")).as("snake"))
        .orderBy(col("raw"))
    }),

    // S8 — multi-file scan with path-derived column: region written as
    // JSON partitioned by r_regionkey (one directory per key), read back
    // through partition discovery.
    "src_multifile_union" -> ((s, d) => {
      val out = scratch(d, "region_parts")
      Tables.region(s, d)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("r_regionkey").json(out)
      s.read.json(out)
        .select(col("r_regionkey").cast("int").as("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    })
  )

  /** The reference's raw SPARQL-projection column names (the inputs its
    * snake_case pass actually sees — transformer.py:254-269,
    * tools/rename_columns.py:5-21). */
  private val CamelCols = Seq(
    "personLabel", "relationshipLabel", "objectTypeLabel", "birthYear",
    "personDescription", "subTypeOf", "pygId", "XMLHttpValue")

  val oracle: Map[String, String] = Map(
    "src_json_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "src_multifile_union" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,

    // The CSV round-trip must reproduce the source content byte-exactly.
    "src_csv_roundtrip" ->
      """SELECT doc_id, lang, length(text) AS text_len, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The ORC roundtrip must preserve values exactly — same aggregate
    // straight from the parquet source.
    "src_orc_roundtrip" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  MIN(epoch_ns(ts) // 1000) AS first_us,
        |  MAX(epoch_ns(ts) // 1000) AS last_us,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY event_type""".stripMargin,

    "src_table_stats" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nulls_custkey,
        |  COUNT(DISTINCT o_custkey) AS ndv_custkey,
        |  COUNT(DISTINCT o_orderstatus) AS ndv_status,
        |  COUNT(DISTINCT o_orderpriority) AS ndv_priority,
        |  round(MIN(o_totalprice), 4) AS min_price,
        |  round(MAX(o_totalprice), 4) AS max_price,
        |  CAST(MIN(o_orderdate) AS DATE) AS min_date,
        |  CAST(MAX(o_orderdate) AS DATE) AS max_date
        |FROM orders""".stripMargin,

    // The merged read sees every row twice, with each generation's
    // missing column null — equivalently, per-column counts over nation.
    "src_schema_evolution" ->
      """SELECT 2 * COUNT(*) AS n_rows, COUNT(n_name) AS n_with_name,
        |  COUNT(n_regionkey) AS n_with_region FROM nation""".stripMargin,

    "etl_snake_case" -> {
      val values = CamelCols.map(c => s"('$c')").mkString(", ")
      s"""SELECT raw,
         |  lower(regexp_replace(
         |    regexp_replace(raw, '(.)([A-Z][a-z]+)', '\\1_\\2', 'g'),
         |    '([a-z0-9])([A-Z])', '\\1_\\2', 'g')) AS snake
         |FROM (VALUES $values) AS t(raw) ORDER BY raw""".stripMargin
    },

    "src_partitioned_dpp" ->
      s"""SELECT n_name, COUNT(*) AS n_orders,
         |  ${OpsUtil.dsumSql("o_totalprice")} AS total_price
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "etl_bucketed_join" ->
      s"""SELECT o_custkey, ${OpsUtil.dsumSql("l_extendedprice")} AS total_spend,
         |  COUNT(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_custkey ORDER BY o_custkey LIMIT 1000""".stripMargin,

    // Replays the Morton interleave bit-for-bit (rangeBucketSql /
    // zValueSql are the same shift/mask terms the Spark columns compile
    // to).
    "etl_zorder_layout" ->
      s"""WITH o AS (SELECT o_custkey AS ck,
         |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc FROM orders),
         |st AS (SELECT MIN(ck) AS mn1, MAX(ck) AS mx1,
         |    MIN(pc) AS mn2, MAX(pc) AS mx2 FROM o),
         |bk AS (SELECT ${graft.api.Layout.rangeBucketSql("ck", "mn1", "mx1", 256)} AS b1,
         |    ${graft.api.Layout.rangeBucketSql("pc", "mn2", "mx2", 256)} AS b2
         |  FROM o, st),
         |z AS (SELECT b1, b2,
         |    (${graft.api.Layout.zValueSql("b1", "b2")}) >> 10 AS pid FROM bk)
         |SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  MIN(b1) AS min_b1, MAX(b1) AS max_b1,
         |  MIN(b2) AS min_b2, MAX(b2) AS max_b2
         |FROM z GROUP BY pid ORDER BY pid""".stripMargin,

    "etl_zorder_prune" ->
      s"""WITH o AS (SELECT o_custkey AS ck,
         |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc FROM orders),
         |st AS (SELECT MIN(ck) AS mn1, MAX(ck) AS mx1,
         |    MIN(pc) AS mn2, MAX(pc) AS mx2 FROM o),
         |bk AS (SELECT ${graft.api.Layout.rangeBucketSql("ck", "mn1", "mx1", 256)} AS b1,
         |    ${graft.api.Layout.rangeBucketSql("pc", "mn2", "mx2", 256)} AS b2
         |  FROM o, st),
         |z AS (SELECT b1, b2,
         |    (${graft.api.Layout.zValueSql("b1", "b2")}) >> 10 AS pid_z,
         |    b1 >> 2 AS pid_s FROM bk),
         |zz AS (SELECT pid_z, COUNT(*) AS n,
         |    MIN(b1) AS mn_b1, MAX(b1) AS mx_b1,
         |    MIN(b2) AS mn_b2, MAX(b2) AS mx_b2 FROM z GROUP BY 1),
         |zs AS (SELECT pid_s, COUNT(*) AS n,
         |    MIN(b1) AS mn_b1, MAX(b1) AS mx_b1,
         |    MIN(b2) AS mn_b2, MAX(b2) AS mx_b2 FROM z GROUP BY 1),
         |hz AS (SELECT CAST(COUNT(*) AS BIGINT) AS parts_hit_z,
         |    CAST(SUM(n) AS BIGINT) AS rows_scanned_z FROM zz
         |  WHERE mx_b1 >= 64 AND mn_b1 <= 95 AND mx_b2 >= 128 AND mn_b2 <= 191),
         |hs AS (SELECT CAST(COUNT(*) AS BIGINT) AS parts_hit_s,
         |    CAST(SUM(n) AS BIGINT) AS rows_scanned_s FROM zs
         |  WHERE mx_b1 >= 64 AND mn_b1 <= 95 AND mx_b2 >= 128 AND mn_b2 <= 191),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         |    CAST(SUM(CASE WHEN b1 BETWEEN 64 AND 95
         |      AND b2 BETWEEN 128 AND 191 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rows_matched FROM z)
         |SELECT parts_hit_z, rows_scanned_z, parts_hit_s, rows_scanned_s,
         |  rows_matched, total_rows,
         |  round(CAST(1.0 AS DOUBLE)
         |    - CAST(rows_scanned_z AS DOUBLE) / total_rows, 6) AS skip_ratio_z,
         |  round(CAST(1.0 AS DOUBLE)
         |    - CAST(rows_scanned_s AS DOUBLE) / total_rows, 6) AS skip_ratio_s
         |FROM hz, hs, t""".stripMargin
  )

  /** Oracles that must name the run's SCRATCH files — a pure function
    * of the data dir (no mutable scale global; Verify dumps
    * oracleSqlFor(dir) so the SQL always points at the files the
    * queries just wrote). src_zorder_footer's twin reads the SAME
    * physical parquet through DuckDB's parquet_metadata() — an
    * independent footer implementation — and replays the rectangle
    * from the base table's min/max with integer arithmetic. */
  def oracleFor(d: String): Map[String, String] = {
    val base = scratch(d, "zorder_phys")
    def zones(sub: String, a: String) =
      s"""$a AS (SELECT file_name, row_group_id,
         |    MAX(row_group_num_rows) AS n,
         |    MAX(CASE WHEN path_in_schema = 'ck'
         |      THEN CAST(stats_min_value AS BIGINT) END) AS min_ck,
         |    MAX(CASE WHEN path_in_schema = 'ck'
         |      THEN CAST(stats_max_value AS BIGINT) END) AS max_ck,
         |    MAX(CASE WHEN path_in_schema = 'pc'
         |      THEN CAST(stats_min_value AS BIGINT) END) AS min_pc,
         |    MAX(CASE WHEN path_in_schema = 'pc'
         |      THEN CAST(stats_max_value AS BIGINT) END) AS max_pc
         |  FROM parquet_metadata('$base/$sub/pb=*/*.parquet') GROUP BY 1, 2)""".stripMargin
    Map("src_zorder_footer" ->
      s"""WITH ${zones("z", "zm")},
         |${zones("s", "sm")},
         |o AS (SELECT CAST(o_custkey AS BIGINT) AS ck,
         |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS pc FROM orders),
         |st AS (SELECT MIN(ck) AS mn1, MAX(ck) AS mx1,
         |    MIN(pc) AS mn2, MAX(pc) AS mx2 FROM o),
         |rect AS (SELECT mn1 + (mx1 - mn1) // 4 AS lo1,
         |    mn1 + (mx1 - mn1) // 2 AS hi1,
         |    mn2 + (mx2 - mn2) // 4 AS lo2,
         |    mn2 + (mx2 - mn2) // 2 AS hi2 FROM st),
         |hz AS (SELECT CAST(COUNT(*) AS BIGINT) AS rg_hit_z,
         |    CAST(SUM(n) AS BIGINT) AS rows_scanned_z FROM zm, rect
         |  WHERE max_ck >= lo1 AND min_ck <= hi1
         |    AND max_pc >= lo2 AND min_pc <= hi2),
         |hs AS (SELECT CAST(COUNT(*) AS BIGINT) AS rg_hit_s,
         |    CAST(SUM(n) AS BIGINT) AS rows_scanned_s FROM sm, rect
         |  WHERE max_ck >= lo1 AND min_ck <= hi1
         |    AND max_pc >= lo2 AND min_pc <= hi2),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
         |    CAST(SUM(CASE WHEN ck BETWEEN lo1 AND hi1
         |      AND pc BETWEEN lo2 AND hi2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS rows_matched FROM o, rect)
         |SELECT rg_hit_z, rows_scanned_z, rg_hit_s, rows_scanned_s,
         |  rows_matched, total_rows,
         |  round(CAST(1.0 AS DOUBLE)
         |    - CAST(rows_scanned_z AS DOUBLE) / total_rows, 6) AS skip_ratio_z,
         |  round(CAST(1.0 AS DOUBLE)
         |    - CAST(rows_scanned_s AS DOUBLE) / total_rows, 6) AS skip_ratio_s
         |FROM hz, hs, t""".stripMargin)
  }
}
