package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's end-to-end ETL chain over its ACTUAL landing data
  * contract — SPARQL result JSON (`{head, results.bindings}` with
  * `{type, value, xml:lang}` cells) — re-expressed as one declarative
  * Spark chain (SURVEY.md §3.1, §5; FIXTURES.md §1.1-1.3).
  *
  * Reference shape (cited, not copied):
  *  - extractor.py:150-169 writes one whole JSON document per page;
  *    transformer.py:104-108 `json.load` + `pd.json_normalize(bindings)`.
  *    Here: `spark.read.option("multiLine", true).json(dir)` — one row
  *    per page file — then `posexplode(results.bindings)` + nested
  *    struct projection of the `.value` leaves. Page order recovered
  *    from the file name (the reference concatenates pages in file
  *    order, transformer.py:60-88).
  *  - transformer.py:175-246 clean chain: `.value`-suffix projection,
  *    whitespace scrub, URI→Q-id strip, garbage-id filter (`^Q\d+$` on
  *    both endpoints), unresolved-label filter (label itself `^Q\d+$`),
  *    null/empty person drop, (person, rel, object) dedup keep-first,
  *    canonical back-edge dedup keep-first.
  *  - transformer.py:139-173 node build: person-side ∪ object-side
  *    projections, keep-first by id, birth-year numeric coercion,
  *    occupation side-table left-merge, per-type dense `pyg_id`.
  *
  * Deliberate deviations (deterministic-by-construction, documented so
  * the DuckDB oracle can replay them bit-for-bit):
  *  - multi-valued attribute collapse uses SORTED distinct join
  *    (`array_sort(collect_set)`), not pandas first-occurrence order;
  *  - "keep first" is an explicit `row_number() OVER (ORDER BY ord)`
  *    on the landing position, not partition-order luck;
  *  - pandas' `astype(str)` NaN→"nan" artifacts are not reproduced —
  *    nulls stay nulls and the filters handle them explicitly.
  *
  * Scale: the whole chain is narrow maps + hash-partitioned
  * window/aggregation on high-cardinality keys (person, triple,
  * canonical pair, node id) — no driver collection, no all-pairs
  * product, no global sort. At 100 TB the landing read parallelizes by
  * file count (pages are ~5k rows each per extractor settings.py:35)
  * and everything downstream by shuffle partition.
  */
object Etl {

  /** Raw SPARQL-binding vars carried by the landing fixture (FIXTURES.md
    * §1.1 plus the two type vars that stand in for the reference's
    * side-table merges, transformer.py:136-141). */
  val Vars: Seq[String] = Seq(
    "person", "personLabel", "personDescription", "personType", "birthYear",
    "birthPlaceLabel", "countryLabel",
    "object", "objectLabel", "objectDescription", "objectType",
    "relationshipLabel")

  /** The SPARQL-result landing schema, stated explicitly: every binding
    * var is a `{type, value, xml:lang}` cell (the W3C SPARQL-JSON cell
    * shape — extractor.py:150-169's contract). An explicit schema is
    * the scale discipline, not a convenience: schema INFERENCE is a
    * whole extra pass over every landing file before the first real
    * read, and at 100 TB the landing zone is read many times per
    * pipeline run. Extra keys a cell might carry (`datatype`) are
    * simply never parsed. */
  val landingSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val cell = StructType(Seq(
      StructField("type", StringType), StructField("value", StringType),
      StructField("xml:lang", StringType)))
    StructType(Seq(StructField("results", StructType(Seq(
      StructField("bindings",
        ArrayType(StructType(Vars.map(v => StructField(v, cell))))))))))
  }

  /** S7 on the real landing shape: whole-document JSON pages →
    * one row per binding, `.value` leaves projected, plus `ord` (global
    * landing position: page*100000 + 1-based offset) and the
    * `xml:lang` tag of the person label (proving the metadata leaves
    * are reachable before the clean chain drops them). */
  def flattenSparql(s: SparkSession, dir: String): DataFrame = {
    val pages = s.read.option("multiLine", "true").schema(landingSchema).json(dir)
      .withColumn("page",
        regexp_extract(input_file_name(), "page_(\\d+)", 1).cast("int"))
      .select(col("page"), posexplode(col("results.bindings")).as(Seq("pos", "b")))
    val valueCols = Vars.map(v => col(s"b.$v.value").as(v))
    // Long arithmetic BEFORE the multiply: an int product wraps silently
    // in Spark but errors in DuckDB — the engines would diverge instead
    // of hash-matching. 100k slots per page is 20× the extractor's 5k
    // page size (settings.py:35); a page overrunning it would collide
    // ords across pages, so the bound is part of the landing contract.
    pages.select(
      (col("page").cast("long") * 100000L + col("pos") + 1).as("ord") +:
        col("b.personLabel.`xml:lang`").as("personLang") +:
        valueCols: _*)
  }

  private def scrub(c: Column): Column =
    trim(regexp_replace(c, "[\\r\\n\\t]+", " "))

  private def qId(c: Column): Column = element_at(split(c, "/"), -1)

  /** Matches only when the (scrubbed) value is a bare Q-id; null-safe
    * (null → false), mirroring DuckDB's COALESCE(regexp_matches(..)). */
  private def isQ(c: Column): Column =
    coalesce(c.rlike("^Q\\d+$"), lit(false))

  /** The full clean chain on a flattened landing frame: multi-value
    * collapse → scrub → Q-id strip → garbage filters → triple dedup →
    * canonical back-edge dedup. Returns one row per surviving edge with
    * both raw-var and collapsed attribute columns plus `ord`.
    *
    * Ordering matches the reference: transformer.py:197-213 runs the
    * per-person collapse FIRST, on the raw flattened frame (group key =
    * the full person URI, values unscrubbed), BEFORE the scrub / URI
    * strip / garbage filters — so rows the filters later drop still
    * contribute attribute values to persons that survive. The fixture
    * plants a probe row for this (an unresolved-object-label row whose
    * unique countryLabel must still reach its person's collapsed set). */
  def cleanSparql(flat: DataFrame): DataFrame = {
    // transformer.py:197-201 — sorted distinct ", "-join (deviation: the
    // reference joins in first-occurrence order with NaN→' ' artifacts;
    // here order is canonical and empty → null). Hash aggregation on
    // `person`, then an equi-join back — both sides shuffle once on the
    // same key.
    def joined(v: String): Column = {
      val j = array_join(array_sort(collect_set(col(v))), ", ")
      when(j === "", lit(null)).otherwise(j).as(v)
    }
    val collapsed = flat.groupBy("person")
      .agg(joined("countryLabel"), joined("birthPlaceLabel"), joined("birthYear"))
    val merged = flat
      .drop("countryLabel", "birthPlaceLabel", "birthYear")
      .join(collapsed, Seq("person"), "left")

    // transformer.py:214-216 — the whole-frame scrub runs AFTER the
    // merge, so collapsed lists pass through it too.
    val scrubbed = merged.select(
      col("ord") +: Vars.map(v => scrub(col(v)).as(v)): _*)
    val ids = scrubbed
      .withColumn("person", qId(col("person")))
      .withColumn("object", qId(col("object")))
      // transformer.py:226-242 — both endpoint ids must be bare Q-ids,
      // neither label may be an unresolved Q-id, person non-empty.
      .filter(isQ(col("person")) && isQ(col("object")))
      .filter(!(isQ(col("personLabel")) || isQ(col("objectLabel"))))
      .filter(col("person").isNotNull && col("person") =!= "")

    // transformer.py:244 — (person, rel, object) dedup, keep first
    // landing occurrence; then :116-134 — canonical undirected dedup.
    val tripleW = Window
      .partitionBy(col("person"), col("relationshipLabel"), col("object"))
      .orderBy(col("ord"))
    val canonW = Window
      .partitionBy(least(col("person"), col("object")),
        greatest(col("person"), col("object")), col("relationshipLabel"))
      .orderBy(col("ord"))
    ids
      .withColumn("__rn", row_number().over(tripleW)).filter(col("__rn") === 1)
      .withColumn("__cn", row_number().over(canonW)).filter(col("__cn") === 1)
      .drop("__rn", "__cn")
  }

  /** Edges split (transformer.py:251-269): the seven snake_case columns
    * of the cleaned frame. */
  def edges(cleaned: DataFrame): DataFrame =
    cleaned.select(
      col("person"), col("personLabel").as("person_label"),
      col("personType").as("person_type"),
      col("relationshipLabel").as("relationship_label"),
      col("object"), col("objectLabel").as("object_label"),
      col("objectType").as("object_type"))

  /** Nodes split (transformer.py:139-173): person-side ∪ object-side
    * projections of the cleaned frame, keep-first by id in the
    * reference's concat order — ALL person-side rows precede all
    * object-side rows, each side in landing order — expressed as the
    * two-column sort key (side, ord) rather than an additive offset
    * (an offset constant silently inverts the tie-break once ord
    * outgrows it). Occupation left-merged from a side table keyed by
    * id, birth-year coerced (bad/multi-valued parses → null), dense
    * per-type `pyg_id` in first-occurrence order.
    *
    * Scale contract: `pyg_id` is an inherently sequential per-type
    * index (the reference's `groupby(type).cumcount()`), so its window
    * partitions by `type` — 11 values at the reference's 4.6 M-node
    * scale, i.e. one ~3 M-row sorted partition for `human`. That is the
    * semantic, not an accident; at 100× swap the window for the
    * standard two-phase form (per-partition counts → exclusive prefix
    * offsets → partition-local running index) with no API change. */
  def nodes(cleaned: DataFrame, occupations: DataFrame): DataFrame = {
    val pSide = cleaned.select(
      col("person").as("id"), col("personLabel").as("name"),
      col("personDescription").as("description"),
      col("birthYear").as("birth_year_raw"),
      col("countryLabel").as("country"),
      col("birthPlaceLabel").as("birth_place"),
      col("personType").as("type"),
      lit(0).as("side"), col("ord").as("node_ord"))
    val oSide = cleaned.select(
      col("object").as("id"), col("objectLabel").as("name"),
      col("objectDescription").as("description"),
      lit(null).cast("string").as("birth_year_raw"),
      lit(null).cast("string").as("country"),
      lit(null).cast("string").as("birth_place"),
      col("objectType").as("type"),
      lit(1).as("side"), col("ord").as("node_ord"))
    val firstW = Window.partitionBy(col("id"))
      .orderBy(col("side"), col("node_ord"))
    val pygW = Window.partitionBy(col("type"))
      .orderBy(col("side"), col("node_ord"))
    pSide.unionAll(oSide)
      .withColumn("__rn", row_number().over(firstW)).filter(col("__rn") === 1)
      .join(occupations, Seq("id"), "left")
      // try_cast: the reference's to_numeric(errors='coerce') — bad or
      // multi-valued years become null instead of an ANSI cast error.
      .withColumn("birth_year", expr("try_cast(birth_year_raw AS int)"))
      .withColumn("pyg_id", (row_number().over(pygW) - 1).cast("long"))
      .select(col("id"), col("name"), col("description"), col("birth_year"),
        col("country"), col("birth_place"), col("type"), col("occupation"),
        col("pyg_id"))
  }

  /** The reference's edge-COST model (bfs.py:15-90) over the ETL
    * outputs — the §3.2 path-query preprocessing on its own data shape:
    *  - blacklisted relations (`influenced_by`) cost ∞ (impassable);
    *  - hub avoidance: base cost = ln(in_degree(dst) + 1) over the
    *    FULL heterograph's in-degrees (blacklisted edges included,
    *    matching igraph's degree(mode='in'));
    *  - generation gap: both endpoints human with valid years
    *    (non-null, > 1000) and |Δyear| > 15 adds (|Δyear| − 15)/5.
    * One in-degree aggregation + two node-attribute joins — all
    * hash-partitioned equi-joins, no broadcast hints (the node side is
    * 4.6 M rows at the reference's scale; AQE may still elect a
    * broadcast when it measures small). Costs round to 6 places (ln is
    * inherently float); ∞ survives rounding on both engines. */
  def edgeWeights(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val indeg = edges.groupBy(col("object").as("__d"))
      .agg(count(lit(1)).as("in_deg"))
    val src = nodes.select(col("id").as("person"),
      col("type").as("__st"), col("birth_year").as("__sy"))
    val dst = nodes.select(col("id").as("object"),
      col("type").as("__dt"), col("birth_year").as("__dy"))
    val gap = abs(col("__sy") - col("__dy"))
    val agePenalty = when(
      col("__st") === "human" && col("__dt") === "human" &&
        col("__sy").isNotNull && col("__dy").isNotNull &&
        col("__sy") > 1000 && col("__dy") > 1000 && gap > 15,
      (gap - 15) / 5.0).otherwise(0.0)
    edges
      .join(indeg, col("object") === col("__d")).drop("__d")
      .join(src, "person").join(dst, "object")
      .select(col("person"), col("object"),
        col("relationship_label"), col("in_deg"),
        when(col("relationship_label") === "influenced_by",
          lit(Double.PositiveInfinity))
          .otherwise(round(log(col("in_deg") + 1) + agePenalty, 6))
          .as("weight"))
  }
}
