package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Etl

/** SURVEY.md §5 end-to-end domain slice — the reference's OWN data
  * contract, not the TPC-H stand-in: paginated SPARQL-result JSON
  * (`{head, results.bindings}` with `{type, value, xml:lang}` cells,
  * extractor.py:150-169 / FIXTURES.md §1.1) through the full
  * flatten → clean → dedup → edges/nodes split chain
  * (transformer.py:91-277), with the DuckDB oracle replaying the SAME
  * chain from the SAME landing files via `read_json` — an independent
  * second implementation over the reference's actual landing shape.
  *
  * The landing fixture is synthesized deterministically (pure function
  * of nothing — identical bytes every run, sf-independent) and carries
  * every dirty-row class FIXTURES.md §1.1 requires the cleaner to
  * handle: unresolved `^Q\d+$` labels, genid URIs that don't strip to a
  * Q-id, empty and absent person cells, exact duplicate triples,
  * reversed A→B/B→A pairs, embedded `\t`/`\n` whitespace, multi-valued
  * person attributes split across rows, and unparseable birth years.
  */
object EtlPack {
  type Q = (SparkSession, String) => DataFrame

  /** Landing dir — sf-independent (fixture content is constant), under
    * the JVM tmpdir so Verify and the DuckDB oracle run on the same
    * files within a round. */
  val landingDir: String =
    s"${sys.props("java.io.tmpdir")}/graft_sparql_v1"

  // ---- fixture synthesis (FIXTURES.md §1.1) -------------------------

  private val ObjTypes = Seq(
    "film", "organization", "educational_institution", "award", "music")

  /** Six-degrees source (P25 — start of the generation-gap spouse
    * chain) and relaxation rounds (the six-degrees motif; the fixture
    * graph's reachable depth is 3). */
  private val SixDegreesSource = 25L
  private val SixDegreesIters  = 6
  /** Relaxation rounds of the pairwise experiment — must EXCEED the
    * fixture graph's undirected diameter so the distances are converged
    * experiment results, not an iteration-cap artifact (the spec pins
    * max_hops strictly below this). */
  private val DegreesExpIters  = 12

  private case class Cell(tpe: String, value: String, lang: Option[String] = None)
  private type Binding = Seq[(String, Cell)]

  private def uri(q: String) = Cell("uri", s"http://www.wikidata.org/entity/$q")
  private def lit2(v: String) = Cell("literal", v)
  private def lab(v: String, lang: String) = Cell("literal", v, Some(lang))

  private def personLabel(i: Int): String =
    if (i == 11) "Person\t11" else if (i == 12) "Person\n12" else s"Person $i"
  private def personLang(i: Int): String = if (i % 6 == 0) "vi" else "en"
  private def personDesc(i: Int): Option[String] =
    if (i % 10 == 0) None
    else if (i == 5) Some("A person number 5 ")   // trailing space → trimmed
    else Some(s"A person number $i")
  private def birthYear(i: Int, rel: String): String =
    if (i % 9 == 0) "unknown"
    else if (i == 5 && rel == "employer") "1906"  // multi-valued → null year
    else (1900 + i).toString
  private def birthPlace(i: Int): Option[String] =
    if (i % 8 == 0) None else Some(s"City ${i % 6}")
  private def country(i: Int, rel: String): String =
    if (i % 7 == 0 && rel == "employer") "Country X" else s"Country ${i % 5}"

  private def objId(j: Int) = s"Q${100 + j}"
  private def objLabel(j: Int): String =
    if (j == 13) "Q113" else s"Object $j"        // unresolved label → dropped
  private def objType(j: Int): String = ObjTypes(j % 5)

  /** One landing row: person i --rel--> object cells. */
  private def edgeRow(i: Int, rel: String,
      oId: String, oLabel: String, oType: String, oDesc: String): Binding = {
    val base = Seq(
      "person" -> uri(s"Q$i"),
      "personLabel" -> lab(personLabel(i), personLang(i)),
      "personType" -> lit2("human"),
      "birthYear" -> lit2(birthYear(i, rel)),
      "countryLabel" -> lit2(country(i, rel)),
      "object" -> Cell("uri", if (oId.startsWith("http")) oId
        else s"http://www.wikidata.org/entity/$oId"),
      "objectLabel" -> lab(oLabel, "en"),
      "objectDescription" -> lit2(oDesc),
      "objectType" -> lit2(oType),
      "relationshipLabel" -> lit2(rel))
    base ++
      personDesc(i).map(d => "personDescription" -> lit2(d)) ++
      birthPlace(i).map(b => "birthPlaceLabel" -> lit2(b))
  }

  private def eduRow(i: Int): Binding = {
    val j = 1 + (i % 20)
    edgeRow(i, "educated_at", objId(j), objLabel(j), objType(j),
      s"An object number $j")
  }
  private def empRow(i: Int): Binding = {
    val j = 1 + ((i * 3) % 20)
    edgeRow(i, "employer", objId(j), objLabel(j), objType(j),
      s"An object number $j")
  }
  private def awardRow(i: Int): Binding = {
    val j = 1 + ((i * 7) % 20)
    edgeRow(i, "award_received", objId(j), objLabel(j), objType(j),
      s"An object number $j")
  }
  private def spouseRow(a: Int, b: Int): Binding =
    edgeRow(a, "spouse", s"Q$b", s"Person $b", "human", s"A person number $b")

  /** The two landing pages, in extractor pagination order. */
  private def pages: Seq[Seq[Binding]] = {
    val genidUri = "http://www.wikidata.org/.well-known/genid/b1a2c3"
    val page0 =
      (1 to 18).map(eduRow) ++ Seq(
        eduRow(1),                                     // exact duplicate triple
        edgeRow(42, "educated_at", objId(1), objLabel(1), objType(1),
          "An object number 1")
          .map { case ("person", _) => "person" -> Cell("uri", genidUri)
                 case kv => kv },                      // genid person → dropped
        edgeRow(200, "educated_at", objId(1), objLabel(1), objType(1),
          "An object number 1")
          .map { case ("personLabel", c) => "personLabel" -> c.copy(value = "Q200")
                 case kv => kv })                      // unresolved person label
    val page1 =
      (19 to 30).map(eduRow) ++
        (1 to 15).map(empRow) ++
        Seq(2, 4, 6, 8, 10).map(awardRow) ++
        Seq(spouseRow(1, 2), spouseRow(3, 4), spouseRow(5, 6), spouseRow(7, 8)) ++
        Seq(
          empRow(2),                                   // duplicate triple
          spouseRow(3, 4),                             // duplicate triple
          spouseRow(2, 1),                             // reversed pair → canonical dedup
          spouseRow(6, 5),                             // reversed pair → canonical dedup
          edgeRow(3, "educated_at", genidUri, "Genid Object", "concept",
            "genid"),                                  // genid object → dropped
          edgeRow(1, "educated_at", objId(1), objLabel(1), objType(1),
            "An object number 1")
            .map { case ("person", _) => "person" -> Cell("uri", "")
                   case kv => kv },                    // empty person → dropped
          edgeRow(1, "educated_at", objId(2), objLabel(2), objType(2),
            "An object number 2")
            .filterNot(_._1 == "person")
            .map { case ("personLabel", c) => "personLabel" -> c.copy(value = "Ghost")
                   case kv => kv },                    // absent person → dropped
          // Weight-model legs (bfs.py:15-90): a >15-year generation-gap
          // spouse pair (1925 vs 1903 → penalty (22−15)/5) and two
          // blacklisted influenced_by edges (cost = ∞).
          spouseRow(25, 3),
          edgeRow(9, "influenced_by", "Q10", "Person 10", "human",
            "A person number 10"),
          edgeRow(20, "influenced_by", "Q21", "Person 21", "human",
            "A person number 21"))
    Seq(page0, page1)
  }

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"
    case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
    case c => c.toString
  }

  private def cellJson(c: Cell): String = {
    val lang = c.lang.map(l => s""", "xml:lang": "${esc(l)}"""").getOrElse("")
    s"""{"type": "${c.tpe}", "value": "${esc(c.value)}"$lang}"""
  }

  private def pageJson(bs: Seq[Binding]): String = {
    val vars = Etl.Vars.map(v => s""""$v"""").mkString(", ")
    val rows = bs.map(b =>
      "  " + b.map { case (k, c) => s""""$k": ${cellJson(c)}""" }
        .mkString("{", ", ", "}")).mkString(",\n")
    s"""{"head": {"vars": [$vars]},\n "results": {"bindings": [\n$rows\n]}}\n"""
  }

  /** Write the landing pages (idempotent — constant bytes). Returns the
    * landing dir. */
  def ensureFixture(): String = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    pages.zipWithIndex.foreach { case (bs, p) =>
      Files.write(dir.resolve(s"page_$p.json"),
        pageJson(bs).getBytes(StandardCharsets.UTF_8))
    }
    landingDir
  }

  /** Occupation side table (transformer.py:141 `_get_person_occupation`
    * twin): deterministic rule on the person index so the oracle can
    * regenerate it with `range()`. */
  def occupations(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 30).map { i =>
      val occ = (i % 3) match {
        case 1 => "writer"; case 2 => "engineer"; case _ => null
      }
      (s"Q$i", occ)
    }.toDF("id", "occupation")
  }

  private def cleaned(s: SparkSession): DataFrame =
    Etl.cleanSparql(Etl.flattenSparql(s, ensureFixture()))

  val queries: Map[String, Q] = Map(
    // S7 on the real landing shape: whole-document pages → one row per
    // binding with `.value` leaves + the xml:lang metadata leaf.
    "etl_sparql_flatten" -> ((s, _) => Etl.flattenSparql(s, ensureFixture())),

    // The full clean chain → the 7-column snake_case edges table
    // (transformer.py:251-269; FIXTURES.md §1.2).
    "etl_sparql_edges" -> ((s, _) => Etl.edges(cleaned(s))),

    // Person∪object node split with keep-first dedup, occupation merge,
    // birth-year coercion, per-type dense pyg_id (transformer.py:139-173;
    // FIXTURES.md §1.3).
    "etl_sparql_nodes" -> ((s, _) => Etl.nodes(cleaned(s), occupations(s))),

    // The reference's edge-cost model over the §5 slice's own outputs
    // (bfs.py:15-90): blacklist → ∞, ln(in_degree+1) hub avoidance,
    // (|Δyear|−15)/5 generation-gap penalty on human-human edges.
    "etl_sparql_weights" -> ((s, _) => {
      val cl = cleaned(s)
      Etl.edgeWeights(Etl.edges(cl), Etl.nodes(cl, occupations(s)))
    }),

    // The reference's SIGNATURE query (§3.2 find_connection,
    // bfs.py:95-117) closing the §5 loop: weighted single-source
    // shortest paths over the graph the ETL chain itself produced —
    // SPARQL JSON → edges/nodes → bfs.py costs → Dijkstra-equivalent
    // BSP — with Q-ids mapped to numeric vertex ids by their own digits
    // (replayable in SQL). The source sits on the generation-gap spouse
    // chain, so path costs exercise the age penalty; ∞ (blacklisted)
    // edges propagate ∞ exactly as igraph treats them; unreached nodes
    // (most of the graph — the disconnected-island motif) drop out.
    "etl_sparql_six_degrees" -> ((s, _) => {
      val cl = cleaned(s)
      val w = Etl.edgeWeights(Etl.edges(cl), Etl.nodes(cl, occupations(s)))
      val e = w.select(
        expr("CAST(substr(person, 2) AS BIGINT)").as("src"),
        expr("CAST(substr(object, 2) AS BIGINT)").as("dst"),
        col("weight").as("w"))
      graft.graph.DFGraphAlgs.shortestPaths(e, SixDegreesSource, SixDegreesIters)
        .filter(col("dist").isNotNull)
        .select(concat(lit("Q"), col("id")).as("id"),
          round(col("dist"), 6).as("dist"))
    }),

    // The six-degrees EXPERIMENT (notebook cells 143-153;
    // analysis_service.py:223-263): pairwise hop distances between
    // persons over the UNDIRECTED graph (the reference passes
    // mode='all', bfs.py:62), all sources advancing in ONE multi-source
    // BSP run instead of the reference's ProcessPool batches. The
    // source list is driver-side by design — the reference samples 10k
    // pairs from millions; here the sample is the (bounded) person set.
    // One summary row: connected unordered person pairs, mean hops,
    // max hops, and the count within six degrees — the published claim.
    "etl_sparql_degrees_exp" -> ((s, _) => {
      val cl = cleaned(s)
      val ed = Etl.edges(cl)
      val persons = Etl.nodes(cl, occupations(s))
        .filter(col("type") === "human")
        .select(expr("CAST(substr(id, 2) AS BIGINT)").as("hid"))
      val sources = persons.collect().map(_.getLong(0)).sorted.toSeq
      val dir = ed.select(
        expr("CAST(substr(person, 2) AS BIGINT)").as("src"),
        expr("CAST(substr(object, 2) AS BIGINT)").as("dst"))
      val und = dir.unionAll(dir.select(col("dst").as("src"), col("src").as("dst")))
        .withColumn("w", lit(1.0))
      val d = graft.graph.DFGraphAlgs
        .multiSourceShortestPaths(und, sources, DegreesExpIters)
      d.join(persons, d("id") === persons("hid"))
        .filter(col("dist").isNotNull && col("s0") < col("id"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("dist").cast("long")).cast("double") / count(lit(1)), 6)
            .as("mean_hops"),
          max(col("dist").cast("long")).as("max_hops"),
          sum((col("dist") <= 6).cast("long")).as("n_within_six"))
    }),

    // The reference's reconciliation counters in one row: stage counts
    // (transformer.py:216-246 print(len(df)) chain), duplicate audits
    // (notebook cells 71-72), and the vcount/ecount checks (cells
    // 122-123): node count == distinct edge endpoints, pyg_id dense.
    "etl_sparql_reconcile" -> ((s, _) => {
      // Driver-side counting is deliberately confined to this one
      // query; the caches exist only for the duration of the six
      // counters and are released before the result frame is returned
      // (a query function must not pin executor memory past its call —
      // the PlanSpec sweep constructs every query).
      val flat = Etl.flattenSparql(s, ensureFixture())
      val cl = Etl.cleanSparql(flat)
      val ed = Etl.edges(cl).cache()
      val no = Etl.nodes(cl, occupations(s)).cache()
      try {
        val nBind = flat.count()
        val nEdges = ed.count()
        val nEdgeDistinct = ed.distinct().count()
        val nNodes = no.count()
        val nEndpoints = ed.select(col("person").as("id"))
          .unionAll(ed.select(col("object").as("id"))).distinct().count()
        val nPygDense = no.groupBy(col("type")).agg(max(col("pyg_id")).as("mx"))
          .agg(sum(col("mx") + 1)).head().getLong(0)
        import s.implicits._
        Seq((nBind, nEdges, nEdgeDistinct, nNodes, nEndpoints, nPygDense))
          .toDF("n_bindings", "n_edges", "n_edge_distinct", "n_nodes",
            "n_endpoint_ids", "n_pyg_dense")
      } finally {
        ed.unpersist(blocking = false)
        no.unpersist(blocking = false)
      }
    })
  )

  // ---- DuckDB oracle: the SAME chain replayed from the SAME landing
  // files via read_json (an independent second implementation). -------

  /** read_json → flatten CTEs (shared by the flatten oracle and the
    * full chain). */
  private def flattenSql: String = {
    val flatCols = Etl.Vars.map(v => s"""b."$v"."value" AS "$v"""").mkString(",\n    ")
    s"""WITH raw AS (
       |  SELECT CAST(regexp_extract(filename, 'page_(\\d+)', 1) AS INT) AS page,
       |         generate_subscripts(results.bindings, 1) AS pos,
       |         unnest(results.bindings) AS b
       |  FROM read_json('$landingDir/page_*.json', filename=true)
       |), flat AS (
       |  SELECT CAST(page AS BIGINT) * 100000 + pos AS ord,
       |    b.personLabel."xml:lang" AS personLang,
       |    $flatCols
       |  FROM raw
       |)""".stripMargin
  }

  /** Shared CTE prefix: read_json → flatten → scrub → id strip →
    * garbage filters → multi-value collapse → triple dedup → canonical
    * back-edge dedup → node build. */
  private def chainSql: String = {
    val scrubCols = Etl.Vars.map(v =>
      s"""trim(regexp_replace("$v", '[\\r\\n\\t]+', ' ', 'g')) AS "$v"""")
      .mkString(",\n    ")
    s"""$flattenSql, scrub AS (
       |  SELECT ord,
       |    $scrubCols
       |  FROM flat
       |), ids AS (
       |  SELECT * REPLACE (string_split(person, '/')[-1] AS person,
       |                    string_split("object", '/')[-1] AS "object")
       |  FROM scrub
       |), filt AS (
       |  SELECT * FROM ids
       |  WHERE COALESCE(regexp_matches(person, '^Q\\d+$$'), FALSE)
       |    AND COALESCE(regexp_matches("object", '^Q\\d+$$'), FALSE)
       |    AND NOT (COALESCE(regexp_matches(personLabel, '^Q\\d+$$'), FALSE)
       |          OR COALESCE(regexp_matches(objectLabel, '^Q\\d+$$'), FALSE))
       |    AND person IS NOT NULL AND person <> ''
       |), coll AS (
       |  SELECT person AS p,
       |    string_agg(DISTINCT countryLabel, ', ' ORDER BY countryLabel) AS countryLabel,
       |    string_agg(DISTINCT birthPlaceLabel, ', ' ORDER BY birthPlaceLabel) AS birthPlaceLabel,
       |    string_agg(DISTINCT birthYear, ', ' ORDER BY birthYear) AS birthYear
       |  FROM filt GROUP BY person
       |), mrg AS (
       |  SELECT f.*, c.countryLabel, c.birthPlaceLabel, c.birthYear
       |  FROM (SELECT * EXCLUDE (countryLabel, birthPlaceLabel, birthYear) FROM filt) f
       |  LEFT JOIN coll c ON f.person = c.p
       |), dd AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY person, relationshipLabel, "object" ORDER BY ord) AS rn
       |    FROM mrg) WHERE rn = 1
       |), canon AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY least(person, "object"), greatest(person, "object"),
       |                   relationshipLabel ORDER BY ord) AS cn
       |    FROM dd) WHERE cn = 1
       |), sides AS (
       |  SELECT person AS id, personLabel AS name, personDescription AS description,
       |         birthYear AS birth_year_raw, countryLabel AS country,
       |         birthPlaceLabel AS birth_place, personType AS type,
       |         0 AS side, ord AS node_ord
       |  FROM canon
       |  UNION ALL
       |  SELECT "object", objectLabel, objectDescription, NULL, NULL, NULL,
       |         objectType, 1, ord
       |  FROM canon
       |), firsts AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY side, node_ord) AS fn
       |    FROM sides) WHERE fn = 1
       |), occ AS (
       |  SELECT 'Q' || i AS id,
       |         CASE i % 3 WHEN 1 THEN 'writer' WHEN 2 THEN 'engineer' END AS occupation
       |  FROM range(1, 31) t(i)
       |), nod AS (
       |  SELECT f.id, f.name, f.description,
       |         TRY_CAST(f.birth_year_raw AS INTEGER) AS birth_year,
       |         f.country, f.birth_place, f.type, o.occupation,
       |         CAST(row_number() OVER (PARTITION BY f.type
       |              ORDER BY f.side, f.node_ord) - 1 AS BIGINT) AS pyg_id
       |  FROM firsts f LEFT JOIN occ o ON f.id = o.id
       |)""".stripMargin
  }

  /** chainSql extended with the bfs.py edge-cost CTEs: `wts` carries
    * (person, object, relationship_label, in_deg, weight). */
  private def weightsChainSql: String =
    s"""$chainSql,
       |edg AS (SELECT person, relationshipLabel AS relationship_label,
       |    "object" FROM canon),
       |ind AS (SELECT "object" AS d, COUNT(*) AS in_deg
       |  FROM edg GROUP BY "object"),
       |wts AS (SELECT e.person, e."object", e.relationship_label, i.in_deg,
       |  CASE WHEN e.relationship_label = 'influenced_by'
       |       THEN CAST('infinity' AS DOUBLE)
       |       ELSE round(ln(i.in_deg + 1) +
       |         CASE WHEN sn.type = 'human' AND dn.type = 'human'
       |              AND sn.birth_year IS NOT NULL
       |              AND dn.birth_year IS NOT NULL
       |              AND sn.birth_year > 1000 AND dn.birth_year > 1000
       |              AND abs(sn.birth_year - dn.birth_year) > 15
       |           THEN (abs(sn.birth_year - dn.birth_year) - 15) / 5.0
       |           ELSE 0.0 END, 6)
       |  END AS weight
       |  FROM edg e
       |  JOIN ind i ON i.d = e."object"
       |  JOIN nod sn ON sn.id = e.person
       |  JOIN nod dn ON dn.id = e."object")""".stripMargin

  val oracle: Map[String, String] = Map(
    "etl_sparql_flatten" -> {
      val cols = Etl.Vars.map(v => s""""$v"""").mkString(", ")
      s"""$flattenSql
         |SELECT ord, personLang, $cols FROM flat""".stripMargin
    },

    "etl_sparql_edges" ->
      s"""$chainSql
         |SELECT person, personLabel AS person_label, personType AS person_type,
         |       relationshipLabel AS relationship_label,
         |       "object", objectLabel AS object_label, objectType AS object_type
         |FROM canon""".stripMargin,

    "etl_sparql_nodes" ->
      s"""$chainSql
         |SELECT id, name, description, birth_year, country, birth_place,
         |       type, occupation, pyg_id
         |FROM nod""".stripMargin,

    "etl_sparql_weights" ->
      s"""$weightsChainSql
         |SELECT person, "object", relationship_label, in_deg, weight
         |FROM wts""".stripMargin,

    // Bellman-Ford over the weighted ETL graph, unrolled to
    // SixDegreesIters relaxation rounds — the same recurrence the Spark
    // BSP runs, double arithmetic and all (each path sums left to
    // right in both engines; ∞ edges propagate ∞ distances).
    "etl_sparql_six_degrees" -> {
      val iters = (1 to SixDegreesIters).map { k =>
        s"""p$k AS MATERIALIZED (SELECT d.id, least(d.dist, r.reach) AS dist
           |  FROM p${k - 1} d LEFT JOIN (
           |    SELECT e.dst AS id, MIN(p.dist + e.w) AS reach
           |    FROM wedges e JOIN p${k - 1} p ON p.id = e.src AND p.dist IS NOT NULL
           |    GROUP BY e.dst) r ON r.id = d.id)""".stripMargin
      }.mkString(",\n")
      s"""$weightsChainSql,
         |wedges AS (SELECT CAST(substr(person, 2) AS BIGINT) AS src,
         |    CAST(substr("object", 2) AS BIGINT) AS dst, weight AS w FROM wts),
         |vx AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM wedges UNION ALL SELECT dst FROM wedges)),
         |p0 AS (SELECT id,
         |  CAST(CASE WHEN id = $SixDegreesSource THEN 0.0 END AS DOUBLE) AS dist
         |  FROM vx),
         |$iters
         |SELECT 'Q' || id AS id, round(dist, 6) AS dist
         |FROM p$SixDegreesIters WHERE dist IS NOT NULL""".stripMargin
    },

    // Multi-source Bellman-Ford over the symmetrized (mode='all') hop
    // graph, unrolled — identical recurrence to the Spark BSP, state
    // keyed by (source, vertex).
    "etl_sparql_degrees_exp" -> {
      val iters = (1 to DegreesExpIters).map { k =>
        s"""m$k AS MATERIALIZED (SELECT d.s0, d.id, least(d.dist, r.reach) AS dist
           |  FROM m${k - 1} d LEFT JOIN (
           |    SELECT p.s0, e.dst AS id, MIN(p.dist + 1.0) AS reach
           |    FROM und e JOIN m${k - 1} p ON p.id = e.src AND p.dist IS NOT NULL
           |    GROUP BY p.s0, e.dst) r ON r.s0 = d.s0 AND r.id = d.id)""".stripMargin
      }.mkString(",\n")
      s"""$chainSql,
         |und AS (SELECT CAST(substr(person, 2) AS BIGINT) AS src,
         |    CAST(substr("object", 2) AS BIGINT) AS dst FROM canon
         |  UNION ALL SELECT CAST(substr("object", 2) AS BIGINT),
         |    CAST(substr(person, 2) AS BIGINT) FROM canon),
         |hum AS (SELECT CAST(substr(id, 2) AS BIGINT) AS hid
         |  FROM nod WHERE type = 'human'),
         |vx2 AS (SELECT DISTINCT src AS id FROM und),
         |m0 AS (SELECT h.hid AS s0, v.id,
         |  CAST(CASE WHEN v.id = h.hid THEN 0.0 END AS DOUBLE) AS dist
         |  FROM hum h CROSS JOIN vx2 v),
         |$iters
         |SELECT COUNT(*) AS n_pairs,
         |  round(CAST(SUM(CAST(dist AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
         |    AS mean_hops,
         |  MAX(CAST(dist AS BIGINT)) AS max_hops,
         |  CAST(SUM(CASE WHEN dist <= 6 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_within_six
         |FROM m$DegreesExpIters m JOIN hum t ON t.hid = m.id
         |WHERE dist IS NOT NULL AND s0 < id""".stripMargin
    },

    "etl_sparql_reconcile" ->
      s"""$chainSql
         |SELECT (SELECT COUNT(*) FROM flat) AS n_bindings,
         |       (SELECT COUNT(*) FROM canon) AS n_edges,
         |       (SELECT COUNT(*) FROM (
         |          SELECT DISTINCT person, personLabel, personType,
         |                 relationshipLabel, "object", objectLabel, objectType
         |          FROM canon)) AS n_edge_distinct,
         |       (SELECT COUNT(*) FROM firsts) AS n_nodes,
         |       (SELECT COUNT(DISTINCT id) FROM (
         |          SELECT person AS id FROM canon
         |          UNION ALL SELECT "object" FROM canon)) AS n_endpoint_ids,
         |       (SELECT CAST(SUM(mx + 1) AS BIGINT) FROM (
         |          SELECT type, MAX(pyg_id) AS mx FROM nod GROUP BY type))
         |         AS n_pyg_dense""".stripMargin
  )
}
