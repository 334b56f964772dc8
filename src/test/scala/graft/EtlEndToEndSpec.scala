package graft

import org.apache.spark.graphx.{Edge => GXEdge, Graph => GXGraph}
import org.apache.spark.sql.functions._
import graft.api.Etl
import graft.ops.EtlPack

/** SURVEY.md §5 end-to-end domain slice: the reference's own landing
  * contract (SPARQL-result JSON, FIXTURES.md §1.1) through
  * flatten → clean → dedup → edges/nodes split → graph build, asserting
  * the reference's reconciliation checks:
  *  - stage garbage counters (transformer.py:216-246 print chain),
  *  - duplicate audits == 0 (notebook cells 71-72),
  *  - FIXTURES.md §1.2 edge invariants (id shape, no triple dups, no
  *    canonical dups),
  *  - vcount()==len(nodes), ecount()==len(edges) after graph build
  *    (notebook cells 122-123),
  *  - dense per-type pyg_id (transformer.py:173).
  */
class EtlEndToEndSpec extends SparkSpec {

  private lazy val flat = Etl.flattenSparql(spark, EtlPack.ensureFixture()).cache()
  private lazy val cleaned = Etl.cleanSparql(flat).cache()
  private lazy val edges = Etl.edges(cleaned).cache()
  private lazy val nodes = Etl.nodes(cleaned, EtlPack.occupations(spark)).cache()

  test("flatten: one row per binding, metadata leaves reachable") {
    assert(flat.count() === 68)
    // xml:lang leaf survives flattening (dropped later by the cleaner)
    val langs = flat.groupBy("personLang").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(langs.contains("en") && langs.contains("vi"))
    // absent vars land as null, not errors (the absent-person dirty row)
    assert(flat.filter(col("person").isNull).count() === 1)
  }

  test("clean chain drops exactly the planted dirty rows, stage by stage") {
    // 68 bindings − 5 planted garbage rows − 3 unresolved-object rows
    // (P12's and P4's Q113-label rows plus the collapse-order probe)
    val filtered = 68 - 8
    // − 3 exact duplicate triples − 2 reversed pairs
    assert(cleaned.count() === filtered - 3 - 2)
    assert(edges.count() === 55)
  }

  test("edges invariants (FIXTURES.md §1.2)") {
    assert(edges.distinct().count() === 55)                 // no whole-row dups
    assert(edges.select("person", "relationship_label", "object")
      .distinct().count() === 55)                           // no triple dups
    assert(edges.select(least(col("person"), col("object")),
      greatest(col("person"), col("object")), col("relationship_label"))
      .distinct().count() === 55)                           // no canonical dups
    assert(edges.filter(!col("person").rlike("^Q\\d+$") ||
      !col("object").rlike("^Q\\d+$")).count() === 0)       // id shape
    assert(edges.filter(col("person_label").rlike("^Q\\d+$") ||
      col("object_label").rlike("^Q\\d+$")).count() === 0)  // labels resolved
    // whitespace dirt scrubbed: the \t / \n labels became single spaces
    val p11 = edges.filter(col("person") === "Q11")
      .select("person_label").head().getString(0)
    assert(p11 === "Person 11")
  }

  test("nodes: keep-first union, coercion, collapse, occupation merge") {
    assert(nodes.count() === 49)
    assert(nodes.select("id").distinct().count() === 49)
    val byId = nodes.collect().map(r => r.getString(0) -> r).toMap
    // multi-valued collapse, sorted distinct join (P7 has two countries)
    // PLUS the collapse-order probe: "Country Z" rides a row the
    // garbage filters drop (unresolved object label), but the collapse
    // runs BEFORE the filters (transformer.py:197-213), so it must
    // still reach P7's attribute set.
    assert(byId("Q7").getString(4) === "Country 2, Country X, Country Z")
    // multi-valued birth year coerces to null (P5: 1905 + 1906)
    assert(byId("Q5").isNullAt(3))
    // unparseable year → null (P9: "unknown"), clean year parses
    assert(byId("Q9").isNullAt(3) && byId("Q1").getInt(3) === 1901)
    // occupation side-merge rule: i%3==1 writer, ==2 engineer, ==0 null
    assert(byId("Q1").getString(7) === "writer")
    assert(byId("Q2").getString(7) === "engineer")
    assert(byId("Q3").isNullAt(7))
    // spouse targets stay typed from their person-side first occurrence
    assert(byId("Q2").getString(6) === "human")
    // trailing-space description trimmed (P5)
    assert(byId("Q5").getString(2) === "A person number 5")
  }

  test("per-type pyg_id is dense 0..n-1 in landing order") {
    val perType = nodes.groupBy("type").agg(
      count(lit(1)).as("n"), min("pyg_id").as("lo"), max("pyg_id").as("hi"),
      countDistinct("pyg_id").as("nd")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expected = Map("human" -> 30L, "film" -> 4L, "organization" -> 4L,
      "educational_institution" -> 4L, "award" -> 3L, "music" -> 4L)
    assert(perType.view.mapValues(_._1).toMap === expected)
    perType.values.foreach { case (n, lo, hi, nd) =>
      assert(lo === 0L && hi === n - 1 && nd === n)
    }
    // landing order: P1 first; P12 LAST — its page-0 educated_at row was
    // dropped (unresolved O113 label), so its first surviving occurrence
    // is the page-1 employer row, after P19..P30's educated_at rows.
    val pyg = nodes.filter(col("type") === "human")
      .select("id", "pyg_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pyg("Q1") === 0L && pyg("Q18") === 16L &&
      pyg("Q30") === 28L && pyg("Q12") === 29L)
  }

  test("edge-cost model (bfs.py:15-90): blacklist ∞, hub base, generation gap") {
    val w = Etl.edgeWeights(edges, nodes).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(w.size === 55, "one cost row per edge")
    // blacklisted relations are impassable
    assert(w(("Q9", "Q10", "influenced_by"))._2.isPosInfinity)
    assert(w(("Q20", "Q21", "influenced_by"))._2.isPosInfinity)
    // generation gap: P25 (1925) → P3 (1903), Δ22 → ln(deg+1) + (22−15)/5
    val (d3, w3) = w(("Q25", "Q3", "spouse"))
    assert(w3 === math.round((math.log(d3 + 1.0) + 1.4) * 1e6) / 1e6)
    // same-generation spouse carries only the hub base cost
    val (d2, w2) = w(("Q1", "Q2", "spouse"))
    assert(w2 === math.round(math.log(d2 + 1.0) * 1e6) / 1e6)
    // a null-year endpoint (P5's multi-valued year coerced to null)
    // disables the penalty, not the edge
    val (d6, w6) = w(("Q5", "Q6", "spouse"))
    assert(!w6.isInfinity && w6 === math.round(math.log(d6 + 1.0) * 1e6) / 1e6)
  }

  test("six-degrees path query over the slice's own graph (find_connection twin)") {
    // The §3.2 signature query on §5's outputs: weighted SSSP from P25,
    // UNDIRECTED (igraph mode='all', bfs.py:108 — each edge passable in
    // both directions at the same cost). Hand-derived goldens — e.g.
    // dist(Q3) = ln(indeg+1) + (22−15)/5 = ln 2 + 1.4 over the
    // generation-gap spouse edge, dist(Q106) = ln 4 (P25's educated_at
    // object, in-degree 3, reached forward).
    val got = graft.ops.EtlPack.queries("etl_sparql_six_degrees")(spark, "")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.size === 41, "mode='all' reach: 41 of the 49 nodes")
    assert(got("Q25") === 0.0)
    assert(got("Q106") === math.round(math.log(4) * 1e6) / 1e6)
    assert(got("Q3") === math.round((math.log(2) + 1.4) * 1e6) / 1e6)
    assert(got("Q4") === math.round((math.log(2) + 1.4 + math.log(2)) * 1e6) / 1e6)
    // Blacklisted influenced_by edges propagate ∞ exactly as igraph
    // treats them: nodes reachable ONLY over a blacklisted edge carry
    // dist = ∞, not absence.
    assert(got.filter(_._2.isPosInfinity).keySet ===
      Set("Q10", "Q20", "Q30", "Q101", "Q111"))
  }

  test("six-degrees SSSP is converged, not an iteration-cap artifact") {
    // Re-run the identical symmetrized weighted BSP at 8 and 11 rounds
    // directly and assert a fixed point (the query pins 8).
    val w = Etl.edgeWeights(edges, nodes)
    val e = w.select(
      expr("CAST(substr(person, 2) AS BIGINT)").as("src"),
      expr("CAST(substr(object, 2) AS BIGINT)").as("dst"),
      col("weight").as("w"))
    val sym = e.unionAll(
      e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    def run(k: Int): Map[Long, Double] =
      graft.graph.DFGraphAlgs.shortestPaths(sym, 25L, k)
        .filter(col("dist").isNotNull).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(8) === run(11))
  }

  test("six-degrees experiment: converged distances, the published claim holds") {
    // notebook cells 143-153 / analysis_service.py:223-263 — pairwise
    // undirected hop distances between SAMPLED persons, one multi-source
    // BSP. At this corpus size the congruential gate's divisor is
    // D = max(1, 30 div 142) = 1, so every person is sampled and the
    // published-claim numbers cover all pairs (InvariantSpec pins the
    // rule's behavior at larger corpus sizes).
    val r = graft.ops.EtlPack.queries("etl_sparql_degrees_exp")(spark, "").head()
    val (nPairs, mean, maxHops, within6) =
      (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))
    assert(nPairs === 328L && maxHops === 11L && within6 === 253L)
    assert(math.abs(mean - 4.978659) < 1e-9)
    // Convergence, not an iteration-cap artifact: the max observed hop
    // count sits strictly below the relaxation rounds (verified stable
    // from 12 through 16 rounds when pinned).
    assert(maxHops < 12)
  }

  test("sf-scaled landing: replicas are isomorphic islands; goldens scale-invariant") {
    // The scale-2 fixture is two id-shifted copies of the replica-0
    // motif (stride 1000): every chain count doubles exactly, and the
    // six-degrees reachable set — entirely inside replica 0 — is
    // byte-identical, because the islands are disjoint.
    val flat2 = Etl.flattenSparql(spark, EtlPack.ensureFixture(2))
    assert(flat2.count() === 2 * 68)
    val cl2 = Etl.cleanSparql(flat2)
    val ed2 = Etl.edges(cl2)
    val no2 = Etl.nodes(cl2, EtlPack.occupations(spark, 2))
    assert(ed2.count() === 2 * 55 && no2.count() === 2 * 49)
    // replica 1's persons sit at Q1001.., its objects at Q1101..
    assert(no2.filter(col("id") === "Q1007").select("country").head().getString(0)
      === "Country 2, Country X, Country Z")
    val w2 = Etl.edgeWeights(ed2, no2)
    val e2 = w2.select(
      expr("CAST(substr(person, 2) AS BIGINT)").as("src"),
      expr("CAST(substr(object, 2) AS BIGINT)").as("dst"),
      col("weight").as("w"))
    val sym2 = e2.unionAll(
      e2.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val got2 = graft.graph.DFGraphAlgs.shortestPaths(sym2, 25L, 8)
      .filter(col("dist").isNotNull).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got2.size === 41 && got2.keys.forall(_ < 1000),
      "P25's reach never leaves replica 0")
  }

  test("graph build reconciliation: vcount==len(nodes), ecount==len(edges)") {
    // igraph-build twin (transformer.py:335; notebook cells 122-123):
    // vertex ids = first-occurrence node order, edges joined to them.
    val vids = nodes.select(col("id"), col("pyg_id"), col("type"))
      .withColumn("vid", hash(col("id")).cast("long"))
    val vRdd = vids.select("vid", "id").rdd
      .map(r => (r.getLong(0), r.getString(1)))
    val eRdd = edges
      .join(vids.select(col("id").as("person"), col("vid").as("src")), "person")
      .join(vids.select(col("id").as("object"), col("vid").as("dst")), "object")
      .select("src", "dst", "relationship_label").rdd
      .map(r => GXEdge(r.getLong(0), r.getLong(1), r.getString(2)))
    val g = GXGraph(vRdd, eRdd)
    assert(g.numVertices === nodes.count())
    assert(g.numEdges === edges.count())
    // every edge endpoint resolved to a node (no dangling vertices added)
    val endpointIds = edges.select(col("person").as("id"))
      .unionAll(edges.select(col("object").as("id"))).distinct().count()
    assert(endpointIds === nodes.count())
  }
}
