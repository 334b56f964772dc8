package graft

import org.apache.spark.sql.functions._
import graft.graph.{DFGraphAlgs, GraphAlgs}

/** Micro-graph goldens for the graph algorithms (SURVEY.md §5: the
  * reference has no tests; Pregel-style ops are not DuckDB-expressible
  * beyond the unrolled oracles, so hand-computed goldens pin semantics)
  * plus DataFrame-vs-GraphX agreement.
  *
  * Micro graph (undirected, as symmetric directed edges):
  *   1 -- 2 (w 1.0)   2 -- 3 (w 2.0)   1 -- 3 (w 4.0)   3 -- 4 (w 1.0)
  *   5 isolated-ish: 5 -- 6 (w 1.0)  (disconnected from 1-4)
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val undirected = Seq(
    (1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 4.0), (3L, 4L, 1.0), (5L, 6L, 1.0))
  private def edgeDF = {
    val fwd = undirected.toDF("src", "dst", "w")
    fwd.union(fwd.select($"dst".as("src"), $"src".as("dst"), $"w"))
  }

  test("fixed-point early exit: converged loops stop early and return the full-iters result") {
    // Path 1-2-3-4 (diameter 3): every monotone loop reaches its fixed
    // point within ≤ 4 rounds, so a 40-round request must (a) return the
    // frame the full 40-round unrolling would — the recurrences are
    // deterministic, a fixed point is absorbing — and (b) actually stop:
    // lastRoundsRun counts executed rounds (convergence round + the one
    // confirming no-change round).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val sym = path.union(path.select($"dst".as("src"), $"src".as("dst")))
      .withColumn("w", lit(1.0))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.toList).toSet

    val cc4 = m(DFGraphAlgs.connectedComponents(sym, 4))
    val cc40 = m(DFGraphAlgs.connectedComponents(sym, 40))
    assert(cc40 === cc4)
    assert(DFGraphAlgs.lastRoundsRun.get() <= 5,
      s"CC ran ${DFGraphAlgs.lastRoundsRun.get()} of 40 rounds")

    val sp6 = m(DFGraphAlgs.shortestPaths(sym, 1L, 6))
    val sp40 = m(DFGraphAlgs.shortestPaths(sym, 1L, 40))
    assert(sp40 === sp6)
    assert(DFGraphAlgs.lastRoundsRun.get() <= 5)

    val ms = m(DFGraphAlgs.multiSourceShortestPaths(sym, Seq(1L, 4L), 40))
    assert(ms === m(DFGraphAlgs.multiSourceShortestPaths(sym, Seq(1L, 4L), 6)))
    assert(DFGraphAlgs.lastRoundsRun.get() <= 5)

    val pp = m(DFGraphAlgs.shortestPathsWithPred(sym, 1L, 40))
    assert(pp === m(DFGraphAlgs.shortestPathsWithPred(sym, 1L, 6)))
    assert(DFGraphAlgs.lastRoundsRun.get() <= 5)

    val lp = m(DFGraphAlgs.labelPropagation(sym, 40))
    assert(lp === m(DFGraphAlgs.labelPropagation(sym, 6)))
    assert(DFGraphAlgs.lastRoundsRun.get() <= 7)

    // kcore: k=2 peels the whole path (cascade 1,4 → then 2,3 → empty);
    // the empty fixed point must stop the loop.
    val core = DFGraphAlgs.kcore(sym, 2, 40)
    assert(core.count() === 0L)
    assert(DFGraphAlgs.lastRoundsRun.get() <= 4)
  }

  test("early-exit probes leave the SparkSession task-serializable") {
    // Regression pin: the first cut of the convergence probe used the
    // Observation() helper, which lazily instantiates the session's
    // ObservationManager — a non-Serializable field of
    // classic.SparkSession. Any LATER task closure that transitively
    // captures the session (ml_train_eval's logistic model carries its
    // training summary, which holds the session; the predict UDF
    // captures the model) then fails with "Task not serializable" — the
    // full r14 bench lost ml_train_eval to exactly this after a BSP
    // query had run first. The named-observe form reads the metric from
    // the executed plan and must create no session state: serializing
    // the session after an early-exit loop has run must still succeed.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val sym = path.union(path.select($"dst".as("src"), $"src".as("dst")))
      .withColumn("w", lit(1.0))
    DFGraphAlgs.connectedComponents(sym, 8).collect()
    DFGraphAlgs.kcore(sym, 2, 8).count()
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(spark)
    assert(bos.size() > 0)
  }

  test("triangleCount: hand-golden + agreement with GraphX TriangleCount") {
    // Canonical x<y edges: triangle 1-2-3, pendant 3-4, island 5-6, plus
    // a second triangle 2-3-4 sharing edge (2,3).
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (5L, 6L))
      .toDF("x", "y")
    val n = DFGraphAlgs.triangleCount(pairs).head().getLong(0)
    assert(n == 2L, s"expected triangles {1,2,3} and {2,3,4}, got $n")
    // GraphX twin: triangleCount() counts per vertex; each triangle is
    // seen by its 3 vertices.
    val sym = pairs.select($"x".as("src"), $"y".as("dst"), lit(1.0).as("w"))
    val g = GraphAlgs.fromEdgeDF(
      sym.union(sym.select($"dst".as("src"), $"src".as("dst"), $"w")))
    val gx = g.partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.map(_._2.toLong).sum() / 3
    assert(gx.toLong == n, s"GraphX twin disagrees: $gx vs $n")
  }

  test("localClusteringCoeff: hand-golden on the two-triangle micro graph") {
    // Same canonical pairs as the triangle golden: triangles {1,2,3} and
    // {2,3,4} share edge (2,3); 5-6 is an isolated edge (deg 1 — excluded).
    // deg: 1→2, 2→3, 3→3, 4→2; tri: 1→1, 2→2, 3→2, 4→1.
    // lcc: 1→1.0, 2→2·2/(3·2)=0.666667, 3→0.666667, 4→1.0.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (5L, 6L))
      .toDF("x", "y")
    val got = DFGraphAlgs.localClusteringCoeff(pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((3L, 2L, 0.666667)),
      3L -> ((3L, 2L, 0.666667)), 4L -> ((2L, 1L, 1.0))), s"got $got")
  }

  test("localClusteringCoeff per-vertex triangles agree with GraphX") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L), (5L, 6L))
      .toDF("x", "y")
    val ours = DFGraphAlgs.localClusteringCoeff(pairs)
      .select($"v", $"n_tri").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sym = pairs.select($"x".as("src"), $"y".as("dst"), lit(1.0).as("w"))
    val g = GraphAlgs.fromEdgeDF(
      sym.union(sym.select($"dst".as("src"), $"src".as("dst"), $"w")))
    val gx = g.partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
      .triangleCount().vertices.collect().toMap
    ours.foreach { case (v, n) =>
      assert(gx(v).toLong == n, s"vertex $v: GraphX ${gx(v)} vs ours $n")
    }
  }

  test("labelPropagation: two cliques joined by a bridge form two communities") {
    // Cliques {1,2,3} and {10,11,12} with bridge 3-10. With the
    // deterministic smallest-label tie-break, three rounds settle on
    // label 1 for the first clique and label 3 for the second (hand-
    // traced: the bridge pulls 10's label down via 3, then the clique
    // majority overrides the bridge).
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val fwd = pairs.toDF("src", "dst")
    val sym = fwd.union(fwd.select($"dst".as("src"), $"src".as("dst")))
    val got = DFGraphAlgs.labelPropagation(sym, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), s"got $got")
  }

  test("kcore: peel drops the pendant, keeps the triangle, cascades") {
    // Triangle 1-2-3 with chain 3-4-5: round 1 drops 5 (deg 1), round 2
    // drops 4 (deg fell to 1) — the cascade fixed-round peeling models.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("x", "y")
    val sym = pairs.select($"x".as("src"), $"y".as("dst"))
      .union(pairs.select($"y".as("src"), $"x".as("dst")))
    val after1 = DFGraphAlgs.kcore(sym, 2, 1)
      .select($"src").distinct().as[Long].collect().toSet
    assert(after1 == Set(1L, 2L, 3L, 4L), s"round 1 must drop only 5: $after1")
    val core = DFGraphAlgs.kcore(sym, 2, 2)
      .select($"src").distinct().as[Long].collect().toSet
    assert(core == Set(1L, 2L, 3L), s"round 2 must cascade 4 out: $core")
  }

  test("BSP rounds run through RELIABLE checkpoint when opted in") {
    // Cluster-lifetime knob: with spark.graft.reliableCheckpoint=true and
    // a checkpoint dir set, mat() writes through checkpoint() (survives
    // executor loss) instead of localCheckpoint — results identical.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(DFGraphAlgs.ReliableCheckpointConf, "true")
    try {
      val got = DFGraphAlgs.shortestPaths(edgeDF, 1L, 3)
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      assert(got(2L).contains(1.0) && got(3L).contains(3.0))
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty,
        "reliable checkpoint must write to the checkpoint dir")
    } finally spark.conf.unset(DFGraphAlgs.ReliableCheckpointConf)
  }

  test("shortestPaths: hand-computed weighted distances from vertex 1") {
    val got = DFGraphAlgs.shortestPaths(edgeDF, 1L, 6)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    // 1->2 = 1; 1->3 = min(4, 1+2) = 3; 1->4 = 3+1 = 4; 5,6 unreachable
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(1.0))
    assert(got(3L).contains(3.0))
    assert(got(4L).contains(4.0))
    assert(got(5L).isEmpty && got(6L).isEmpty)
  }

  test("composite-key pageRankByRel equals per-relation pageRank runs") {
    val relEdges = Seq(
      ("x", 1L, 2L), ("x", 2L, 1L), ("x", 2L, 3L), ("x", 3L, 2L),
      ("y", 1L, 2L), ("y", 2L, 3L), ("y", 3L, 1L))
      .toDF("rel", "src", "dst")
    val multi = DFGraphAlgs.pageRankByRel(relEdges, 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Seq("x", "y").foreach { rel =>
      val single = DFGraphAlgs.pageRank(relEdges.filter($"rel" === rel), 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val mine = multi.collect { case ((rr, id), v) if rr == rel => id -> v }.toMap
      assert(mine == single, s"relation $rel diverged")
    }
  }

  test("hub-salted shuffle rounds give identical distances (single and multi source)") {
    // VERDICT r8 stretch: force the shuffle path (broadcast limit 0) with
    // every key salted (target degree 1, fanout = min(deg, 32)) — the
    // skew-spreading shape a power-law hub needs at the reference's
    // scale — and require bit-identical distances to the default path.
    val baselineSingle = DFGraphAlgs.shortestPaths(edgeDF, 1L, 6)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    val baselineMulti = DFGraphAlgs.multiSourceShortestPaths(edgeDF, Seq(1L, 3L, 5L), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set(DFGraphAlgs.StateBroadcastLimitConf, "0")
    spark.conf.set(DFGraphAlgs.SaltTargetDegConf, "1")
    try {
      val salted = DFGraphAlgs.shortestPaths(edgeDF, 1L, 6)
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
        .toMap
      assert(salted == baselineSingle, "salted single-source diverged")
      val saltedMulti = DFGraphAlgs.multiSourceShortestPaths(edgeDF, Seq(1L, 3L, 5L), 6)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(saltedMulti == baselineMulti, "salted multi-source diverged")
    } finally {
      spark.conf.unset(DFGraphAlgs.StateBroadcastLimitConf)
      spark.conf.unset(DFGraphAlgs.SaltTargetDegConf)
    }
  }

  test("salting preserves components, predecessors, and LPA labels too") {
    // The same relaxation-join shape lives in connectedComponents,
    // shortestPathsWithPred, and labelPropagation — forced full salting
    // must leave all three bit-identical (incl. the pred forest's
    // deterministic tie-break and LPA's smallest-label tie-break).
    val sym = edgeDF.select($"src", $"dst")
      .union(edgeDF.select($"dst".as("src"), $"src".as("dst")))
    def all(): (Map[Long, Long], Map[Long, (Option[Double], Option[Long])], Map[Long, Long]) = {
      val cc = DFGraphAlgs.connectedComponents(sym, 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val pred = DFGraphAlgs.shortestPathsWithPred(edgeDF, 1L, 6)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Double]),
            Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
      val lpa = DFGraphAlgs.labelPropagation(sym, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (cc, pred, lpa)
    }
    val base = all()
    spark.conf.set(DFGraphAlgs.StateBroadcastLimitConf, "0")
    spark.conf.set(DFGraphAlgs.SaltTargetDegConf, "1")
    try assert(all() === base)
    finally {
      spark.conf.unset(DFGraphAlgs.StateBroadcastLimitConf)
      spark.conf.unset(DFGraphAlgs.SaltTargetDegConf)
    }
  }

  test("salting preserves the PageRank family bit-for-bit") {
    // The contribution join in pageRank / pageRankByRel /
    // personalizedPageRank carries the same hub exposure as the
    // relaxation joins; forced full salting must leave all three
    // identical — the message sum is a decimal aggregate, so even the
    // double ranks are bit-exact, not merely close.
    val relEdges = Seq(
      ("x", 1L, 2L), ("x", 2L, 1L), ("x", 2L, 3L), ("x", 3L, 2L),
      ("y", 1L, 2L), ("y", 2L, 3L), ("y", 3L, 1L))
      .toDF("rel", "src", "dst")
    val seeds = Seq(1L, 4L).toDF("seed")
    def all(): (Map[Long, Double], Map[(String, Long), Double], Map[(Long, Long), Double]) = {
      val pr = DFGraphAlgs.pageRank(edgeDF, 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val byRel = DFGraphAlgs.pageRankByRel(relEdges, 4)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ppr = DFGraphAlgs.personalizedPageRank(edgeDF, seeds, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      (pr, byRel, ppr)
    }
    val base = all()
    spark.conf.set(DFGraphAlgs.StateBroadcastLimitConf, "0")
    spark.conf.set(DFGraphAlgs.SaltTargetDegConf, "1")
    try assert(all() === base)
    finally {
      spark.conf.unset(DFGraphAlgs.StateBroadcastLimitConf)
      spark.conf.unset(DFGraphAlgs.SaltTargetDegConf)
    }
  }

  test("multiSourceShortestPaths agrees with per-source shortestPaths") {
    val sources = Seq(1L, 3L, 5L)
    val multi = DFGraphAlgs.multiSourceShortestPaths(edgeDF, sources, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    sources.foreach { s0 =>
      val single = DFGraphAlgs.shortestPaths(edgeDF, s0, 6)
        .filter($"dist".isNotNull)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val mine = multi.collect { case ((s, id), dd) if s == s0 => id -> dd }.toMap
      assert(mine == single, s"source $s0: $mine != $single")
    }
  }

  test("BFS hops: w=1 shortestPaths gives hop counts") {
    val got = DFGraphAlgs.shortestPaths(edgeDF.withColumn("w", lit(1.0)), 1L, 6)
      .filter($"dist".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 1.0, 4L -> 2.0))
  }

  test("pageRank: symmetric 2-cycle converges to rank 1 per vertex") {
    // On 5--6 (symmetric pair), outdeg=1 each: rank stays exactly 1.0.
    val pair = Seq((5L, 6L), (6L, 5L)).toDF("src", "dst")
    val got = DFGraphAlgs.pageRank(pair, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(5L) === 1.0 && got(6L) === 1.0)
  }

  test("pageRank: ranks sum to n when graph has no dangling mass loss") {
    val got = DFGraphAlgs.pageRank(edgeDF, 5)
    val total = got.agg(sum($"rank")).collect()(0).getDouble(0)
    // Symmetric graph: every vertex has outdeg >= 1, total mass preserved.
    assert(math.abs(total - 6.0) < 1e-9)
  }

  test("GraphX Pregel SSSP agrees with DataFrame shortestPaths") {
    val g = GraphAlgs.fromEdgeDF(edgeDF)
    val gx = GraphAlgs.sssp(g, 1L, 6).filter(_._2 < Double.PositiveInfinity)
      .collect().toMap
    val df = DFGraphAlgs.shortestPaths(edgeDF, 1L, 6).filter($"dist".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gx == df)
  }

  test("GraphX pageRank agrees with DataFrame pageRank") {
    val g = GraphAlgs.fromEdgeDF(edgeDF)
    val gx = GraphAlgs.pageRank(g, 5).collect().toMap
    val df = DFGraphAlgs.pageRank(edgeDF, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gx.keySet == df.keySet)
    gx.foreach { case (id, r) => assert(math.abs(r - df(id)) < 1e-9, s"vertex $id") }
  }

  test("GraphX BFS agrees with DataFrame hop counts") {
    val g = GraphAlgs.fromEdgeDF(edgeDF)
    val gx = GraphAlgs.bfs(g, 1L, 6).collect().toMap
    val df = DFGraphAlgs.shortestPaths(edgeDF.withColumn("w", lit(1.0)), 1L, 6)
      .filter($"dist".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getDouble(1).toInt).toMap
    assert(gx == df)
  }

  test("betweennessDeltas: hand-computed Brandes on a path and a diamond") {
    import spark.implicits._
    def bc(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Double] = {
      val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
      DFGraphAlgs.betweennessDeltas(sym, sources, 6)
        .filter($"id" =!= $"s0")
        .groupBy($"id").agg(org.apache.spark.sql.functions.sum($"delta").as("b"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    // Path 1-2-3-4-5, all sources: delta sums count ordered (s, t) pairs
    // whose shortest path passes v as an intermediate.
    val path = bc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), 1L to 5L)
    assert(path(2L) == 6.0 && path(3L) == 8.0 && path(4L) == 6.0)
    assert(path(1L) == 0.0 && path(5L) == 0.0)
    // Diamond 1-2-4, 1-3-4: every vertex sits on exactly half of the
    // two shortest paths of its opposite pair (sigma splits 0.5/0.5 for
    // 1~4 through {2,3} AND for 2~3 through {1,4}), so all-sources
    // betweenness is 1.0 everywhere — the sigma-ratio discipline, not
    // just path counting.
    val dia = bc(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L), Seq(1L, 2L, 3L, 4L))
    assert(dia(1L) == 1.0 && dia(2L) == 1.0 && dia(3L) == 1.0 && dia(4L) == 1.0)
  }

  test("betweennessDeltas(knownDists) is row-identical to self-discovery") {
    import spark.implicits._
    // The r13 optimization: level membership supplied by a precomputed
    // multi-source BFS instead of the growing seen/anti-join state. The
    // returned (s0, id, dist, delta) rows must be IDENTICAL — same σ
    // ratios, same exact-decimal δ sums — on a graph with multiple
    // shortest paths (the diamond) and a deep path.
    def rows(edges: Seq[(Long, Long)], sources: Seq[Long]) = {
      val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
      val self = DFGraphAlgs.betweennessDeltas(sym, sources, 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      val dists = DFGraphAlgs.multiSourceShortestPaths(
        sym.withColumn("w", lit(1.0)), sources, 6)
      val given = DFGraphAlgs.betweennessDeltas(sym, sources, 6,
        knownDists = Some(dists))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
      (self, given)
    }
    val (pSelf, pGiven) = rows(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), 1L to 5L)
    assert(pSelf == pGiven)
    val (dSelf, dGiven) = rows(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L),
      Seq(1L, 2L, 3L, 4L))
    assert(dSelf == dGiven)
  }

  test("connectedComponents labels the two micro components by min id") {
    val comps = DFGraphAlgs.connectedComponents(edgeDF, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
    val viaGraphX = GraphAlgs.connectedComponents(GraphAlgs.fromEdgeDF(edgeDF), 4)
      .collect().toMap
    assert(viaGraphX == comps)
  }

  test("degrees: undirected degree on micro graph") {
    val got = DFGraphAlgs.degrees(edgeDF)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 6L, 4L -> 2L, 5L -> 2L, 6L -> 2L))
  }

  test("random-walk corpus: walks start at their root and follow edges") {
    val corpus = graft.ops.GraphPack.queries("graph_rw_corpus")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    val byWalk = corpus.groupBy(t => (t._1, t._2))
    // Every walk is complete (5 nodes) and anchored at its root.
    byWalk.foreach { case ((root, _), steps) =>
      assert(steps.length == 5, s"walk from $root truncated")
      assert(steps.minBy(_._3)._4 == root, s"walk from $root not anchored")
    }
    // Every consecutive (node, next) pair is a real edge (edge_weights
    // lists the symmetric edge set).
    val edgeSet = {
      import spark.implicits._
      graft.ops.GraphPack.queries("graph_edge_weights")(spark, sf())
        .select($"src", $"dst").as[(Long, Long)].collect().toSet
    }
    byWalk.foreach { case (_, steps) =>
      steps.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a._4, b._4)),
          s"step ${a._4} -> ${b._4} is not an edge")
        case _ =>
      }
    }
  }

  test("personalizedPageRank: symmetric seeds get mirror-image ranks") {
    // Path 1-2-3-4: seeds 1 and 4 are mirror images, so their rank
    // vectors must be reflections of each other; each seed holds its
    // own maximum (restart mass dominates at damping 0.85/4 rounds).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = path.toDF("src", "dst")
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val seeds = Seq(1L, 4L).toDF("seed")
    val r = DFGraphAlgs.personalizedPageRank(sym, seeds, 4)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    assert(math.abs(r((1L, 2L)) - r((4L, 3L))) < 1e-12, "mirror symmetry broken")
    assert(math.abs(r((1L, 1L)) - r((4L, 4L))) < 1e-12)
    assert(r((1L, 1L)) > r((1L, 2L)) && r((1L, 1L)) > r.getOrElse((1L, 3L), 0.0),
      "seed must dominate its own PPR vector")
    // Sparse-state contract: no rank row for a (seed, node) pair the
    // walk mass never reached beyond the 4 rounds... all reached here,
    // but every emitted rank must be strictly positive.
    assert(r.values.forall(_ > 0.0), "sparse state must hold nonzero mass only")
  }

  test("node2vec corpus: walks anchored, on-edge, and return-discouraged") {
    val corpus = graft.ops.GraphPack.queries("graph_node2vec")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(corpus.nonEmpty)
    val edgeSet = {
      graft.ops.GraphPack.queries("graph_edge_weights")(spark, sf())
        .select($"src", $"dst").as[(Long, Long)].collect().toSet
    }
    val byWalk = corpus.groupBy(t => (t._1, t._2))
    var backtracks = 0; var steps2plus = 0
    byWalk.foreach { case ((root, _), steps) =>
      val path = steps.sortBy(_._3).map(_._4)
      assert(path.head == root, s"walk from $root not anchored")
      path.sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a, b)),
          s"step $a -> $b is not an edge")
        case _ =>
      }
      path.sliding(3).foreach {
        case Array(a, _, c) => steps2plus += 1; if (a == c) backtracks += 1
        case _ =>
      }
    }
    // p=4 (return weight 0.25) must suppress immediate backtracking well
    // below the uniform-walk rate on this hub-dominated graph.
    assert(steps2plus > 0)
    assert(backtracks.toDouble / steps2plus < 0.5,
      s"return bias ineffective: $backtracks/$steps2plus backtracks")
  }
}
