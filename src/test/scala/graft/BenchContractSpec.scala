package graft

/** Pins the bench artifact's trust machinery (r12 verdict #2/#3/#7):
  * the quiet-host gate reads max(1-min, 5-min) — not the gameable
  * 1-minute figure alone — the calibration probe returns a positive,
  * repeatable host-speed number, and a filtered spot run warms only
  * the cache entries its queries consume. */
class BenchContractSpec extends SparkSpec {

  test("gateLoad is max(1-min, 5-min) — the r12 sf10 gaming case trips it") {
    // r12's sf10 spot: 1-min dipped to 1.03 while 5/15-min read a busy
    // quarter hour — the old 1-min-only gate shipped load_tainted:false.
    assert(Bench.gateLoad("1.03 23.76 13.44 1/328 21698") === 23.76)
    assert(Bench.gateLoad("30.98 23.76 13.44") === 30.98)
    assert(Bench.gateLoad("0.09 0.17 1.20 1/328 21698") === 0.17)
    intercept[Exception] { Bench.gateLoad("") }
  }

  test("calibration taint rule: steal-slow host taints, quiet host passes") {
    // The r13 sf30 case: load gate read 2.1 (passed) while calibration
    // measured 2.65 s = 2.9× the reference — hypervisor steal that
    // loadavg cannot see. The rule must taint it.
    assert(Bench.calTaintedAt(2.653, 1.4))
    assert(!Bench.calTaintedAt(0.96, 1.4))   // the committed r13 sf10 spot
    assert(!Bench.calTaintedAt(1.212, 1.4))  // 1.32 ratio: slow-ish but inside
    assert(!Bench.calTaintedAt(99.0, 0.0))   // gate 0 disables
  }

  test("calibration probe: positive, and CalRefSec stays plausible for it") {
    // reps=1 keeps the test cheap; the probe must return real work time
    // (not optimized away to ~0) on the same jobs the reference pinned.
    val t = Bench.calibrationProbe(spark, reps = 1)
    assert(t > 0.01, s"probe collapsed to $t s — a job was optimized away")
    assert(Bench.CalRefSec > 0.0)
  }

  test("budgeted stdout maps: strict slowest-first prefix inside the byte budget") {
    // r13 verdict #1: the driver keeps only a ~2000-char stdout tail, so
    // the line's per-query map must be a byte-budgeted prefix — slowest
    // entries first, never a truncated (unparseable) JSON object.
    val m = Seq("slow" -> 12.3456, "mid" -> 1.0, "fast" -> 0.004)
    assert(Bench.budgetMap(m, 1000) === """{"slow":12.346,"mid":1.0,"fast":0.004}""")
    // Budget cuts after the first entry; the kept set is a PREFIX (the
    // shorter "mid" entry that would fit is NOT back-filled).
    assert(Bench.budgetMap(m, 20) === """{"slow":12.346}""")
    assert(Bench.budgetMap(m, 2) === "{}")
    assert(Bench.budgetMap(Nil, 100) === "{}")
    // Rendering: 3-decimal rounding, integral values keep a ".0".
    assert(Bench.j3(316.461518034) === "316.462")
    assert(Bench.j3(2.0) === "2.0")
    assert(Bench.j3(0.0004) === "0.0")
  }

  test("scoped warmup: spot query sets warm only the caches they consume") {
    import graft.ops.Warm.neededEntries
    val d = sf()
    // A multimodal-only spot touches NO shared cache.
    assert(neededEntries(spark, d, Some(Set("mm_format_census"))).isEmpty)
    // The r12 sf10 4-query spot: dedup_semantic + sim_dedup_sweep ride
    // sim.*; ml_als_recommend rides ml.* + graph.relpairs; none of them
    // touch graph.rwcorpus / dedup.simhash (the 577 s warmup wall).
    val spot = neededEntries(spark, d, Some(Set(
      "dedup_semantic", "sim_dedup_sweep", "ml_als_recommend", "sim_cosine_neardup")))
    assert(spot.contains("sim.comps") && spot.contains("ml.edges") &&
      spot.contains("graph.relpairs"))
    assert(!spot.contains("graph.rwcorpus") && !spot.contains("dedup.simhash") &&
      !spot.contains("graph.nbridx") && !spot.contains("graph.maxdeg"))
    // dedup_semantic must not drag the text-shingle caches in (it is a
    // sim.* consumer; the r13 spot measured 15 s of unread warmup here).
    assert(!spot.contains("dedup.shingles") && !spot.contains("dedup.signatures"))
    // graph queries pull the maxdeg scalar memo; only the rw family
    // pulls the walk corpora.
    val g = neededEntries(spark, d, Some(Set("graph_degrees")))
    assert(g.contains("graph.maxdeg") && g.contains("graph.edges"))
    assert(!g.contains("graph.rwcorpus") && !g.contains("graph.n2vcorpus"))
    val rw = neededEntries(spark, d, Some(Set("graph_rw_skipgram")))
    assert(rw.contains("graph.rwcorpus") && rw.contains("graph.nbridx"))
    // The unfiltered surface warms everything — full-bench behavior
    // unchanged.
    val all = neededEntries(spark, d, None)
    assert(all.size === 33 && all.contains("graph.maxdeg"))
    // The r14 shared contribution frame scopes to the two unsalted-loop
    // consumers; other graph queries must not pull its |E|-sized fill.
    val pr = neededEntries(spark, d, Some(Set("graph_pagerank")))
    assert(pr.contains("graph.contrib"))
    assert(!g.contains("graph.contrib"))
    // The r14 LM-score cache scopes to its two consumers only.
    val lm = neededEntries(spark, d, Some(Set("text_ppl_buckets")))
    assert(lm === Seq("text.lmscores"))
    // The r14 LSH-candidate cache scopes to its three verifying
    // consumers; the signature digest query must not pull it.
    val lsh = neededEntries(spark, d, Some(Set("dedup_containment")))
    assert(lsh.contains("dedup.cands"))
    assert(!neededEntries(spark, d, Some(Set("dedup_minhash_signatures")))
      .contains("dedup.cands"))
    // The r13 landing-chain caches scope to the etl_sparql_ family only.
    val etl = neededEntries(spark, d, Some(Set("etl_sparql_degrees_exp")))
    assert(etl.contains("etl.chain") && etl.contains("etl.nodes") &&
      !etl.contains("graph.edges"))
    assert(!g.contains("etl.chain"))
    // text_contamination shares the dedup shingle pass (cross-pack edge).
    assert(neededEntries(spark, d, Some(Set("text_contamination")))
      === Seq("dedup.shingles"))
  }
}
