package graft

import graft.ops.{DedupPack, SimilarityPack, TextPack}

/** Cross-operator invariants for the training-data pipeline packs on the
  * sf0.001 fixtures (the per-value correctness is the DuckDB oracle's
  * job; these pin the relationships BETWEEN operators).
  */
class TrainingDataSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    DedupPack.queries(name)(spark, sf())
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH near-dup pairs = all-pairs Jaccard near-dup pairs (recall 1 here)") {
    val lsh = pairs("dedup_minhash_lsh")
    val exact = pairs("dedup_ngram_jaccard")
    assert(exact.nonEmpty, "fixture should contain planted near-duplicates")
    // Both filter on exact jaccard >= 0.8; LSH can only lose candidates.
    assert(lsh.subsetOf(exact))
    // With 0.99-jaccard planted dups and 4x4 bands, recall should be total.
    assert(lsh == exact)
  }

  test("banded simhash equals the all-pairs scan (pigeonhole, hamming<=1)") {
    val allPairs = DedupPack.queries("dedup_simhash")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = DedupPack.queries("dedup_simhash_banded")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == allPairs)
    assert(banded.nonEmpty)
  }

  test("generalized simhash banding equals the all-pairs scan at hamming<=2") {
    import org.apache.spark.sql.functions._
    val fp = graft.api.Dedup.simhashFingerprints(
      spark.read.parquet(s"${sf()}/documents.parquet"), "doc_id", "text")
      .localCheckpoint(true)
    val banded = graft.api.Dedup.simhashNearDups(fp, maxHamming = 2)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.simhash ^ b.simhash)").as("h"))
      .filter(col("h") <= 2)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == allPairs)
    assert(allPairs.nonEmpty, "fixture should contain hamming<=2 pairs")
  }

  test("simhash near-dups overlap shingle-Jaccard near-dups") {
    val sim = pairs("dedup_simhash")
    val exact = pairs("dedup_ngram_jaccard")
    assert(sim.nonEmpty)
    assert(exact.intersect(sim).nonEmpty,
      "hamming<=1 fingerprint pairs should include planted near-dups")
  }

  test("LSH ANN results are a subset of brute-force ranking universe") {
    val bf = SimilarityPack.queries("sim_bruteforce_topk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = SimilarityPack.queries("sim_lsh_topk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(lsh.nonEmpty, "query vector's bucket should have candidates")
    // Any candidate both return must carry the identical exact cosine.
    lsh.keySet.intersect(bf.keySet).foreach { id => assert(lsh(id) == bf(id)) }
  }

  test("IVF (fitted k-means, nprobe=3) recalls most of the brute-force top-10") {
    val bf = SimilarityPack.queries("sim_bruteforce_topk")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    val ivf = SimilarityPack.queries("sim_ivf_topk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ivf.size == 10, "probed cells must hold enough candidates")
    // Deterministic fit on the fixed fixture: measured 7/10 — pin a
    // conservative floor so quantizer tweaks that tank recall fail here.
    assert(bf.intersect(ivf.keySet).size >= 6,
      s"IVF recall collapsed: ${bf.intersect(ivf.keySet).size}/10")
  }

  test("PQ (per-subspace codebooks, ADC top-100) recalls most of brute force") {
    val bf = SimilarityPack.queries("sim_bruteforce_topk")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    val pq = SimilarityPack.queries("sim_pq_topk")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    assert(pq.size == 10, "ADC overfetch must hold enough candidates")
    // Deterministic fit on the fixed fixture: measured 7/10 — the fixture
    // embeddings are isotropic (PQ's worst case: no cluster structure for
    // the codebooks to exploit), so pin a conservative floor that still
    // catches a codebook/ADC regression.
    assert(bf.intersect(pq).size >= 6,
      s"PQ recall collapsed: ${bf.intersect(pq).size}/10")
  }

  test("SQ (int8 per-dim codes, ADC top-100) recalls nearly all of brute force") {
    val bf = SimilarityPack.queries("sim_bruteforce_topk")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    val sq = SimilarityPack.queries("sim_sq_topk")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    assert(sq.size == 10, "ADC overfetch must hold enough candidates")
    // 256 levels/dim loses far less than PQ's 8 codes/subspace — the
    // quantization error is ~(range/256)/2 per component, so the ADC
    // ordering should track the exact one closely; pin a floor above
    // the PQ one that still tolerates fixture-level ties.
    assert(bf.intersect(sq).size >= 8,
      s"SQ recall collapsed: ${bf.intersect(sq).size}/10")
  }

  test("native cosine_sim matches the exact posexplode cosine to 1e-9") {
    val native = SimilarityPack.queries("sim_native_topk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = SimilarityPack.queries("sim_bruteforce_topk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native.keySet == exact.keySet,
      "same top-10 ids through the native expression and the exact form")
    native.foreach { case (id, c) => assert(math.abs(c - exact(id)) <= 1e-9) }
  }

  test("cosine_sim: nulls, length mismatch, and zero vectors return null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // identical → 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f)),   // orthogonal → 0.0
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)))   // zero norm → null
      .toDF("a", "b")
    val got = df.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    assert(math.abs(got(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(got(1).getDouble(0)) < 1e-12)
    assert(got(2).isNullAt(0))
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b"))).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("l2_dist2: values, mixed element types, nulls, and length mismatch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),   // identical → 0
      (Array(3.0f, 0.0f), Array(0.0f, 4.0f)))   // 3-4-5 → 25
      .toDF("a", "b")
    val got = df.select(call_function("l2_dist2", col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 0.0)
    assert(math.abs(got(1).getDouble(0) - 25.0) < 1e-12)
    // float vs double element types accepted on either side
    val mixed = Seq((Array(1.0f, 1.0f), Array(2.0, 3.0))).toDF("a", "b")
      .select(call_function("l2_dist2", col("a"), col("b"))).collect()
    assert(math.abs(mixed(0).getDouble(0) - 5.0) < 1e-12)
    val mismatch = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(call_function("l2_dist2", col("a"), col("b"))).collect()
    assert(mismatch(0).isNullAt(0))
  }

  test("V2 contract: an externally-produced embedding column drops in unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // An "SBERT-class" embedding table produced OUTSIDE the engine —
    // synthesized here, written as plain parquet with the fixed-width
    // contract (vec_id: long, embedding: array<float>[Dim]) — must run
    // the similarity battery with ZERO plan or code changes: the
    // contract is the schema, not the embedding's provenance. Planted
    // near-clones prove the semantics carry through end-to-end.
    val dim = 64
    val rng = new scala.util.Random(7)
    val base = (0L until 300L).map { id =>
      (id, Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
    }
    // ids 250..259 are near-clones of 0..9 (scaled + tiny noise →
    // cosine ≈ 1 with their originals).
    val planted = base.map { case (id, v) =>
      if (id >= 250 && id < 260) {
        val src = base((id - 250).toInt)._2
        (id, src.map(x => x * 1.01f + (rng.nextFloat() - 0.5f) * 1e-3f))
      } else (id, v)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_ext").toString
    planted.toDF("vec_id", "embedding")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // The native codegen'd scan and the exact posexplode/decimal form
    // must agree on the external column exactly as they do on the
    // fixture one.
    val native = graft.ops.SimilarityPack.queries("sim_native_topk")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = graft.ops.SimilarityPack.queries("sim_bruteforce_topk")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native.keySet == exact.keySet)
    // vec 250 is the planted clone of the query vector (vec 0): it must
    // rank first at cosine ≈ 1.
    assert(native.contains(250L) && native(250L) > 0.99,
      s"planted clone of the query vector missing from top-k: $native")
    // SemDeDup on the external column: every planted clone has a
    // smaller-id near-dup at cosine ≥ the threshold, so all ten must be
    // on the drop list.
    val dropped = graft.ops.SimilarityPack.queries("dedup_semantic")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert((250L until 260L).forall(dropped.contains),
      s"planted clones missing from the semantic drop list: $dropped")
  }

  test("cosine_sim / l2_dist2 reject non-float-array inputs at analysis") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Both are SQL-registered, so arbitrary user types reach them: a
    // non-array argument must fail ANALYSIS with a type message (not a
    // planning ClassCastException), and an array<int> argument must be
    // REJECTED (getDouble over int element storage read garbage before
    // the NumericArrayPair check).
    for (fn <- Seq("cosine_sim", "l2_dist2")) {
      val notArray = intercept[org.apache.spark.sql.AnalysisException] {
        Seq((1.0, Array(1.0f))).toDF("a", "b")
          .select(call_function(fn, col("a"), col("b"))).collect()
      }
      assert(notArray.getMessage.toLowerCase.contains("array"),
        s"$fn non-array rejection must name the expected type: ${notArray.getMessage}")
      val intArray = intercept[org.apache.spark.sql.AnalysisException] {
        Seq((Array(1, 2), Array(1.0f, 2.0f))).toDF("a", "b")
          .select(call_function(fn, col("a"), col("b"))).collect()
      }
      assert(intArray.getMessage.toLowerCase.contains("array"),
        s"$fn array<int> must be rejected, not misread: ${intArray.getMessage}")
    }
  }

  test("fingerprint is order-sensitive where minhash is not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.TextHash._
    val docs = Seq((1L, "a b c d e f"), (2L, "f e d c b a")).toDF("doc_id", "text")
    val fp = docs.select(
      aggregate(transform(tokens(col("text")), t => h28(t)), lit(0L),
        (acc, h) => (acc * B + h) % P).as("fp"))
      .collect().map(_.getLong(0))
    assert(fp(0) != fp(1), "reversed token order must change the rolling hash")
  }

  test("stratified sample keeps every urgent order and ~rate of the rest") {
    val rows = graft.ops.AnalyticsPack.queries("ana_stratified_sample")(spark, sf())
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (prio, rate, total, sampled) =>
      if (rate == 100) assert(sampled == total, s"$prio: keep-all stratum lost rows")
      else assert(sampled <= total, s"$prio: sampled above total")
    }
  }

  test("tfidf top terms: ranks are 1..3 per doc and scores non-increasing") {
    val rows = TextPack.queries("text_tfidf_topterms")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq, s"doc $doc ranks")
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"doc $doc scores increase with rank")
    }
  }

  test("text stats: quality components stay in [0, 1]") {
    val q = TextPack.queries("text_quality_score")(spark, sf())
    import org.apache.spark.sql.functions._
    val bad = q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("type_token_ratio") <= 0 || col("type_token_ratio") > 1 ||
      col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("semantic dedup drops are cell-mates of a smaller survivor near threshold") {
    import org.apache.spark.sql.functions._
    val dropped = SimilarityPack.queries("dedup_semantic")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dropped.nonEmpty, "fixture should contain semantic near-dups")
    // Every drop has >= 1 smaller-id mate and its max cosine clears the
    // threshold; the drop rule keeps the min id, so the GLOBAL min vec_id
    // can never be dropped.
    assert(dropped.forall { case (_, n, c) => n >= 1 && c >= 0.4 })
    val minVec = graft.tables.Tables.embeddings(spark, sf())
      .agg(min(col("vec_id"))).head().getLong(0)
    assert(!dropped.map(_._1).contains(minVec))
  }

  test("contamination probe flags the corpus docs sharing probe shingles") {
    val rows = TextPack.queries("text_contamination")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "some corpus doc should overlap the probe docs")
    // Overlap fraction is hits/total in (0, 1]; probe docs themselves are
    // excluded from the corpus side.
    assert(rows.forall { case (id, h, t, f) =>
      id > 5 && h >= 1 && h <= t && f > 0 && f <= 1.0 })
  }

  test("repetition metrics: fractions in [0,1), top >= dup contribution floor") {
    val rows = TextPack.queries("text_repetition")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, dup2, top2, dup3, top3) =>
      assert(dup2 >= 0 && dup2 < 1 && dup3 >= 0 && dup3 < 1, s"doc $id dup fracs")
      assert(top2 > 0 && top2 <= 1 && top3 > 0 && top3 <= 1, s"doc $id top fracs")
    }
    // A repeated trigram forces its bigrams to repeat, so corpus-wide
    // some doc shows dup2 >= dup3 unless nothing repeats at all.
    assert(rows.forall { case (_, dup2, _, dup3, _) => dup3 == 0 || dup2 > 0 })
  }

  test("bloom gate: no false negatives; bitset probe = position-set reference") {
    import org.apache.spark.sql.functions._
    val rows = DedupPack.queries("dedup_bloom_gate")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // Bloom's contract: membership implies a hit — exact_dup=1 forces
    // in_bloom=1 for every batch doc, at any fp rate.
    rows.foreach { case (id, inBloom, exact) =>
      assert(exact == 0 || inBloom == 1, s"false negative on doc $id") }
    // The compressed bitset answers membership identically to the
    // distinct-position-set join (the oracle's formulation), on a
    // randomized frame with planted exact duplicates across the split.
    val rnd = new scala.util.Random(271)
    val k = 4; val bits = 512 // small filter → false positives occur
    val docs = spark.createDataFrame(
      (0L until 300L).map { i =>
        val h = if (i % 10 == 0 && rnd.nextBoolean()) (i + 1) * 97 % (1 << 28)
                else rnd.nextInt(1 << 28).toLong
        (i, h)
      }).toDF("doc_id", "h")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val got = graft.api.Dedup.bloomProbe(batch,
        graft.api.Dedup.bloomBitset(corpus, col("h"), k, bits),
        col("h"), k, bits, "flag")
      .select("doc_id", "flag").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val posSet = corpus
      .select(explode(graft.api.Dedup.bloomPositions(col("h"), k, bits)).as("p"))
      .distinct().collect().map(_.getLong(0)).toSet
    val expect = batch
      .select(col("doc_id"), graft.api.Dedup.bloomPositions(col("h"), k, bits).as("ps"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.getSeq[Long](1).forall(posSet)) 1 else 0)).toMap
    assert(got == expect)
    assert(got.values.sum > 0, "saturation-prone filter should flag something")
  }
}
