package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextHash._

/** Generic deduplication operators over ANY corpus frame — the
  * user-facing library surface (the fixture-bound driver queries in
  * `graft.ops.DedupPack` are built from these).
  *
  * Conventions: `id` names a unique document key column, `text` the
  * content column. All hashing is the cross-engine MD5 scheme of
  * [[graft.ops.TextHash]], so results are deterministic across runs,
  * partitionings, and engines.
  *
  * Scale: every operator is per-row map work + hash-partitioned
  * aggregations/joins; nothing collects to the driver, no all-pairs
  * product except where the name says so (`allPairsJaccard` exists as
  * the small-data oracle of record — use `lshNearDupPairs` at scale).
  */
object Dedup {

  /** Distinct (id, shingle) word-n-gram rows of a corpus. */
  def shingleRows(corpus: DataFrame, id: String, text: String, n: Int = 3): DataFrame =
    corpus
      .select(col(id).as("doc_id"), tokens(col(text)).as("ws"))
      .select(col("doc_id"), explode(shinglesFromWords(col("ws"), n)).as("sh"))
      .distinct()

  /** Exact-duplicate audit by full-content digest: one row —
    * (n_distinct_texts, n_dup_groups, n_redundant_docs). Compares only
    * 128-bit digests, never strings. */
  def exactDupStats(corpus: DataFrame, text: String): DataFrame =
    corpus.select(md5(col(text)).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_distinct_texts"),
        sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"),
        sum(col("n") - 1).as("n_redundant_docs"))

  /** First-seen keyed dedup: keep the row with the smallest tiebreak per
    * key (deterministic, unlike dropDuplicates' partition-order pick). */
  def keyedDedup(df: DataFrame, key: Seq[String], tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(key.map(col): _*).orderBy(col(tiebreak))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signatures (doc_id, j, mh), j in [0, numHashes), via the
    * one-pass MinHashSketch aggregate — the shuffle carries one
    * fixed-width buffer per document, not numHashes× the shingle rows.
    * numHashes is fixed at TextHash.NumSketchHashes (the sketch
    * aggregate's compiled width). */
  def minhashSignatures(shingles: DataFrame): DataFrame =
    shingles
      .withColumn("h", h28(col("sh")))
      .groupBy(col("doc_id"))
      .agg(call_function("minhash_sketch", col("h")).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("j", "mh")))

  /** Band signatures into numHashes/bandSize order-independent buckets. */
  def lshBands(signatures: DataFrame, bandSize: Int): DataFrame =
    signatures
      .groupBy(col("doc_id"), (col("j") / bandSize).cast("int").as("band"))
      .agg(sum((col("j") % bandSize + 1) * col("mh")).as("bucket"))

  /** Candidate pairs (i < j) sharing at least one LSH band bucket. */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()

  /** Candidate pairs ACROSS two frames — corpus side as `i`, probe side
    * as `j` — sharing at least one LSH band bucket. The incremental-
    * ingest form: a new batch probes the standing corpus index, with no
    * batch×batch or corpus×corpus pairing, so each ingest costs
    * |batch-bands| join work against the (pre-built, reusable) corpus
    * bands instead of re-deduping the world. */
  def lshCandidatesAcross(corpusBands: DataFrame, probeBands: DataFrame): DataFrame =
    corpusBands.as("a").join(probeBands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()

  /** Exact shingle-Jaccard for given candidate pairs (i, j). */
  def jaccardOf(shingles: DataFrame, pairs: DataFrame): DataFrame = {
    val sz = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(shingles.as("x"), col("i") === col("x.doc_id"))
      .join(shingles.as("y"), col("j") === col("y.doc_id") && col("x.sh") === col("y.sh"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
    inter
      .join(sz.select(col("doc_id").as("i"), col("n").as("ni")), "i")
      .join(sz.select(col("doc_id").as("j"), col("n").as("nj")), "j")
      .select(col("i"), col("j"),
        (col("c") / (col("ni") + col("nj") - col("c")).cast("double")).as("jaccard"))
  }

  /** MinHash-LSH near-duplicate pairs with exact verification: LSH
    * candidates, then true Jaccard >= threshold. The 100 TB path. */
  def lshNearDupPairs(corpus: DataFrame, id: String, text: String,
      threshold: Double, bandSize: Int = 4, shingleN: Int = 3): DataFrame = {
    val sh = shingleRows(corpus, id, text, shingleN)
    val cand = lshCandidates(lshBands(minhashSignatures(sh), bandSize))
    jaccardOf(sh, cand).filter(col("jaccard") >= threshold)
  }

  /** All-pairs n-gram Jaccard >= threshold — the small-data oracle of
    * record (quadratic in documents sharing a shingle; do NOT run at
    * scale, use lshNearDupPairs). */
  def allPairsJaccard(corpus: DataFrame, id: String, text: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = shingleRows(corpus, id, text, shingleN)
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .agg(count(lit(1)).as("c"))
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    inter
      .join(sz.select(col("doc_id").as("i"), col("n").as("ni")), "i")
      .join(sz.select(col("doc_id").as("j"), col("n").as("nj")), "j")
      .select(col("i"), col("j"),
        (col("c") / (col("ni") + col("nj") - col("c")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash fingerprint per document from distinct-token hashes:
    * bit b of the fingerprint is the sign of Σ_tokens (±1 by bit b of
    * the token hash). Integer bit math only (engine-exact). */
  def simhashFingerprints(corpus: DataFrame, id: String, text: String): DataFrame =
    corpus
      .select(col(id).as("doc_id"), explode(tokens(col(text))).as("t"))
      .distinct()
      .withColumn("h", h28(col("t")))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("bit"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1, 1).otherwise(-1)).as("balance"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("balance") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .otherwise(0L)).as("simhash"))

  /** SimHash near-dup pairs within the given Hamming distance, banded:
    * the 32-bit fingerprint is sliced into maxHamming+1 bands, and any
    * pair within the bound differs in at most maxHamming bands, so it
    * matches EXACTLY on at least one (pigeonhole) — candidates come from
    * maxHamming+1 equality joins, never an all-pairs product; the exact
    * bit_count check then keeps true matches only. */
  def simhashNearDups(fingerprints: DataFrame, maxHamming: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"bad maxHamming $maxHamming")
    val nBands = maxHamming + 1
    // Band k covers bits [k*32/nBands, (k+1)*32/nBands) — the floor
    // partition gives every band >= 1 real bit for any nBands <= 32. The
    // previous ceil-width layout let trailing bands start at/past bit 32
    // for maxHamming >= 11; such a band is constantly 0 and its equality
    // join silently degenerates to the all-pairs product the banding
    // exists to avoid (results stayed correct via the exact bit_count
    // filter, but the no-cross-product guarantee broke).
    val fp = (0 until nBands).foldLeft(fingerprints) { (df, k) =>
      val lo = k * 32 / nBands
      val hi = (k + 1) * 32 / nBands
      df.withColumn(s"b$k",
        expr(s"shiftright(simhash, $lo) & ${(1L << (hi - lo)) - 1}"))
    }
    def bandJoin(k: Int) =
      fp.as("a").join(fp.as("b"),
          col(s"a.b$k") === col(s"b.b$k") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          col("a.simhash").as("ha"), col("b.simhash").as("hb"))
    (1 until nBands).map(bandJoin).foldLeft(bandJoin(0))(_ union _).distinct()
      .select(col("i"), col("j"),
        expr("bit_count(ha ^ hb)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The k Bloom bit positions of a hash column: affine re-hashes
    * j = 0..k-1 of [[graft.ops.TextHash]]'s family, reduced mod numBits.
    * Deterministic and DuckDB-replicable (all int64 arithmetic on
    * non-negative values), so Bloom membership — false positives
    * included — is exactly oracle-checkable. */
  def bloomPositions(h: Column, k: Int, numBits: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j => affine(h, j) % numBits)

  /** ONE-row Bloom bitset (column `bloom`: array<long>, numBits/64
    * words) over hash column `h` of a corpus — the standing-corpus side
    * of an exact-membership ingest gate. Built by the BitsetAgg
    * TypedImperativeAggregate: partial buffers OR-merge map-side, so
    * the corpus scan ships one numBits/8-byte buffer per task, not the
    * positions. At 100 TB the filter is megabytes (numBits ∝ corpus
    * cardinality / target fp-rate) and broadcasts to every executor. */
  def bloomBitset(corpus: DataFrame, h: Column, k: Int, numBits: Int): DataFrame =
    corpus.select(bloomPositions(h, k, numBits).as("pos"))
      .agg(call_function("bitset_agg", col("pos"), lit(numBits)).as("bloom"))

  /** Probe a batch against a [[bloomBitset]]: adds int column `flag` = 1
    * iff ALL k positions of `h` are set (standard Bloom semantics —
    * never a false negative; false positives at the filter's designed
    * rate). The 1-row bitset broadcasts — joined on a constant key
    * rather than crossJoin so the SAME probe runs on a STREAMING batch
    * frame (stream-static equi-joins are stateless and supported;
    * stream crossJoins are not). The probe itself is pure codegen'd
    * built-ins (no UDF): element_at word lookup + dynamic shiftright,
    * inside a forall lambda. */
  def bloomProbe(batch: DataFrame, bloom: DataFrame, h: Column,
      k: Int, numBits: Int, flag: String): DataFrame =
    batch.withColumn("__bk", lit(1))
      .join(broadcast(bloom.withColumn("__bk", lit(1))), "__bk")
      .withColumn(flag,
        forall(bloomPositions(h, k, numBits), p =>
          call_function("shiftright",
            element_at(col("bloom"), (p / 64).cast("int") + 1),
            (p % 64).cast("int"))
            .bitwiseAND(lit(1L)) === 1).cast("int"))
      .drop("bloom", "__bk")
}
