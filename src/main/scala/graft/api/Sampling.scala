package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextHash.h28

/** Deterministic sampling / splitting operators — the training-data
  * pipeline's RNG-free primitives. Hash-based decisions are reproducible
  * across runs, partitionings, and engines (no seed state), which is
  * what makes sampled datasets auditable at 100 TB.
  */
object Sampling {

  /** 2654435761 mod 1000003 — the Knuth multiplier PRE-REDUCED into the
    * mix modulus. Every mix below multiplies `pmod(key, m)` by a reduced
    * constant instead of the raw key by 2654435761: the value is
    * IDENTICAL for every key (modular multiplication commutes with
    * reduction), but the product stays ≤ m·constant ≈ 4.3·10¹¹ for ANY
    * int64 key — where the raw form overflows (and, under ANSI mode,
    * THROWS from codegen) for |key| ≳ 3.5·10⁹, which the sf10 fixture's
    * replica-strided ids actually reach. */
  private val KnuthRed1000003 = 427799L

  /** Knuth-style integer-mix bucket in [0, 100) from a long key —
    * ~100× cheaper per row than an md5 hash; use for high-volume
    * row-level sampling decisions. All reductions go through pmod:
    * Spark's `%` is sign-preserving, so a negative key would otherwise
    * escape the [0, 100) contract and defeat every `bucket < rate` cut;
    * the pre-reduced multiplier (see [[KnuthRed1000003]]) keeps the
    * product in int64 for the whole key domain. */
  def mixBucket(key: Column): Column =
    pmod(pmod(pmod(key, lit(1000003L)) * KnuthRed1000003, lit(1000003L)), lit(100))

  /** Two-key integer mix in [0, 1000003) — the pair-sampling form of
    * mixBucket, same overflow-safe pmod + pre-reduced-multiplier
    * contract. Range is only ~10⁶: use [[mixPairWide]] when the mix is
    * mapped onto an index space that can exceed a million keys. */
  def mixPair(a: Column, b: Column): Column =
    pmod(pmod(a, lit(1000003L)) * KnuthRed1000003 +
      pmod(b, lit(1000003L)) * 40503L, lit(1000003L))

  /** Exclusive upper bound of [[mixPairWide]]: 1000003 · 999983 ≈ 10¹². */
  val WideMixMax: Long = 1000003L * 999983L

  /** Two-key integer mix over a ~10¹² range: two INDEPENDENT congruential
    * mixes (coprime moduli 1000003 and 999983) combined by base-999983
    * positional encoding — a bijection of the residue pair, so the result
    * disperses over the full [0, WideMixMax) range. mixPair's single-
    * modulus [0, 1000003) range silently made every index ≥ 1000003
    * unreachable when pmod'ed by a larger candidate count (plus modulo
    * bias near the boundary); this form covers candidate sides up to
    * ~10¹² distinct keys with bias ≤ n/10¹². Both component mixes
    * pre-reduce their keys into their modulus before multiplying
    * (value-identical, see [[KnuthRed1000003]]), so all arithmetic stays
    * inside int64 for EVERY int64 key — the raw-key form threw ANSI
    * overflow at the sf10 fixture's 10¹⁰-scale ids. */
  def mixPairWide(a: Column, b: Column): Column =
    mixPair(a, b) * 999983L +
      pmod(pmod(a, lit(999983L)) * 48271L +
        pmod(b, lit(999983L)) * 69621L, lit(999983L))

  /** Per-stratum keep-rates: keep a row iff its mix bucket falls under
    * the stratum's percentage (strata missing from `rates` drop to
    * `defaultRate`). */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(stratum === s, r).otherwise(acc)
    }
    df.filter(mixBucket(key) < rate)
  }

  /** Deterministic train/val/test split on a canonical pair key: an edge
    * and its reverse land in the same split (md5-bucketed 80/10/10 by
    * default). Adds a `split` column. */
  def pairSplit(df: DataFrame, a: Column, b: Column,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = h28(concat_ws("_", least(a, b), greatest(a, b))) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Bucket count of [[denseIndex]]'s two-phase rank — constant, never
    * data-scale. */
  val IdxBuckets = 1024

  /** Deterministic dense index 0..n-1 over the DISTINCT values of
    * `keyCol`, returned as (keyCol, __bidx). Two-phase rank: the key set
    * is hash-bucketed (cross-engine MD5 bucket), row_number runs PER
    * BUCKET (bounded partitions — never a single global sort task), and
    * per-bucket offsets come from a cumulative window over the
    * IdxBuckets-row bucket histogram (constant-size — the only
    * unpartitioned window left, over ≤ 1024 rows regardless of data
    * scale). The index ↔ key mapping is a deterministic bijection, which
    * is all a hash-pick sampler needs. */
  def denseIndex(keys: DataFrame, keyCol: String): DataFrame = {
    val bkt = keys.select(col(keyCol)).distinct()
      .withColumn("__bkt", pmod(h28(col(keyCol).cast("string")), lit(IdxBuckets.toLong)))
    val ranked = bkt.withColumn("__rn", row_number().over(
      Window.partitionBy(col("__bkt")).orderBy(col(keyCol))).cast("long"))
    val offs = bkt.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    ranked.join(broadcast(offs), "__bkt")
      .select(col(keyCol), (col("__off") + col("__rn") - 1).as("__bidx"))
  }

  /** Scale-safe negative-pair sampler: `perLeft` deterministic
    * pseudo-random candidate picks per left row (O(|A|·perLeft) generated
    * rows), deduped, minus observed positives (anti-join).
    *
    * The candidate side is dense-indexed once via the two-phase
    * [[denseIndex]] (per-bucket row_number + broadcast offsets — no
    * global sort task even for a billion-key candidate side) and each
    * (a, j) pick maps through [[mixPairWide]] to an index, resolved by a
    * broadcast equi-join. The |A|×|B| space is never enumerated: the
    * round-2 form materialized the full cross product and filtered it,
    * which at 10⁷ × 10⁶ ids is 10¹³ generated rows to keep a few
    * percent. Candidate sides beyond WideMixMax (~10¹²) keys fail loudly
    * instead of silently never sampling the tail. */
  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    * Spirakis A-Res, 2006): each row gets priority −ln(u)/w with u a
    * 28-bit md5 uniform of (salt, key) — the k smallest priorities ARE a
    * weighted sample without replacement, replayable in any engine that
    * can md5. Selection is a per-partition top-k heap (TakeOrdered), no
    * global sort. Returns the k sampled rows with their priorities. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      salt: String = "ws"): DataFrame = {
    val u = (h28(concat(lit(s"$salt:"), col("key"))) + 1).cast("double") /
      lit(268435456.0)
    df.select(key.as("key"), weight.as("w"))
      .withColumn("priority", -log(u) / col("w"))
      .orderBy(col("priority").asc, col("key").asc)
      .limit(k)
  }

  def negativePairs(as: DataFrame, bs: DataFrame, positives: DataFrame,
      aCol: String, bCol: String, perLeft: Int): DataFrame = {
    val idx = denseIndex(bs, bCol)
    // Dimension-side cardinality: one scalar action over the small side,
    // driver metadata only (never row data).
    val nB = idx.count()
    require(nB > 0 && nB < WideMixMax,
      s"candidate side has $nB distinct keys; mixPairWide reaches < $WideMixMax")
    as.select(col(aCol))
      .select(col(aCol), explode(sequence(lit(0), lit(perLeft - 1))).as("__j"))
      .withColumn("__bidx", pmod(mixPairWide(col(aCol), col("__j")), lit(nB)))
      .join(idx.hint("broadcast"), "__bidx")
      .select(col(aCol), col(bCol)).distinct()
      .join(positives, Seq(aCol, bCol), "left_anti")
  }
}
