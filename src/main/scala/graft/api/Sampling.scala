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

  /** Knuth-style integer-mix bucket in [0, 100) from a long key —
    * ~100× cheaper per row than an md5 hash; use for high-volume
    * row-level sampling decisions. Both reductions go through pmod:
    * Spark's `%` is sign-preserving, so a negative key (or the sign flip
    * when key·2654435761 overflows int64 for |key| ≳ 3.5e9 — real at
    * 100 TB id ranges) would otherwise escape the [0, 100) contract and
    * defeat every `bucket < rate` cut. */
  def mixBucket(key: Column): Column =
    pmod(pmod(key * 2654435761L, lit(1000003L)), lit(100))

  /** Two-key integer mix in [0, 1000003) — the pair-sampling form of
    * mixBucket, same overflow-safe pmod contract. */
  def mixPair(a: Column, b: Column): Column =
    pmod(a * 2654435761L + b * 40503L, lit(1000003L))

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

  /** Scale-safe negative-pair sampler: `perLeft` deterministic
    * pseudo-random candidate picks per left row (O(|A|·perLeft) generated
    * rows), deduped, minus observed positives (anti-join).
    *
    * The candidate side is dense-indexed once (row_number over its sorted
    * keys — the candidate side is the DIMENSION side, so the one-time
    * global window is bounded) and each (a, j) pick maps through the
    * integer mix to an index, resolved by a broadcast equi-join. The
    * |A|×|B| space is never enumerated: the previous form materialized
    * the full cross product and filtered it, which at 10⁷ × 10⁶ ids is
    * 10¹³ generated rows to keep a few percent. */
  def negativePairs(as: DataFrame, bs: DataFrame, positives: DataFrame,
      aCol: String, bCol: String, perLeft: Int): DataFrame = {
    val idx = bs.select(col(bCol)).distinct()
      .withColumn("__bidx",
        row_number().over(Window.orderBy(col(bCol))).cast("long") - 1)
    // Dimension-side cardinality: one scalar action over the small side,
    // driver metadata only (never row data).
    val nB = idx.count()
    as.select(col(aCol))
      .select(col(aCol), explode(sequence(lit(0), lit(perLeft - 1))).as("__j"))
      .withColumn("__bidx", pmod(mixPair(col(aCol), col("__j")), lit(nB)))
      .join(idx.hint("broadcast"), "__bidx")
      .select(col(aCol), col(bCol)).distinct()
      .join(positives, Seq(aCol, bCol), "left_anti")
  }
}
