package graft.api

import org.apache.spark.sql.{Column, DataFrame}
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
    * row-level sampling decisions. */
  def mixBucket(key: Column): Column =
    (key * 2654435761L) % 1000003L % 100

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

  /** Negative-pair sampler: the (a × b) candidate space thinned by the
    * integer mix to ~1/ratio, minus observed positives (anti-join). The
    * filter runs over the cross product, so per-row cost IS the cost —
    * integer math only. */
  def negativePairs(as: DataFrame, bs: DataFrame, positives: DataFrame,
      aCol: String, bCol: String, oneIn: Int): DataFrame =
    as.crossJoin(bs)
      .filter((col(aCol) * 2654435761L + col(bCol) * 40503L) % 1000003L % oneIn === 0)
      .join(positives, Seq(aCol, bCol), "left_anti")
}
