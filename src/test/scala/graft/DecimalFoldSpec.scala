package graft

import org.apache.spark.sql.functions._

/** r12 advice (medium): the map-side decimal folds' accumulator must
  * keep Spark's Add within precision 38 or every partial sum is
  * HALF_UP-rounded to scale 14 (Add(decimal(38,15), decimal(28,15))
  * types at precision 39 → allowPrecisionLoss → decimal(38,14)).
  * These tests feed ADVERSARIAL sub-1e-14 terms where that rounding is
  * visible (6e-15 terms: rounded fold reads 1e-14 per step, ~2× the
  * true sum) and pin the folds bit-equal to the exploded
  * decimal(28,15)-SUM form the oracles replay.
  */
class DecimalFoldSpec extends SparkSpec {
  import graft.api.Similarity.{decimalDotArr, normArr}

  /** Exploded reference: SUM(CAST(term AS DECIMAL(28,15))) per row —
    * identical term arithmetic, Spark's exact decimal SUM (precision
    * 38 at scale 15). */
  private def explodedDot(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"),
        explode(zip_with(col("va").cast("array<double>"),
          col("vb").cast("array<double>"),
          (x, y) => (x * y).cast("decimal(28,15)"))).as("t"))
      .groupBy("id").agg(sum(col("t")).cast("double").as("ref"))

  test("decimalDotArr == exploded decimal SUM on sub-1e-14 adversarial terms") {
    import spark.implicits._
    // Terms of ~6e-15: under a decimal(38,14) accumulator each partial
    // sum rounds to a multiple of 1e-14 and the fold drifts ~67% high.
    val tiny = Seq.fill(64)(6e-15)
    // Mixed magnitudes: one dominant term then tiny tails a scale-14
    // accumulator silently drops.
    val mixed = 1.234567890123e6 +: Seq.fill(63)(4e-15)
    // Alternating signs near zero: partial sums cross the rounding
    // boundary both ways.
    val alt = (0 until 64).map(i => if (i % 2 == 0) 7e-15 else -6e-15)
    val df = Seq(
      (1L, tiny.map(_ => 6e-7), tiny.map(_ => 1e-8)),       // products 6e-15
      (2L, mixed.map(math.sqrt), mixed.map(math.sqrt)),      // products = mixed
      (3L, alt.map(v => math.signum(v) * 1e-7), alt.map(v => math.abs(v) * 1e8))
    ).toDF("id", "va", "vb")
    val got = df.select(col("id"), decimalDotArr(col("va"), col("vb")).as("dot"))
    val both = got.join(explodedDot(df), "id").collect()
    assert(both.length === 3)
    both.foreach { r =>
      assert(r.getAs[Double]("dot") === r.getAs[Double]("ref"),
        s"fold diverged from exploded decimal SUM at id=${r.getAs[Long]("id")}")
    }
    // The adversarial case is REAL: the true sum is not a multiple of
    // 1e-14, so a scale-14 accumulator could not have produced it.
    val tinySum = both.find(_.getAs[Long]("id") == 1L).get.getAs[Double]("ref")
    assert(math.abs(tinySum * 1e14 - math.rint(tinySum * 1e14)) > 1e-3,
      s"fixture no longer adversarial for scale-14 rounding: $tinySum")
  }

  test("normArr == sqrt of exploded decimal sum-of-squares on tiny components") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(64)(7.7e-8))).toDF("id", "va")
      .withColumn("vb", col("va"))
    val ref = explodedDot(df).select(sqrt(col("ref")).as("ref"))
      .head().getAs[Double]("ref")
    val got = df.select(normArr(col("va")).as("n")).head().getAs[Double]("n")
    assert(got === ref)
  }

  test("d2ExactArr == exploded decimal sum of squared diffs") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(64)(1e-7), Seq.fill(64)(1.6e-7)),        // diffs² 3.6e-15
      (2L, Seq.tabulate(64)(i => i * 0.125), Seq.tabulate(64)(i => i * 0.125 + 5e-8))
    ).toDF("id", "va", "cv")
    val got = df.select(col("id"),
      graft.ops.SimilarityPack.d2ExactArr(col("va"), col("cv").cast("array<double>")).as("d2"))
    val ref = df.select(col("id"),
        explode(zip_with(col("va").cast("array<double>"), col("cv").cast("array<double>"),
          (x, c) => ((x - c) * (x - c)).cast("decimal(28,15)"))).as("t"))
      .groupBy("id").agg(sum(col("t")).cast("double").as("ref"))
    got.join(ref, "id").collect().foreach { r =>
      assert(r.getAs[Double]("d2") === r.getAs[Double]("ref"),
        s"d2 fold diverged at id=${r.getAs[Long]("id")}")
    }
  }
}
