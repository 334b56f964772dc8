package graft

import graft.ops.MLPack

/** Behavior checks for the MLlib pipeline pieces the DuckDB oracle can't
  * express (LBFGS training) and ranking invariants. */
class MLSpec extends SparkSpec {

  test("ml_train_eval: LR on structural features hits the fixture quality bar") {
    val rows = MLPack.queries("ml_train_eval")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("train_rows") > 0 && rows("test_rows") > 0)
    // Quality PIN, not a chance bar: the deterministic pipeline measures
    // AUC 0.918 / AP 0.991 on the sf0.001 fixture (the reference reports
    // 0.76 AUC / 0.84 AP on real Wikidata, README.md:46-50). Pinned at
    // measured-minus-margin so a feature or split regression fails the
    // suite instead of coasting over a 0.5 coin-flip bar; the margin
    // absorbs LBFGS float-reduction jitter across partitionings.
    assert(rows("areaUnderROC") > 0.85,
      s"AUC regressed below the 0.918-measured fixture pin: ${rows("areaUnderROC")}")
    assert(rows("areaUnderPR") > 0.90,
      s"AP regressed below the 0.991-measured fixture pin: ${rows("areaUnderPR")}")
  }

  test("ml_als_recommend: ALS recovers planted block structure") {
    // Two disjoint user/item blocks; implicit ALS must recommend
    // in-block items to in-block users (the quality pin the DuckDB
    // oracle can't express — normal-equation float solves are not
    // bit-reproducible across engines).
    import spark.implicits._
    import org.apache.spark.ml.recommendation.ALS
    val ratings = (for {
      u <- 0 until 20; i <- 0 until 20
      if (u < 10) == (i < 10)                 // block-diagonal interactions
      if (u * 7 + i * 3) % 4 != 0             // drop some cells: generalize, not memorize
    } yield (u, i, 1.0f)).toDF("user", "item", "rating")
    val model = new ALS().setUserCol("user").setItemCol("item")
      .setRatingCol("rating").setRank(4).setMaxIter(10).setRegParam(0.05)
      .setImplicitPrefs(true).setSeed(7L).setColdStartStrategy("drop")
      .fit(ratings)
    val recs = model.recommendForUserSubset(Seq(0, 15).toDF("user"), 5)
      .select(org.apache.spark.sql.functions.col("user"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("recommendations.item")).as("item"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val block0 = recs.filter(_._1 == 0).map(_._2)
    val block1 = recs.filter(_._1 == 15).map(_._2)
    assert(block0.nonEmpty && block0.forall(_ < 10),
      s"user 0 must be recommended block-0 items, got ${block0.mkString(",")}")
    assert(block1.nonEmpty && block1.forall(_ >= 10),
      s"user 15 must be recommended block-1 items, got ${block1.mkString(",")}")
  }

  test("ml_als_recommend: fixture query returns ranked per-user recs") {
    val rows = MLPack.queries("ml_als_recommend")(spark, sf()).collect()
    assert(rows.nonEmpty)
    // user/item are the ORIGINAL long keys since the dense-index remap
    // (ALS fits on int indices internally; output maps back).
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted.toSeq
      assert(ranks == (1 to rs.length), "per-user ranks must be dense 1..k")
    }
  }

  test("ml_recommend_topk: scores are sorted, self excluded") {
    val rows = MLPack.queries("ml_recommend_topk")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "top-k must be score-descending")
    assert(!rows.map(_.getLong(0)).contains(1L), "query customer must not recommend itself")
  }

  test("hub penalty: a high-degree hub is out-ranked by a low-degree candidate") {
    // ref predicter.py:264-272 — pooled score divided by log(deg+1)+1.
    // hub: 10/(ln(1001)+1) ≈ 1.264; low: 8/(ln(3)+1) ≈ 3.812.
    import spark.implicits._
    val pooled = Seq(
      ("customer", 100L, "A", 10L),      // hub: higher raw score
      ("customer", 2L, "B", 8L)
    ).toDF("cand_type", "cand", "best_rel", "score")
    val degs = Seq(
      ("customer", 100L, 1000L),
      ("customer", 2L, 2L)
    ).toDF("cand_type", "cand", "deg")
    val out = MLPack.hubPenalizedTopK(pooled, degs, k = 5).collect()
    assert(out.head.getAs[Long]("cand") == 2L,
      "the low-degree candidate must out-rank the hub after damping")
    assert(out.head.getAs[Int]("type_rank") == 1)
    assert(out.map(_.getAs[Long]("cand")).toSet == Set(2L, 100L))
  }

  test("M6: CrossValidator grid search selects a usable model") {
    // Hyperparameter search re-designed onto MLlib (SURVEY.md §2.10 M5/M6:
    // the reference wires Optuna + a cosine LR schedule; the MLlib form is
    // regParam/maxIter over ParamGridBuilder + CrossValidator).
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // Separable synthetic data: label = x1 + x2 > 1 with noise.
    val data = Seq.fill(400) {
      val (x1, x2) = (rng.nextDouble(), rng.nextDouble())
      val label = if (x1 + x2 + rng.nextGaussian() * 0.2 > 1.0) 1.0 else 0.0
      (x1, x2, label)
    }.toDF("x1", "x2", "label")
    val assembled = new VectorAssembler()
      .setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(data)
    val lr = new LogisticRegression().setFeaturesCol("features").setLabelCol("label")
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.001, 0.1))
      .addGrid(lr.maxIter, Array(5, 20))
      .build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new BinaryClassificationEvaluator().setLabelCol("label"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2)
      .setSeed(42)
    val model = cv.fit(assembled)
    assert(model.avgMetrics.length == 4)
    assert(model.avgMetrics.max > 0.9, s"best AUC ${model.avgMetrics.max}")
  }

  test("S12: PipelineModel save/load round-trip preserves predictions") {
    // The reference pickles torch state_dicts (model_repo.py:29-33); the
    // MLlib form is Pipeline persistence — parquet + JSON metadata.
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.PipelineModel
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    import spark.implicits._
    val data = Seq((1.0, 0.2, 0.0), (0.1, 0.9, 1.0), (0.8, 0.1, 0.0), (0.2, 1.1, 1.0))
      .toDF("x1", "x2", "label")
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x1", "x2")).setOutputCol("features"),
      new LogisticRegression().setLabelCol("label").setFeaturesCol("features").setMaxIter(10)))
    val model = pipe.fit(data)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(data).select("prediction").collect().map(_.getDouble(0)).toSeq
    val b = loaded.transform(data).select("prediction").collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("V2: HashingTF+IDF text-embedding stand-in keeps the Vector contract") {
    // The reference embeds profile text with SBERT (data_processor.py:
    // 31-33); no SBERT on Spark, so the engine holds the column contract
    // (fixed-width Vector per doc) with MLlib HashingTF+IDF — an external
    // embedder can slot into the same column (SURVEY §2.8 V2).
    import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
    import org.apache.spark.ml.linalg.Vector
    val docs = graft.tables.Tables.documents(spark, sf()).limit(50)
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("tf").setNumFeatures(128)
    val tfd = tf.transform(tok.transform(docs))
    val idf = new IDF().setInputCol("tf").setOutputCol("embedding").fit(tfd)
    val out = idf.transform(tfd).select("doc_id", "embedding").collect()
    assert(out.length == 50)
    assert(out.forall(_.getAs[Vector]("embedding").size == 128),
      "every doc must carry the fixed-width vector contract")
    // Deterministic: a second pass produces identical vectors.
    val again = idf.transform(tfd).select("doc_id", "embedding").collect()
    assert(out.map(r => (r.getLong(0), r.getAs[Vector](1))).toMap ==
      again.map(r => (r.getLong(0), r.getAs[Vector](1))).toMap)
  }

  test("ml_link_split: buckets cover all edges, ~80/10/10") {
    val m = MLPack.queries("ml_link_split")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = m.values.sum.toDouble
    assert(m.keySet == Set("train", "val", "test"))
    assert(m("train") / total > 0.7 && m("train") / total < 0.9)
  }
}
