package graft

import graft.ops.MLPack

/** Behavior checks for the MLlib pipeline pieces the DuckDB oracle can't
  * express (LBFGS training) and ranking invariants. */
class MLSpec extends SparkSpec {

  test("ml_train_eval: LR on structural features beats chance") {
    val rows = MLPack.queries("ml_train_eval")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("train_rows") > 0 && rows("test_rows") > 0)
    assert(rows("areaUnderROC") > 0.5,
      s"structural features must carry signal, got AUC ${rows("areaUnderROC")}")
  }

  test("ml_recommend_topk: scores are sorted, self excluded") {
    val rows = MLPack.queries("ml_recommend_topk")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse, "top-k must be score-descending")
    assert(!rows.map(_.getLong(0)).contains(1L), "query customer must not recommend itself")
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

  test("ml_link_split: buckets cover all edges, ~80/10/10") {
    val m = MLPack.queries("ml_link_split")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = m.values.sum.toDouble
    assert(m.keySet == Set("train", "val", "test"))
    assert(m("train") / total > 0.7 && m("train") / total < 0.9)
  }
}
