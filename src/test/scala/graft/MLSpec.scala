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

  test("ml_link_split: buckets cover all edges, ~80/10/10") {
    val m = MLPack.queries("ml_link_split")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = m.values.sum.toDouble
    assert(m.keySet == Set("train", "val", "test"))
    assert(m("train") / total > 0.7 && m("train") / total < 0.9)
  }
}
