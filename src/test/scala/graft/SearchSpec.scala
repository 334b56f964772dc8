package graft

import org.apache.spark.sql.functions._
import graft.functions.AccentFolder

/** AccentFold expression goldens (interpreted + codegen paths) and
  * fuzzy-search behavior checks the DuckDB oracle can't express
  * (accented inputs don't occur in the fixtures).
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("AccentFolder folds diacritics and NFD-resistant letters") {
    assert(AccentFolder.fold("Café") == "Cafe")
    assert(AccentFolder.fold("Đà Nẵng") == "Da Nang")
    assert(AccentFolder.fold("Nguyễn Xuân Phúc") == "Nguyen Xuan Phuc")
    assert(AccentFolder.fold("Großœuvre øl") == "Grossoeuvre ol")
    assert(AccentFolder.fold("plain ascii 123") == "plain ascii 123")
    assert(AccentFolder.fold("") == "")
  }

  test("accent_fold as a Catalyst function (codegen path over a DataFrame)") {
    val df = Seq("Müller", "Ñandú", "Đinh", null.asInstanceOf[String])
      .toDF("s")
      .select(call_function("accent_fold", $"s").as("f"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Muller"), Some("Nandu"), Some("Dinh"), None))
  }

  test("accent_fold is usable from SQL via GraftExtensions") {
    val got = spark.sql("SELECT accent_fold('Histoire de l’Épée') AS f")
      .collect()(0).getString(0)
    assert(got == "Histoire de l’Epee")
  }

  test("fuzzy top-k ranks the typo'd target first") {
    val top = graft.ops.SearchPack.queries("search_fuzzy_topk")(spark, sf())
      .collect()
    assert(top.nonEmpty)
    // Two character edits against Customer#000000042 — it must win.
    assert(top.head.getString(1) == "Customer#000000042")
    // Scores are within [0, 130] (100 ratio + 30 max bonus).
    top.foreach(r => assert(r.getDouble(2) >= 60.0 && r.getDouble(2) <= 130.0))
  }
}
