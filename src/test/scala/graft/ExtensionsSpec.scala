package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: injected functions and the
  * bounded-levenshtein optimizer rule (predicate rewritten to the
  * short-circuiting 3-arg form, results unchanged).
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq(
    (1L, "customer#01"), (2L, "customer#02"), (3L, "customer#11"),
    (4L, "wholly different"), (5L, "customer#01")).toDF("id", "nm")

  test("levenshtein <= k rewrites to the bounded form in the optimized plan") {
    val q = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= 1)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Some(1)) >= 0"),
      s"rule did not rewrite:\n$optimized")
  }

  test("rewritten predicate keeps exactly the unbounded results") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.nm").as("na"), col("b.nm").as("nb"))
    val viaRule = pairs(base.filter(levenshtein(col("na"), col("nb")) <= 1)
      .select("i", "j"))
    // ground truth via the explicit 3-arg call (no rewrite involved)
    val direct = pairs(base.filter(levenshtein(col("na"), col("nb"), 1) >= 0)
      .select("i", "j"))
    assert(viaRule == direct)
    assert(viaRule.contains((1L, 5L)), "identical strings are distance 0")
    assert(viaRule.contains((1L, 2L)), "one substitution away")
    assert(!viaRule.contains((1L, 4L)))
  }

  test("strict < and = comparisons rewrite without changing results") {
    val base = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.nm").as("na"), col("b.nm").as("nb"))
    val lt = base.filter(levenshtein(col("na"), col("nb")) < 1)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lt == Set((1L, 5L)), "only the exact-dup pair is at distance 0")
    val eq = base.filter(levenshtein(col("na"), col("nb")) === 1)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(eq.contains((1L, 2L)) && !eq.contains((1L, 5L)))
  }
}
