package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Search pack — SURVEY.md §2.9: search-index build (F1), exact-match
  * lookup (F2), WRatio-style fuzzy top-k with re-rank bonuses (F3), and
  * a blocked name-similarity join (the 100 TB path: candidates come from
  * equality blocking, never an all-pairs levenshtein scan — SURVEY.md
  * §7.4 risk 3).
  *
  * Normalization runs through the native accent_fold Catalyst expression
  * (graft.functions.AccentFold, injected by graft.ext.GraftExtensions) —
  * codegen'd, no UDF. The fuzzy score is the reference's WRatio
  * re-expressed in built-ins: levenshtein ratio vs token-sort ratio, max
  * with RapidFuzz's 0.95 token-sort damping (fuzzy_search.py:54-94), plus
  * the reference's re-rank bonuses (+20 prefix, +10 substring, −30 short).
  */
object SearchPack {
  type Q = (SparkSession, String) => DataFrame

  /** The serving-path query strings (a clean hit and a typo'd miss). */
  private val FuzzyQuery = "custoner#000000042"   // two typos vs Customer#000000042

  // Column builders live in the user-facing API (graft.api.Search); the
  // *Sql twins here mirror them for the DuckDB oracle.
  private def norm(c: Column): Column = graft.api.Search.normalizeKey(c)
  private def normSql(e: String): String = s"lower(trim(strip_accents($e)))"

  private def ratio(a: Column, b: Column): Column = graft.api.Search.ratio(a, b)
  private def ratioSql(a: String, b: String): String =
    s"round(100.0 * (1.0 - levenshtein($a, $b) / CAST(greatest(length($a), length($b)) AS DOUBLE)), 6)"

  private def tokenSort(c: Column): Column = graft.api.Search.tokenSort(c)
  private def tokenSortSql(e: String): String =
    s"array_to_string(list_sort(string_split($e, ' ')), ' ')"

  val queries: Map[String, Q] = Map(
    // F1 — search-index build: normalized name → bucket of ids. The
    // group-by IS the index; at serving scale it would be broadcast or
    // written to a KV sink (ref fuzzy_search.py:9-27).
    "search_index_build" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(norm(col("c_name")).as("key"))
        .agg(count(lit(1)).as("n_ids"), min(col("c_custkey")).as("first_id"))
        .orderBy(col("key")).limit(1000)
    }),

    // F2 — exact-match lookup on the normalized key (score 100 path,
    // ref fuzzy_search.py:49-52).
    "search_exact_lookup" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(norm(col("c_name")) === lit("customer#000000042"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // F3 — fuzzy top-k: WRatio-ish score over all normalized names with
    // the reference's re-rank bonuses, threshold 60, deterministic top-10
    // (ref fuzzy_search.py:54-94; settings.py:46 cutoff 60).
    "search_fuzzy_topk" -> ((s, d) => {
      val q = lit(FuzzyQuery)
      val key = norm(col("c_name"))
      val base = greatest(ratio(key, q), round(ratio(tokenSort(key), tokenSort(q)) * 0.95, 6))
      val bonus =
        when(length(key) < length(q) / 2, -30.0).otherwise(0.0) +
        when(key.startsWith(FuzzyQuery.substring(0, 4)), 20.0).otherwise(0.0) +
        when(key.contains(FuzzyQuery.substring(9)), 10.0).otherwise(0.0)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"),
          round(base + bonus, 6).as("score"))
        .filter(col("score") >= 60.0)
        .orderBy(col("score").desc, col("c_custkey").asc)
        .limit(10)
    }),

    // Blocked similarity self-join: block on the last two digits of the
    // normalized name (equality shuffle), exact levenshtein <= 1 within
    // blocks only — the join shape that survives 100 TB, vs the all-pairs
    // scan the reference does at 4.6 M names (fuzzy_search.py:54-60).
    // Bounded edit distance inside (3-arg levenshtein, ~k/|s| of the
    // full DP): per-pair work is the whole cost of a similarity
    // self-join, so the bound IS the scale path.
    "search_blocked_simjoin" -> ((s, d) => {
      graft.api.Search.blockedSimJoin(Tables.customer(s, d),
          "c_custkey", "c_name", nm => substring(nm, -2, 2), maxDist = 1)
        .orderBy(col("i"), col("j")).limit(5000)
    })
  )

  val oracle: Map[String, String] = Map(
    "search_index_build" ->
      s"""SELECT ${normSql("c_name")} AS key, COUNT(*) AS n_ids,
         |  MIN(c_custkey) AS first_id
         |FROM customer GROUP BY 1 ORDER BY key LIMIT 1000""".stripMargin,

    "search_exact_lookup" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE ${normSql("c_name")} = 'customer#000000042'
         |ORDER BY c_custkey""".stripMargin,

    "search_fuzzy_topk" -> {
      val key = normSql("c_name")
      val q = s"'$FuzzyQuery'"
      val base = s"greatest(${ratioSql(key, q)}, " +
        s"round(${ratioSql(tokenSortSql(key), tokenSortSql(q))} * 0.95, 6))"
      val bonus =
        s"(CASE WHEN length($key) < length($q) / 2 THEN -30.0 ELSE 0.0 END + " +
        s"CASE WHEN starts_with($key, '${FuzzyQuery.substring(0, 4)}') THEN 20.0 ELSE 0.0 END + " +
        s"CASE WHEN contains($key, '${FuzzyQuery.substring(9)}') THEN 10.0 ELSE 0.0 END)"
      s"""SELECT c_custkey, c_name, round($base + $bonus, 6) AS score
         |FROM customer
         |WHERE round($base + $bonus, 6) >= 60.0
         |ORDER BY score DESC, c_custkey ASC LIMIT 10""".stripMargin
    },

    "search_blocked_simjoin" ->
      s"""WITH names AS (SELECT c_custkey AS id, ${normSql("c_name")} AS nm
         |  FROM customer),
         |blk AS (SELECT id, nm, substr(nm, length(nm) - 1, 2) AS blk FROM names)
         |SELECT a.id AS i, b.id AS j, levenshtein(a.nm, b.nm) AS dist
         |FROM blk a JOIN blk b ON a.blk = b.blk AND a.id < b.id
         |WHERE levenshtein(a.nm, b.nm) <= 1
         |ORDER BY i, j LIMIT 5000""".stripMargin
  )
}
