package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextHash._

/** Generic text-analysis operators over ANY corpus frame — the
  * user-facing library surface behind `graft.ops.TextPack`'s driver
  * queries. All per-row map work in built-in (codegen'd) expressions;
  * the only shuffles are the explicitly-named corpus aggregations.
  */
object Text {

  /** Per-document token statistics: whitespace tokens, distinct tokens,
    * BPE-ish pre-tokenizer runs, chars, chars/4 subword estimate. */
  def tokenStats(corpus: DataFrame, id: String, text: String,
      bpePattern: String = """ ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"""): DataFrame = {
    val ws = tokens(col(text))
    corpus.select(col(id).as("doc_id"),
      size(ws).as("n_tokens"),
      size(array_distinct(ws)).as("n_distinct_tokens"),
      size(regexp_extract_all(col(text), lit(bpePattern), lit(0))).as("n_bpe_tokens"),
      length(col(text)).as("n_chars"),
      ceil(length(col(text)) / 4.0).cast("long").as("n_subwords_est"))
  }

  /** Quality heuristics: stopword ratio, type-token ratio, length band,
    * and a combined [0,1] score — the corpus-filter gates. */
  def qualityScore(corpus: DataFrame, id: String, text: String,
      stopwords: Seq[String]): DataFrame = {
    val ws = tokens(col(text))
    val nTok = size(ws).cast("double")
    val stopRatio = size(array_intersect(ws, array(stopwords.map(lit): _*))) / nTok
    val ttr = size(array_distinct(ws)) / nTok
    corpus.select(col(id).as("doc_id"),
      stopRatio.as("stopword_ratio"),
      ttr.as("type_token_ratio"),
      when(length(col(text)) < 100, "short")
        .when(length(col(text)) > 400, "long")
        .otherwise("medium").as("len_band"),
      (lit(0.5) * ttr + lit(0.5) * least(stopRatio * 10, lit(1.0))).as("quality"))
  }

  /** Marker-set language ID: predicted language by stopword-marker hit
    * ratio (the n-gram-profile method reduced to its marker core). */
  def langId(corpus: DataFrame, text: String,
      markers: Seq[String], lang: String = "en", minRatio: Double = 0.02): DataFrame = {
    val ws = tokens(col(text))
    val ratio = size(array_intersect(ws, array(markers.map(lit): _*))) /
      size(ws).cast("double")
    corpus.withColumn("predicted_lang",
      when(ratio >= minRatio, lang).otherwise("unknown"))
  }

  /** Order-sensitive polynomial rolling-hash fingerprint per document:
    * h = fold (h*B + h28(token)) mod P over the token stream. */
  def fingerprint(corpus: DataFrame, id: String, text: String): DataFrame = {
    val hs = transform(tokens(col(text)), t => h28(t))
    corpus.select(col(id).as("doc_id"),
      aggregate(hs, lit(0L), (acc, h) => (acc * B + h) % P).as("fingerprint"))
  }

  /** TF-IDF top-k terms per document; document frequency over the whole
    * corpus, rank = dense per-doc window by (rounded score desc, term). */
  def tfidfTopTerms(corpus: DataFrame, id: String, text: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = corpus
      .select(col(id).as("doc_id"), explode(tokens(col(text))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = corpus.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"),
        col("term"), col("tf"), col("tfidf"))
  }
}
