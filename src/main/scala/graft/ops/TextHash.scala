package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic text hashing + shingling primitives.
  *
  * The dedup / fingerprint operators need a hash BOTH Spark and the DuckDB
  * oracle can compute bit-identically. MD5 is standard in both; taking the
  * first 7 hex chars gives a 28-bit non-negative integer, small enough that
  * affine re-hashes (a*H + b) mod P stay inside a signed 64-bit integer
  * with no overflow in either engine.
  *
  * Scale note: everything here is built-in, codegen'd expressions — no
  * UDFs — so shingling + hashing stays inside whole-stage codegen and
  * distributes embarrassingly (per-row work, no shuffle).
  */
object TextHash {
  /** Mersenne prime 2^31 - 1, the modulus of all affine re-hashes. */
  val P = 2147483647L
  /** Polynomial rolling-hash base (document fingerprints). */
  val B = 131L
  /** Signature width shared by the explode-based minhash pipeline and
    * the one-pass MinHashSketch aggregate (graft.functions). */
  val NumSketchHashes = 16

  /** 28-bit MD5-derived hash of a string column. */
  def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** DuckDB fragment matching [[h28]]. */
  def h28Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 7)) AS BIGINT)"

  /** j-th affine re-hash of a 28-bit hash: (2j+1)·H + j² + 7 mod P. */
  def affine(h: Column, j: Column): Column =
    ((lit(2) * j + 1) * h + j * j + 7) % P

  /** DuckDB fragment matching [[affine]]. */
  def affineSql(h: String, j: String): String =
    s"((2*($j)+1) * ($h) + ($j)*($j) + 7) % ${P}"

  /** Whitespace tokens of a text column. */
  def tokens(c: Column): Column = split(c, " ")

  /** Overlapping word n-grams from an ALREADY-MATERIALIZED word-array
    * column (empty if < n words). The words must come through a projection
    * boundary (`.select(split(text, " ").as("ws"))`) — passing
    * `split(text, " ")` directly re-evaluates the split inside every
    * `element_at` of the lambda (no common-subexpression elimination
    * across lambda scopes), turning shingling O(words²) per document
    * (measured 6.6 s → 0.5 s at sf0.1 for the 3-gram explode). */
  def shinglesFromWords(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))

  /** DuckDB fragment matching [[shingles]] for n=3 over column `text`. */
  def shingles3Sql(textExpr: String): String = {
    val w = s"string_split($textExpr, ' ')"
    s"list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])"
  }
}
