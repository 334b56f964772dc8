package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.tables.Tables

/** Query surface for the multimodal pipeline. The byte-level outputs of
  * the stub decoder are oracle-checked through DuckDB char arithmetic
  * (payloads are UTF-8 of ASCII text, so byte sums == ascii sums) —
  * proving the binary plumbing end to end; the rolling frame checksum is
  * pinned by MultimodalSpec goldens instead (not SQL-expressible).
  */
object MultimodalPack {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Binary metadata: media typing + payload sizes per type.
    "mm_binary_metadata" -> ((s, d) => {
      Multimodal.featuresDF(s, d)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy(col("media_type"))
    }),

    // Decoded (stub) feature rows: byte stats + frame-sampling counts.
    "mm_decode_features" -> ((s, d) => {
      Multimodal.featuresDF(s, d)
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("byte_sum"), round(col("mean_byte"), 6).as("mean_byte"),
          col("n_frames"), col("n_sampled"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling through the QUERY layer: every SampleEvery-th
    // FrameBytes-sized slice of the payload as its own row, with offset,
    // length, and content digest — the listing a downstream captioning /
    // embedding stage would consume. Pure per-row explode + slice (no
    // shuffle until the final order), so it distributes with the scan.
    // Payloads are UTF-8 of ASCII text, so the byte slices are checkable
    // as string slices in the DuckDB oracle.
    "mm_frame_sample" -> ((s, d) => {
      import graft.ops.TextHash.h28
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text"),
          ((length(col("text")) + (FB - 1)) / FB).cast("int").as("nf"))
        // nf = 0 (empty payload) must yield no frames: sequence(0, -1)
        // throws on illegal bounds, while the oracle's range(0, 0) is
        // simply empty — filter first so both engines agree.
        .filter(col("nf") > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), col("nf") - 1, lit(SE))).as("f"))
        .select(col("doc_id"), col("f").cast("long").as("f"),
          (col("f") * FB).cast("long").as("off"),
          length(col("text").substr(col("f") * FB + 1, lit(FB))).cast("long").as("frame_len"),
          h28(col("text").substr(col("f") * FB + 1, lit(FB))).as("frame_h"))
        .orderBy(col("doc_id"), col("f"))
    })
  )

  private val FB = Multimodal.FrameBytes
  private val SE = Multimodal.SampleEvery

  val oracle: Map[String, String] = Map(
    "mm_binary_metadata" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents)
        |SELECT media_type, COUNT(*) AS n_docs,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  MIN(n_bytes) AS min_bytes, MAX(n_bytes) AS max_bytes
        |FROM m GROUP BY media_type ORDER BY media_type""".stripMargin,

    "mm_decode_features" ->
      s"""WITH m AS (SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
         |    text, octet_length(encode(text)) AS n_bytes
         |  FROM documents),
         |b AS (SELECT doc_id, media_type, n_bytes,
         |    list_sum(list_transform(range(1, CAST(length(text) AS INT) + 1),
         |      i -> ascii(substr(text, i, 1)))) AS byte_sum
         |  FROM m)
         |SELECT doc_id, media_type, n_bytes, CAST(byte_sum AS BIGINT) AS byte_sum,
         |  round(byte_sum / CAST(n_bytes AS DOUBLE), 6) AS mean_byte,
         |  CAST((n_bytes + $FB - 1) // $FB AS INT) AS n_frames,
         |  CAST(((n_bytes + $FB - 1) // $FB + $SE - 1) // $SE AS INT) AS n_sampled
         |FROM b ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH m AS (SELECT doc_id, text,
         |    (length(text) + ${FB - 1}) // $FB AS nf
         |  FROM documents WHERE doc_id < 100),
         |fr AS (SELECT doc_id, text, unnest(range(0, nf, $SE)) AS f FROM m)
         |SELECT doc_id, f, f * $FB AS off,
         |  CAST(length(substr(text, f * $FB + 1, $FB)) AS BIGINT) AS frame_len,
         |  ${graft.ops.TextHash.h28Sql(s"substr(text, f * $FB + 1, $FB)")} AS frame_h
         |FROM fr ORDER BY doc_id, f""".stripMargin
  )
}
