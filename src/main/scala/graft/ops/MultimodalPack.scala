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

    // Image-text pair curation (the LAION-style gate): every image doc
    // paired with its caption text, then the standard keep gates —
    // caption token count in [5, 77] and a bytes-per-token ceiling —
    // with every dropped pair attributed to its FIRST failing gate.
    // Pure per-row projection + one tiny aggregation; the pair table
    // (not shown) is what a contrastive trainer consumes.
    "mm_caption_gate" -> ((s, d) => {
      val pairs = Multimodal.featuresDF(s, d)
        .filter(col("media_type") === "image")
        .join(Tables.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), col("n_bytes"),
          size(split(col("text"), " ")).as("cap_tokens"))
      pairs
        .select(
          when(col("cap_tokens") < 5, "caption_too_short")
            .when(col("cap_tokens") > 77, "caption_too_long")
            .when(col("n_bytes") > col("cap_tokens") * 12, "bytes_per_token")
            .otherwise("kept").as("gate"))
        .groupBy(col("gate")).agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("gate"))
    }),

    // Modality mix report — the byte/doc budget per (media_type, lang)
    // cell a multimodal training run balances on: one aggregation over
    // the typed media table joined to the document language, shares as
    // rounded divisions against the broadcast total.
    "mm_modality_mix" -> ((s, d) => {
      val m = Multimodal.featuresDF(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("media_type"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("bytes"))
      val tot = m.agg(sum(col("bytes")).as("tb"))
      m.crossJoin(broadcast(tot))
        .select(col("media_type"), col("lang"), col("n_docs"), col("bytes"),
          round(col("bytes").cast("double") / col("tb"), 6).as("byte_share"))
        .orderBy(col("media_type"), col("lang"))
    }),

    // Format census through the REGISTRY: every document synthesized
    // into a REAL encoded payload (doc_id mod 4 → BMP / PGM / WAV /
    // raw text, dims and content derived from the text), then counted
    // by what the registry's validated sniffs say the bytes are. The
    // query never looks at doc_id when classifying — a green oracle row
    // means no genuine payload was misrouted and no raw-text payload
    // false-positived into a codec. Per-row bounded work on the typed
    // Dataset path (the same mapPartitions boundary as
    // extractFeatures), so it distributes with the scan.
    "mm_format_census" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{BmpCodec, PnmCodec, WavCodec, RegistryMediaDecoder}
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val t = if (text == null) "" else text
          val w = (t.length % 7) + 2
          val payload = (id % 4) match {
            case 0 => BmpCodec.encode(w, 2,
              Array.tabulate(w * 2)(i => (t.length * 131 + i * 997) % 0x1000000))
            case 1 => PnmCodec.encodePgm(w, 2,
              Array.tabulate(w * 2)(i => (t.length + i) % 256))
            case 2 => WavCodec.encode(16000, 1,
              Array.tabulate(w * 2)(i => ((t.length * 31 + i * 7) % 65536 - 32768).toShort))
            case _ => t.getBytes("UTF-8")
          }
          RegistryMediaDecoder.formatOf(payload)
        }
        .toDF("format")
        .groupBy(col("format")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("format"))
    }),

    // AUDIO SPECTRAL features through the REAL codec (r9 verdict
    // stretch #8 — a feature family the image path doesn't share):
    // each document synthesizes a deterministic mono PCM clip
    // (s_i = (L·31 + i·7) mod 65536 − 32768, L = text length in CODE
    // POINTS — DuckDB's length() counts code points while Java
    // String.length counts UTF-16 code units, so codePointCount keeps
    // the two generators byte-identical on non-BMP text — one sample
    // per char capped at 400), round-trips it through
    // WavCodec.encode → decode, and computes zero-crossing count +
    // per-10ms-block energy (max and total) from the DECODED samples —
    // integer arithmetic end to end. The oracle replays the sample
    // GENERATOR in SQL, so a green row proves the codec round-trip is
    // bit-exact AND the spectral arithmetic agrees across engines.
    // Per-row bounded work on the typed path; distributes with the scan.
    "mm_audio_spectral" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.{WavCodec, WavMediaDecoder}
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .filter(r => r._2 != null && r._2.codePointCount(0, r._2.length) >= 2)
        .map { case (id, text) =>
          val L = text.codePointCount(0, text.length)
          val n = math.min(L, 400)
          val wav = WavCodec.encode(16000, 1,
            Array.tabulate(n)(i => ((L * 31 + i * 7) % 65536 - 32768).toShort))
          val (_, _, samples) = WavCodec.decode(wav)
          val (zc, maxBlk, tot) = WavMediaDecoder.spectral(samples, 1)
          (id, samples.length, zc, tot, maxBlk)
        }
        .toDF("doc_id", "n_samples", "zero_crossings", "total_energy",
          "max_block_energy")
        .withColumn("mean_energy",
          round(col("total_energy").cast("double") / col("n_samples"), 6))
        .orderBy(col("doc_id"))
    }),

    // FRAME-DELTA / MOTION ENERGY through the real codec — the
    // video-adjacent analog of mm_audio_spectral's spectral block: each
    // document synthesizes a MULTI-FRAME payload (2-4 same-dimension
    // PGM frames, pixel p_f(i) = (L·131 + f·17 + i·7) mod 256, L = text
    // length in code points, concatenated into one binary), splits it
    // back into frames (equal-size by construction — the container
    // manifest a real video format carries), decodes EVERY frame through
    // the registry-validated PGM codec, and computes per-consecutive-
    // pair motion energy Σ_i |p_f(i) − p_{f−1}(i)| from the DECODED
    // pixels — integer arithmetic end to end. The oracle replays the
    // pixel GENERATOR in SQL, so a green row proves the codec round-trip
    // is bit-exact per frame AND the motion arithmetic agrees across
    // engines. Per-row bounded typed work; distributes with the scan.
    "mm_frame_delta" -> ((s, d) => {
      import s.implicits._
      import graft.multimodal.PnmCodec
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .filter(_._2 != null)
        .map { case (id, text) =>
          val L = text.codePointCount(0, text.length)
          val w = (L % 7) + 2
          val h = 2
          val nf = 2 + (L % 3)
          val payload = Array.tabulate(nf) { f =>
            PnmCodec.encodePgm(w, h,
              Array.tabulate(w * h)(i => (L * 131 + f * 17 + i * 7) % 256))
          }.flatten
          val flen = payload.length / nf
          var tot = 0L
          var mx = 0L
          var prev: Array[Int] = null
          var f = 0
          while (f < nf) {
            val slice =
              java.util.Arrays.copyOfRange(payload, f * flen, (f + 1) * flen)
            val (_, _, _, px) = PnmCodec.decode(slice)
            if (prev != null) {
              var m = 0L
              var i = 0
              while (i < px.length) { m += math.abs(px(i) - prev(i)); i += 1 }
              tot += m
              if (m > mx) mx = m
            }
            prev = px
            f += 1
          }
          (id, nf.toLong, (w * h).toLong, tot, mx)
        }
        .toDF("doc_id", "n_frames", "n_pixels", "total_motion",
          "max_pair_motion")
        .withColumn("mean_pair_motion",
          round(col("total_motion").cast("double") /
            ((col("n_frames") - 1) * col("n_pixels")), 6))
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

    "mm_caption_gate" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |    len(string_split(text, ' ')) AS cap_tokens
        |  FROM documents WHERE doc_id % 2 = 0),
        |g AS (SELECT CASE WHEN cap_tokens < 5 THEN 'caption_too_short'
        |    WHEN cap_tokens > 77 THEN 'caption_too_long'
        |    WHEN n_bytes > cap_tokens * 12 THEN 'bytes_per_token'
        |    ELSE 'kept' END AS gate
        |  FROM p)
        |SELECT gate, COUNT(*) AS n_pairs FROM g
        |GROUP BY gate ORDER BY gate""".stripMargin,

    "mm_modality_mix" ->
      """WITH m AS (SELECT
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        |    lang, octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |a AS (SELECT media_type, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_bytes) AS BIGINT) AS bytes
        |  FROM m GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(bytes) AS BIGINT) AS tb FROM a)
        |SELECT media_type, lang, n_docs, bytes,
        |  round(CAST(bytes AS DOUBLE) / tb, 6) AS byte_share
        |FROM a, t ORDER BY media_type, lang""".stripMargin,

    // The oracle replays the CONSTRUCTION rule; the Spark side derives
    // the same labels by sniffing the actual encoded bytes.
    "mm_format_census" ->
      """SELECT CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'pnm'
        |    WHEN 2 THEN 'wav' ELSE 'stub' END AS format,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY format""".stripMargin,

    // Replays the sample GENERATOR (the Spark side recomputes the same
    // numbers from codec-decoded bytes — the round-trip is the check).
    "mm_audio_spectral" ->
      """WITH m AS (SELECT doc_id, length(text) AS L,
        |    CAST(least(length(text), 400) AS INT) AS n
        |  FROM documents WHERE text IS NOT NULL AND length(text) >= 2),
        |sm AS (SELECT doc_id, n,
        |    list_transform(range(0, n), i -> (L * 31 + i * 7) % 65536 - 32768) AS s
        |  FROM m),
        |f AS (SELECT doc_id, n,
        |    CAST(list_sum(list_transform(range(1, n), i ->
        |      CASE WHEN (s[i] < 0) != (s[i + 1] < 0) THEN 1 ELSE 0 END))
        |      AS BIGINT) AS zero_crossings,
        |    CAST(list_sum(list_transform(s, v -> CAST(v AS BIGINT) * v))
        |      AS BIGINT) AS total_energy,
        |    CAST(list_max(list_transform(range(0, (n + 159) // 160), b ->
        |      list_sum(list_transform(list_slice(s, b * 160 + 1,
        |        least((b + 1) * 160, n)), v -> CAST(v AS BIGINT) * v))))
        |      AS BIGINT) AS max_block_energy
        |  FROM sm)
        |SELECT doc_id, n AS n_samples, zero_crossings, total_energy,
        |  max_block_energy,
        |  round(CAST(total_energy AS DOUBLE) / n, 6) AS mean_energy
        |FROM f ORDER BY doc_id""".stripMargin,

    // Replays the pixel GENERATOR (the Spark side recomputes the same
    // numbers from codec-decoded frame bytes — the per-frame round-trip
    // is the check).
    "mm_frame_delta" ->
      """WITH m AS (SELECT doc_id, length(text) AS L,
        |    ((length(text) % 7) + 2) * 2 AS np,
        |    2 + (length(text) % 3) AS nf
        |  FROM documents WHERE text IS NOT NULL),
        |fr AS (SELECT doc_id, L, np, nf, unnest(range(1, nf)) AS f FROM m),
        |mo AS (SELECT doc_id, np, nf, f,
        |    CAST(list_sum(list_transform(range(0, np), i ->
        |      abs((L * 131 + f * 17 + i * 7) % 256
        |        - (L * 131 + (f - 1) * 17 + i * 7) % 256))) AS BIGINT) AS motion
        |  FROM fr),
        |a AS (SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |    CAST(np AS BIGINT) AS n_pixels,
        |    CAST(SUM(motion) AS BIGINT) AS total_motion,
        |    CAST(MAX(motion) AS BIGINT) AS max_pair_motion
        |  FROM mo GROUP BY 1, 2, 3)
        |SELECT doc_id, n_frames, n_pixels, total_motion, max_pair_motion,
        |  round(CAST(total_motion AS DOUBLE) / ((n_frames - 1) * n_pixels), 6)
        |    AS mean_pair_motion
        |FROM a ORDER BY doc_id""".stripMargin,

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
