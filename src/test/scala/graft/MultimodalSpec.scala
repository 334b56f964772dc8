package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, MediaFeatures}

/** Stub-decoder goldens (the rolling frame checksum has no SQL oracle)
  * and binary-column round-trip through the typed Dataset path. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub: hand-computed golden on a tiny payload") {
    // "abcd" = bytes 97 98 99 100 → one 16-byte frame, sampled.
    val f = Multimodal.decodeStub(MediaRow(7L, "image", "abcd".getBytes("UTF-8")))
    assert(f == MediaFeatures(7L, "image", 4L, 394L, 98.5, 1, 1,
      ((( (97L*31 + 98) *31 + 99) * 31 + 100) % 1000000007L)))
  }

  test("decodeStub: frame sampling takes every 4th frame") {
    val payload = Array.fill(16 * 9 + 1)(1.toByte)    // 10 frames
    val f = Multimodal.decodeStub(MediaRow(1L, "audio", payload))
    assert(f.n_frames == 10)
    assert(f.n_sampled == 3)                           // frames 0, 4, 8
  }

  test("binary payload survives the Dataset round trip intact") {
    val media = Multimodal.mediaTable(spark, sf()).collect()
    assert(media.nonEmpty)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    media.take(20).foreach { m =>
      assert(new String(m.payload, "UTF-8") == docs(m.doc_id))
    }
  }

  test("frame-sample listing agrees with the decoder's sampled-frame count") {
    import org.apache.spark.sql.functions._
    val listed = graft.ops.MultimodalPack.queries("mm_frame_sample")(spark, sf())
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decoded = Multimodal.featuresDF(spark, sf())
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("n_sampled"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(listed.nonEmpty)
    assert(listed == decoded)
  }

  test("extractFeatures is deterministic across runs") {
    val a = Multimodal.featuresDF(spark, sf()).collect().toSeq.sortBy(_.getLong(0))
    val b = Multimodal.featuresDF(spark, sf()).collect().toSeq.sortBy(_.getLong(0))
    assert(a == b)
  }
}
