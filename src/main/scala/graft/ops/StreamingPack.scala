package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Streaming pack: the windowed event aggregation executed as an actual
  * Structured Streaming query (file source → watermark + tumbling window
  * → memory sink, Trigger.AvailableNow) whose final result is checked
  * against the SAME DuckDB oracle as the batch twin — the stream must
  * converge to the batch answer.
  */
object StreamingPack {
  type Q = (SparkSession, String) => DataFrame

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  val queries: Map[String, Q] = Map(
    "stream_window_counts" -> ((s, d) => {
      val name = s"graft_stream_wc_${counter.incrementAndGet()}"
      val res = StreamOps.runToMemory(s,
        StreamOps.windowCounts(StreamOps.eventsStream(s, d)), name)
      res.orderBy(col("window_start_us"), col("event_type"))
    }),

    // Native session_window sessionization run as a stream, rolled up to
    // the batch events_sessionize shape — stream must equal batch.
    "stream_sessionize" -> ((s, d) => {
      val name = s"graft_stream_sess_${counter.incrementAndGet()}"
      val sess = StreamOps.runToMemoryComplete(s,
        StreamOps.sessionize(StreamOps.eventsStream(s, d)), name)
      StreamOps.sessionRollup(sess, EventsPack.GapUs)
        .orderBy(col("user_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    // Same oracles as the batch twins: streaming must equal batch.
    "stream_window_counts" -> EventsPack.oracle("events_window_counts"),
    "stream_sessionize"    -> EventsPack.oracle("events_sessionize")
  )
}
