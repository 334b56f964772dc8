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
    })
  )

  val oracle: Map[String, String] = Map(
    // Same oracle as events_window_counts: streaming must equal batch.
    "stream_window_counts" -> EventsPack.oracle("events_window_counts")
  )
}
