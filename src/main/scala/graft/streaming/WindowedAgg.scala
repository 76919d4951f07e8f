package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation over an event stream — the
  * Structured Streaming twin of the declared batch query q17 (hourly
  * count/sum per event type).
  *
  * The watermark bounds state: windows older than (max event time − delay)
  * are finalized and dropped, so state size is O(active windows), not
  * O(stream length) — the only shape that survives an unbounded stream.
  * With `OutputMode.Append`, a window row is emitted exactly once, when the
  * watermark passes its end.
  *
  * Input must carry `ts: timestamp`, `event_type: string`, `value: double`.
  */
object WindowedAgg {

  def hourly(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .select(col("w.start").as("h"), col("event_type"), col("c"), col("v"))
}
