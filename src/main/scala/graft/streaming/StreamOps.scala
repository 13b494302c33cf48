package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operators beyond the reference's surface — the pieces the
  * reference's own gap analysis wanted but its architecture couldn't give
  * (exactly-once-ish delivery, time-windowed processing): watermarked
  * tumbling-window aggregation and stateful within-watermark dedup.
  *
  * Both are incremental and state-bounded: the watermark caps state size,
  * so they run indefinitely at any input rate — the property that matters
  * when the topic feeds 100 TB/day.
  */
object StreamOps {

  /** Tumbling-window record counts + byte totals per topic, with a
    * watermark bounding state and handling late data. Output mode
    * append-compatible (the window closes when the watermark passes it).
    */
  def windowedTopicStats(records: DataFrame,
                         windowLength: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    records
      .withWatermark("timestamp", watermark)
      .groupBy(window(col("timestamp"), windowLength), col("topic"))
      .agg(
        count(lit(1)).as("record_cnt"),
        sum(length(col("value"))).as("value_bytes"),
        approx_count_distinct(col("key")).as("approx_keys"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("topic"), col("record_cnt"), col("value_bytes"), col("approx_keys"))

  /** At-least-once → effectively-once: drop re-delivered records by their
    * (topic, partition, offset) identity, keeping state only within the
    * watermark horizon. This is the dedup the reference's
    * commit-before-flush hole (SURVEY §2.1 S5) would have needed.
    */
  def dedupWithinWatermark(records: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    records
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("topic", "partition", "offset")
}
