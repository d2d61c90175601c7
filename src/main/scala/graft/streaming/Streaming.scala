package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.8). The reference is pure batch;
  * these expose the batch operators' streaming analogs so the same W1
  * tumbling-window semantics run incrementally: `readStream` → transform →
  * `writeStream` with event-time watermarks. The tumbling aggregation is
  * written against `window()`, so the identical code path serves batch
  * DataFrames too.
  */
object Streaming {

  /** W1-as-stream: tumbling event-time counts + mean per key with a
    * watermark bounding state. Works on both batch and streaming frames.
    */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean_value"))

  /** Running (cumulative) per-key aggregate — the streaming analog of the
    * reference's partial_fit scaler accumulation (A10): counts/sums update
    * incrementally per micro-batch.
    */
  def runningStats(events: DataFrame, keyCol: String): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
}
