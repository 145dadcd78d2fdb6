package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.forecast.FittedMLForecast

/** Structured Streaming facade over the batch-incremental `update()` —
  * SURVEY §2.11: the reference has no streaming runtime, its incremental
  * surface IS append-only micro-batching with strict validation, which maps
  * 1:1 onto foreachBatch. Each micro-batch is materialized (the batch frame
  * is only valid within its epoch), appended via `update()` (same
  * strict-start / pooled-completeness semantics — late or gapped data is
  * rejected, not tolerated), and the refreshed fitted state is handed to
  * the caller for scoring/sinking.
  */
object StreamingUpdate {

  /** Attach a streaming source of panel rows (same columns as the fitted
    * panel) to a fitted pipeline. `onUpdate(batchId, fitted)` fires after
    * each non-empty batch with the refreshed state.
    */
  def attach(fitted: FittedMLForecast, stream: DataFrame,
             validateNewData: Boolean = false)
            (onUpdate: (Long, FittedMLForecast) => Unit): StreamingQuery = {
    var current = fitted
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // micro-batch frames die with their epoch: pin the rows first
        val stable = batch.localCheckpoint()
        if (!stable.isEmpty) {
          current = current.update(stable, validateNewData)
          onUpdate(batchId, current)
        }
        ()
      }
      .start()
  }

  /** Event stream → daily activity panel with event-time watermarking: the
    * streaming twin of `Panels.eventsDaily` (tumbling 1-day windows; late
    * events beyond the watermark are dropped, matching update()'s
    * no-late-data contract).
    */
  def eventPanelStream(events: DataFrame, userCol: String, tsCol: String,
                       valueCol: String, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol).as("unique_id"),
        window(col(tsCol), "1 day").as("__w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("y"))
      .select(col("unique_id"), col("__w.start").cast("date").as("ds"),
        col("n_events"), col("y"))
}
