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
    *
    * Replay safety: foreachBatch is at-least-once but `update()` is an
    * APPEND (non-idempotent), so a batch id at or below the last applied
    * one is skipped — a batch re-delivered after a sink/onUpdate failure
    * cannot double-append its rows (`current` only advances after a
    * successful update, so a retry of a batch that failed MID-update does
    * re-apply). `checkpoint` keeps batch ids monotonic across query
    * restarts; without it a restarted query re-reads the source from
    * scratch against the in-memory `fitted` you pass in, which is the
    * single-run-lifetime contract.
    */
  def attach(fitted: FittedMLForecast, stream: DataFrame,
             validateNewData: Boolean = false,
             checkpoint: Option[String] = None)
            (onUpdate: (Long, FittedMLForecast) => Unit): StreamingQuery = {
    var current = fitted
    var lastApplied = Long.MinValue
    val writer = stream.writeStream
      .outputMode("append")
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (batchId > lastApplied) {
          // micro-batch frames die with their epoch: pin the rows first
          val stable = batch.localCheckpoint()
          if (!stable.isEmpty) {
            current = current.update(stable, validateNewData)
            lastApplied = batchId
            onUpdate(batchId, current)
          }
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
