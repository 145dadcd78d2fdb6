package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time sessionization for streams — the Structured Streaming twin of
  * `operators.Sessions.sessionize`, built directly on Spark's native
  * `session_window` aggregation so the state store handles session growth,
  * merge and expiry (no custom state code to get wrong).
  *
  * Emits one row per CLOSED session (append mode): a session closes once
  * the watermark passes its end, i.e. `gap` beyond its last event. State
  * size tracks open sessions only — bounded by (active keys x watermark
  * horizon), never by stream length.
  *
  * Parity contract with the batch operator (asserted in StreamingSpec):
  * `session_window(ts, G)` extends each session as the half-open
  * [t, t + G), merging successors with strict `diff < G`, while the batch
  * `sessionize(gap)` merges `diff <= gap`. On an integral microsecond axis
  * the two coincide exactly for `G = gap + 1 microsecond` — choose the
  * string duration accordingly when mirroring a batch job.
  */
object StreamingSessions {

  /** Per-session aggregates over an event stream: keys, session_start,
    * session_end (= last event + gap), n_events. `tsCol` must be an
    * event-time timestamp; `gap` and `watermark` are duration strings
    * (e.g. "30 minutes").
    */
  def sessionAggStream(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: String,
      watermark: String): DataFrame = {
    require(keys.nonEmpty, "sessionAggStream needs at least one key")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(keys.map(col) :+ session_window(col(tsCol), gap).as("__sw"): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keys.map(col) ++ Seq(
        col("__sw.start").as("session_start"),
        col("__sw.end").as("session_end"),
        col("n_events")): _*)
  }
}
