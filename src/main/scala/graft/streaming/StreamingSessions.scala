package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the incremental face of
  * [[graft.operators.Sessions]]: native `session_window` grouping under an
  * event-time watermark. Sessions stay open in the state store while new
  * events keep arriving within `gap`; once the watermark passes a
  * session's horizon it is FINALIZED and emitted exactly once (Append
  * mode), and its state is dropped — state is bounded by the number of
  * concurrently-open sessions, not stream length.
  *
  * Semantics parity: a finalized session here equals the batch
  * `Sessions.sessionize` row over the same events — same membership
  * (split at diff ≥ gap), `start` = first event ts, `end` = last event
  * ts + gap (the native window horizon; batch `ts_end` is the last event
  * itself). Asserted in StreamingSessionsSpec.
  *
  * Scale shape: the keyed state shards across executors like all
  * session_window state; late events beyond the watermark are dropped by
  * the engine (counted in `numRowsDroppedByWatermark`).
  */
object StreamingSessions {

  /** Finalized (key, start, end, n_events) sessions for an event stream.
    * `tsCol` must be a timestamp column; `gap` and `watermark` are
    * duration strings ("30 seconds"). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"))
}
