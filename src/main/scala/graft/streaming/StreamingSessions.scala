package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization — the Structured Streaming
  * counterpart of [[graft.operators.Events.sessionize]].
  *
  * Uses Spark's native `session_window` (merging session state in the
  * state store) rather than hand-rolled `flatMapGroupsWithState`: the
  * built-in operator gets watermark-driven state eviction, state-store
  * checkpointing, and session MERGING (late events can bridge two open
  * sessions into one) for free, which a custom state function would have
  * to reimplement. The same expression works on batch frames, so batch
  * backfills and the live stream share one definition.
  *
  * Scale shape: state is one open session struct per (user, session) —
  * bounded by the watermark horizon, not stream length; the shuffle key
  * is the user column.
  */
object StreamingSessions {

  /** Per-(user, session) rollups, finalized when the watermark passes the
    * session end. Append mode: each session is emitted exactly once, closed.
    */
  def streamingSessionStats(events: DataFrame, userCol: String, tsCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
