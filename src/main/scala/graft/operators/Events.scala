package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over (user, timestamp) logs: gap-based
  * sessionization and per-session rollups.
  *
  * Scale shape: one shuffle on the user key (the window partition); the
  * running session index is a running sum inside each partition, and the
  * per-session rollup groups on (user, session) which is co-partitioned
  * with the window — Spark plans it without a second exchange. Skewed
  * power users are bounded by per-user event counts, not corpus size.
  */
object Events {

  /** Assign a session index per user: a new session starts when the gap
    * since the previous event exceeds `gapSeconds`. Microsecond-exact
    * (`unix_micros`), deterministic tie-break on `orderCols`.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long = 1800, orderCols: Seq[String] = Seq("event_id")): DataFrame = {
    val order = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val break = when(
      lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("__us", us)
      .withColumn("session_idx",
        sum(break).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count and duration (µs). */
  def sessionStats(sessions: DataFrame, userCol: String): DataFrame =
    sessions.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("__us")) - min(col("__us"))).as("duration_us"))
}
