package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: sessionization (gaps-and-islands) and
  * time-window aggregations. The streaming twins live in
  * [[graft.streaming.StreamOps]]; these batch forms are the oracle-checkable
  * semantics.
  */
object Events {

  /** Appends `session_id` (per-user ordinal): a new session starts after a
    * gap > `gapSeconds`. One shuffle on user_id; windows reuse it.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long = 1800, tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      (col(tsCol).cast("long") - prev.cast("long")) > gapSeconds, 1).otherwise(0)
    events.withColumn("__new_session", isNew)
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Per-user session summary: session count, avg events/session, avg and max
    * session duration (seconds).
    */
  def sessionStats(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", gapSeconds: Long = 1800): DataFrame = {
    val s = sessionize(events, userCol, tsCol, gapSeconds)
    val perSession = s.groupBy(col(userCol), col("session_id")).agg(
      count(lit(1)).as("n_events"),
      (max(col(tsCol)).cast("long") - min(col(tsCol)).cast("long")).as("dur_s"))
    perSession.groupBy(col(userCol)).agg(
      count(lit(1)).as("n_sessions"),
      avg(col("n_events")).as("avg_events"),
      avg(col("dur_s")).as("avg_duration_s"),
      max(col("dur_s")).as("max_duration_s"))
  }

  /** Tumbling-window counts/sums per event type (batch form of the streaming
    * windowed aggregation; `date_trunc` keys make it oracle-expressible).
    */
  def tumblingStats(events: DataFrame, tsCol: String = "ts",
      unit: String = "hour", typeCol: String = "event_type",
      valueCol: String = "value"): DataFrame =
    events.groupBy(date_trunc(unit, col(tsCol)).as("window_start"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Sliding daily-active style metric: distinct users per window. */
  def slidingDistinctUsers(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", window: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events.groupBy(org.apache.spark.sql.functions.window(col(tsCol), window, slide))
      .agg(countDistinct(col(userCol)).as("users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("users"))
}
