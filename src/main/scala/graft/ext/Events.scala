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

  /** Normalizes an event frame's `ts` column to TimestampType across the
    * physical encodings the driver testdata has shipped: TIMESTAMP(NANOS)
    * (surfaces as long under spark.sql.legacy.parquet.nanosAsLong=true —
    * truncated to micros) and TIMESTAMP_NTZ (micros, not UTC-adjusted; the
    * cast maps the naive wall-clock through the session timezone, which
    * every main/spec pins to UTC). Already-TimestampType frames pass
    * through untouched. NTZ must be normalized before any epoch arithmetic:
    * `cast(ts as bigint)` and `unix_micros(ts)` are both disallowed on NTZ.
    */
  def normalizeTs(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        events.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => events
    }

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

  /** Staged funnel analysis: for each user, the earliest occurrence of
    * stage 0, then the earliest stage 1 STRICTLY AFTER it, and so on —
    * the classic product-analytics sequence match. One shuffle on the user
    * key: every stage timestamp is a conditional-min window over the same
    * user partition (stage i's condition references stage i−1's column), and
    * the final count-per-stage is a single aggregation. Returns one row:
    * `n_<stage>` user counts plus `conv_<stage>` step conversion rates.
    */
  def funnel(events: DataFrame, stages: Seq[String], userCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val wu = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    stages.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s && col(tsCol) > col(s"__t${i - 1}")
      df = df.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(wu))
    }
    val perUserAggs = stages.indices.map(i => max(col(s"__t$i")).as(s"__t$i"))
    val perUser = df.groupBy(col(userCol)).agg(perUserAggs.head, perUserAggs.tail: _*)
    val countAggs = stages.zipWithIndex.map { case (s, i) =>
      count(col(s"__t$i")).as(s"n_$s")
    }
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    stages.zipWithIndex.drop(1).foldLeft(counts) { case (acc, (s, i)) =>
      acc.withColumn(s"conv_$s",
        when(col(s"n_${stages(i - 1)}") > 0,
          round(col(s"n_$s").cast("double") / col(s"n_${stages(i - 1)}"), 6)))
    }
  }

  /** Weekly cohort retention: users are assigned to the cohort of their
    * first-ever event week; a row (cohort_week, week_offset, n_users) counts
    * how many of each cohort's users were active k weeks later. Two shuffles
    * (cohort assignment on user; final count on cohort/offset) — the cohort
    * frame is small (one row per user) and broadcast into the activity join.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val week = (c: Column) => date_trunc("week", c)
    val cohorts = events.groupBy(col(userCol))
      .agg(week(min(col(tsCol))).as("cohort_week"))
    events.select(col(userCol), week(col(tsCol)).as("activity_week"))
      .join(broadcast(cohorts), userCol)
      .select(col(userCol), col("cohort_week"),
        floor(datediff(col("activity_week"), col("cohort_week")) / 7).as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Last-click attribution — the bounded-lookback as-of join: each purchase
    * is attributed to the user's LATEST click at most `windowSeconds` before
    * it. Computed WITHOUT a join: clicks and purchases union into one
    * per-user ordered window pass (max of click-micros over preceding rows),
    * so there is exactly ONE shuffle on the user key and no click×purchase
    * row blowup — at 100 TB the interval-join formulation explodes on heavy
    * clickers while this stays linear. Timestamp math is integer
    * microseconds (`unix_micros`), exactly replayable by an external engine.
    *
    * Ordering note: rows order by (ts, event_id); a click with the same
    * timestamp as the purchase would attribute only if its event_id sorts
    * first. The events fixture has globally unique (user_id, ts), so the
    * edge cannot fire there (the q51 oracle relies on this).
    *
    * Returns one row per purchase: (event_id, user_id, ts, value,
    * click_us nullable, delay_s nullable).
    */
  def lastClickAttribution(events: DataFrame, windowSeconds: Long = 600,
      clickType: String = "click", purchaseType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value"): DataFrame = {
    val typed = events.filter(col(typeCol).isin(clickType, purchaseType))
      .select(col("event_id"), col(userCol), col(tsCol), col(valueCol), col(typeCol),
        when(col(typeCol) === clickType, unix_micros(col(tsCol))).as("__cus"))
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    typed.withColumn("__last_click_us", max(col("__cus")).over(w))
      .filter(col(typeCol) === purchaseType)
      .withColumn("click_us",
        when(col("__last_click_us") >=
          unix_micros(col(tsCol)) - lit(windowSeconds * 1000000L),
          col("__last_click_us")))
      .select(col("event_id"), col(userCol), col(tsCol), col(valueCol),
        col("click_us"),
        ((unix_micros(col(tsCol)) - col("click_us")) / lit(1e6)).as("delay_s"))
  }

  /** Sliding daily-active style metric: distinct users per window. */
  def slidingDistinctUsers(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id", window: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events.groupBy(org.apache.spark.sql.functions.window(col(tsCol), window, slide))
      .agg(countDistinct(col(userCol)).as("users"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("users"))
}
