package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-time windowing (SURVEY.md §2.9) exercised in batch mode — the
  * window *assignment* semantics are identical for bounded and unbounded
  * data (the reference's core design point: boundedness is a property of
  * the collection, not the API — values/PCollection.java:228). The same
  * `window()`/`session_window()` expressions drive the streaming path
  * (graft.streaming) with watermarks.
  *
  * Reference: FixedWindows.java (tumbling), SlidingWindows.java,
  * Sessions.java + MergeOverlappingIntervalWindows.java (gap merging),
  * CalendarWindows.java, Distinct.java:84 (representative-value dedup).
  *
  * Oracle notes: DuckDB's time_bucket aligns multi-day buckets to
  * 2000-01-01 while Spark's window() aligns to the 1970 epoch — oracles
  * use explicit epoch arithmetic (make_timestamp) instead. Session windows
  * are reproduced in SQL with the classic gaps-and-islands construction.
  */
object EventTime extends QueryModule {

  // FixedWindows (tumbling, 1 day): window struct column ≙ per-window GBK.
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total"))
      .orderBy("win_start", "event_type")

  private val q50Sql =
    """SELECT make_timestamp((CAST(epoch(ts) AS BIGINT) // 86400) * 86400 * 1000000) AS win_start,
      |  make_timestamp(((CAST(epoch(ts) AS BIGINT) // 86400) + 1) * 86400 * 1000000) AS win_end,
      |  event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type""".stripMargin

  // SlidingWindows (size 2 days, period 1 day): every event lands in 2
  // overlapping windows; assignment duplicates rows *before* the shuffle
  // (same as Beam's WindowFn.assignWindows fan-out).
  private def q51(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("win_start"), col("n"), col("n_users"))
      .orderBy("win_start")

  private val q51Sql =
    """WITH assigned AS (
      |  SELECT make_timestamp(((CAST(epoch(ts) AS BIGINT) // 86400) - k) * 86400 * 1000000) AS win_start,
      |    user_id
      |  FROM events, (SELECT unnest([0, 1]) AS k))
      |SELECT win_start, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM assigned GROUP BY win_start ORDER BY win_start""".stripMargin

  // Sessions (gap 1 hour, per user): session_window merges events closer
  // than the gap — DuckDB oracle rebuilds sessions via gaps-and-islands.
  // Spark's session end = last event + gap.
  private def q52(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("session_value"))
      .orderBy("user_id", "sess_start")

  private val q52Sql =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              <= INTERVAL 1 HOUR THEN 0 ELSE 1 END AS new_sess
      |  FROM events),
      |sessions AS (
      |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM marked)
      |SELECT min(ts) AS sess_start, max(ts) + INTERVAL 1 HOUR AS sess_end,
      |  user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS session_value
      |FROM sessions GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  // CalendarWindows (month): civil-time windows via date_trunc.
  private def q53(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("month", col("ts")).as("month_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("month_start", "event_type")

  private val q53Sql =
    """SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
      |  event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(value), 4) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY month_start, event_type""".stripMargin

  // Deduplicate with a representative value (Distinct.withRepresentativeValueFn,
  // Deduplicate.java keyed TTL analog in batch): keep the earliest event per
  // (user, type) — deterministic, unlike dropDuplicates' arbitrary winner.
  private def q54(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min_by(col("event_id"), col("ts")).as("kept_event_id"), // ts unique per key in this data
        min(col("ts")).as("first_ts"),
        count(lit(1)).as("n_dups"))
      .orderBy("user_id", "event_type")

  private val q54Sql =
    """SELECT user_id, event_type,
      |  arg_min(event_id, ts) AS kept_event_id,
      |  min(ts) AS first_ts,
      |  CAST(count(*) AS BIGINT) AS n_dups
      |FROM events GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  // Tumbling hourly windows keyed by hour-of-day: the "histogram over
  // event time" pattern (processing-time-free — reproducible on replay).
  private def q55(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 2).as("purchase_value"))
      .orderBy("hour_of_day")

  private val q55Sql =
    """SELECT CAST(hour(ts) AS INT) AS hour_of_day, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value
      |FROM events GROUP BY 1 ORDER BY hour_of_day""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_tumbling_window" -> q50,
    "q51_sliding_window" -> q51,
    "q52_session_window" -> q52,
    "q53_calendar_window" -> q53,
    "q54_dedup_representative" -> q54,
    "q55_hour_histogram" -> q55)

  override val oracles: Map[String, String] = Map(
    "q50_tumbling_window" -> q50Sql,
    "q51_sliding_window" -> q51Sql,
    "q52_session_window" -> q52Sql,
    "q53_calendar_window" -> q53Sql,
    "q54_dedup_representative" -> q54Sql,
    "q55_hour_histogram" -> q55Sql)
}
