package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.api.TemporalJoins

/** Temporal join operators over the events stream table: as-of
  * (point-in-time nearest match) and range (point-in-interval) joins —
  * the feature-pipeline lookups Spark has no single operator for
  * (see [[graft.api.TemporalJoins]] for the one-exchange formulations).
  * DuckDB verifies j111 with its native ASOF JOIN and the others with
  * plain inequality joins — independent machinery on both sides. */
object Temporal extends QueryModule {

  // Backward as-of: each click attaches the user's latest prior-or-equal
  // purchase (value + how long ago). Left-outer: early clicks with no
  // prior purchase keep nulls.
  private def j111(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    // (key, ts) made unique so the match is well-defined on both engines
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(round(max("value"), 2).as("purchase_value"))
    TemporalJoins.asof(clicks, purchases, "user_id", "ts", "ts",
      Seq("purchase_value"), direction = "backward")
      .select(col("event_id"), col("user_id"), col("purchase_value"),
        round(col("ts").cast("double") - col("asof_ts"), 6).as("lag_sec"))
      .orderBy("event_id")
  }

  private val j111Sql =
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, round(max(value), 2) AS purchase_value
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, p.purchase_value,
      |  round(epoch(c.ts) - epoch(p.ts), 6) AS lag_sec
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY event_id""".stripMargin

  // Forward as-of with tolerance: seconds until the same user's next
  // error, but only within 6 hours — the "did the click precede a
  // failure" probe. Null when no error follows in time.
  private def j112(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy("user_id", "ts").agg(count(lit(1)).as("n_err"))
    TemporalJoins.asof(clicks, errors, "user_id", "ts", "ts", Seq(),
      direction = "forward", toleranceSec = Some(21600.0))
      .select(col("event_id"), col("user_id"),
        round(col("asof_ts") - col("ts").cast("double"), 6).as("err_lead_sec"))
      .orderBy("event_id")
  }

  private val j112Sql =
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |e AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'error')
      |SELECT c.event_id, c.user_id,
      |  round((SELECT min(epoch(e.ts) - epoch(c.ts)) FROM e
      |         WHERE e.user_id = c.user_id AND e.ts >= c.ts
      |           AND epoch(e.ts) - epoch(c.ts) <= 21600), 6) AS err_lead_sec
      |FROM c ORDER BY event_id""".stripMargin

  // Range join: views falling in each purchase's following 6-hour
  // window, same user — bucketed equi-join (cell width = window length),
  // counted per purchase including zero-view purchases.
  private def j113(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("lo_ts"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("hi_ts"))
    val matched = TemporalJoins.rangeJoin(views, purchases, "user_id",
      "view_ts", "lo_ts", "hi_ts", bucketSec = 21600L)
      .groupBy("purchase_id").agg(count(lit(1)).as("n_views"))
    purchases.select("purchase_id")
      .join(matched, Seq("purchase_id"), "left")
      .select(col("purchase_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"))
      .orderBy("purchase_id")
  }

  private val j113Sql =
    """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      |p AS (SELECT event_id AS purchase_id, user_id, ts AS lo,
      |        ts + INTERVAL 6 HOUR AS hi
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, CAST(count(v.ts) AS BIGINT) AS n_views
      |FROM p LEFT JOIN v
      |  ON v.user_id = p.user_id AND v.ts >= p.lo AND v.ts < p.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j111_asof_join_backward" -> j111,
    "j112_asof_join_forward_tolerance" -> j112,
    "j113_range_join_bucketed" -> j113)

  override val oracles: Map[String, String] = Map(
    "j111_asof_join_backward" -> j111Sql,
    "j112_asof_join_forward_tolerance" -> j112Sql,
    "j113_range_join_bucketed" -> j113Sql)
}
