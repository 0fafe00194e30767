package graft.api

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline metrics (reference sdk/metrics/Metrics.java:55-95 — Counter,
  * Distribution, Gauge, queryable from PipelineResult) on Spark's
  * `observe()` API.
  *
  * `observe` attaches named aggregate expressions to a plan node; they are
  * computed inside the existing job (no extra pass, accumulator-backed —
  * the same mechanism as Beam's metrics, which are also accumulator
  * reports) and read from the `Observation` handle after an action.
  */
object Metrics {

  /** Counter ≙ observed count of rows (optionally matching a predicate). */
  def counter(df: DataFrame, obs: Observation, pred: Column = lit(true)): DataFrame =
    df.observe(obs, count(when(pred, 1)).as("count"))

  /** Distribution ≙ observed min/max/sum/count of an expression. */
  def distribution(df: DataFrame, obs: Observation, value: Column): DataFrame =
    df.observe(obs,
      count(value).as("count"), sum(value).as("sum"),
      min(value).as("min"), max(value).as("max"))

  /** Gauge ≙ latest observed value by an ordering column. */
  def gauge(df: DataFrame, obs: Observation, value: Column, orderBy: Column): DataFrame =
    df.observe(obs, max_by(value, orderBy).as("gauge"))
}
