package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as single operators: as-of (nearest-in-time
  * per key, the point-in-time lookup every feature/training pipeline
  * needs) and range (point-in-interval) joins.
  *
  * Both are formulated so the cost is ONE key-partitioned exchange, never
  * a per-key cross product:
  *
  *  - As-of union-merges the two sides and resolves the match with a
  *    single running window pass — the classic sort-merge as-of, expressed
  *    declaratively. A naive `l JOIN r ON key AND r.ts <= l.ts` +
  *    row_number explodes to |l|x|r| per key before pruning; this never
  *    materializes more than |l|+|r| rows.
  *  - Range join buckets time into fixed-width cells: points land in one
  *    cell, intervals explode onto the cells they overlap (|interval| /
  *    width + 1 rows, bounded by construction when callers pick width
  *    near the typical interval length), and the join is a plain
  *    equi-join on (key, cell) + an exact residual filter. Catalyst would
  *    otherwise plan the inequality join as BroadcastNestedLoop — a
  *    scale-killer on two large sides. Skewed cells fall under AQE's
  *    skew-join splitting like any other equi-join.
  */
object TemporalJoins {

  /** As-of join: attach to each left row the single nearest right row per
    * `key` — backward (latest right.ts <= left.ts) or forward (earliest
    * right.ts >= left.ts) — optionally within `toleranceSec`. Left rows
    * with no admissible match keep null payloads (left-outer semantics).
    *
    * Output: every left column, plus each `payloads` column from the
    * matched right row, plus `asof_ts` (matched right timestamp as epoch
    * seconds, double) — null when unmatched.
    *
    * Mechanics: tag and union both sides (right payloads boxed in a
    * struct so a null payload VALUE still counts as a match), one window
    * partitioned by key ordered by (ts, side) carrying the last-seen
    * right struct onto each left row. Rows with equal timestamps order
    * right-before-left, so an exactly-simultaneous right row matches in
    * both directions (inclusive bounds, DuckDB/pandas `merge_asof`
    * semantics). Multiple right rows at the SAME (key, ts) are
    * ambiguous — pre-aggregate the right side to make (key, ts) unique.
    *
    * Timestamps may be TIMESTAMP or numeric; both sides are compared as
    * epoch-second doubles (microsecond-exact: 2^53 > 1e15).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloads: Seq[String],
      direction: String = "backward",
      toleranceSec: Option[Double] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rStruct = struct(
      col(rightTs).cast("double").as("__rt") +: payloads.map(col): _*)
    val r2 = right.select(col(key), col(rightTs).cast("double").as("__t"),
      lit(0).as("__side"), rStruct.as("__r"))
    val l2 = left
      .withColumn("__t", col(leftTs).cast("double"))
      .withColumn("__side", lit(1))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val ord: Seq[Column] =
      if (direction == "backward") Seq(col("__t").asc, col("__side").asc)
      else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val withM = unioned.withColumn("__m", matchedRaw)
      .filter(col("__side") === 1)
    val inTol = toleranceSec match {
      case Some(tol) => abs(col("__t") - col("__m.__rt")) <= tol
      case None      => lit(true)
    }
    val m = when(col("__m").isNotNull && inTol, col("__m"))
    val out = withM
      .withColumn("asof_ts", m.getField("__rt"))
      .withColumns(payloads.map(p => p -> m.getField(p)).toMap)
    out.select(left.columns.map(col) ++ payloads.map(col) :+ col("asof_ts"): _*)
  }

  /** Range (point-in-interval) join: every (point, interval) pair with
    * matching `key` and `lo <= pt < hi` (or `<= hi` when `hiInclusive`).
    * Returns all point columns + all interval columns (names must be
    * disjoint). Each qualifying pair appears exactly once — a point's
    * single time cell meets each interval's exploded cell list at most
    * once, so no post-join dedup is needed.
    *
    * `bucketSec` trades explode factor (long intervals touch many cells)
    * against cell co-population (wide cells pair more non-matches to
    * filter); set it near the typical interval length. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      ptTs: String, loTs: String, hiTs: String, bucketSec: Long,
      hiInclusive: Boolean = false): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    val p2 = points
      .withColumn("__pt", col(ptTs).cast("double"))
      .withColumn("__cell", floor(col("__pt") / bucketSec).cast("long"))
    val i2 = intervals
      .withColumn("__lo", col(loTs).cast("double"))
      .withColumn("__hi", col(hiTs).cast("double"))
      .withColumn("__cell", explode(sequence(
        floor(col("__lo") / bucketSec).cast("long"),
        floor(col("__hi") / bucketSec).cast("long"))))
    val hiOk =
      if (hiInclusive) col("__pt") <= col("__hi") else col("__pt") < col("__hi")
    p2.join(i2, Seq(key, "__cell"))
      .filter(col("__pt") >= col("__lo") && hiOk)
      .drop("__pt", "__cell", "__lo", "__hi")
  }
}
