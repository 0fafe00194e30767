package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column row/null/distinct counts and min/max in
  * ONE pass over the data — the validate-before-training step (and the
  * engine-side answer to "ANALYZE TABLE" for data quality, not just CBO
  * stats).
  *
  * All per-column aggregates ride a single wide `agg(...)` projection,
  * so a 100 TB profile is one scan with map-side partial aggregation;
  * the per-column pivot happens on the single result row. Distinct
  * counts default to `approx_count_distinct` (HLL, mergeable, constant
  * state) — the only sane choice at scale; `exactDistinct = true`
  * switches to exact `count(DISTINCT)` (Spark plans the multi-distinct
  * Expand) for small tables and for oracle verification.
  *
  * Output: one row per profiled column —
  * `(column, n_rows, n_null, n_distinct, min_val, max_val)`, min/max
  * computed on the NATIVE type (numeric min, not string min) and then
  * rendered to strings so heterogeneous columns share a schema.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").cast("long").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }
}
