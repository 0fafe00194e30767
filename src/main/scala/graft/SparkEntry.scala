package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's demo query (one per
  * SURVEY.md §2 inventory line); `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's correctness gate. Column names, row order, and
  * float rounding are aligned between the Spark and DuckDB sides.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] =
    Seq(Relational, Scalar, Analytics, EventTime, TrainingData, Temporal,
      Curation, Extended, IOQueries, TpcDsQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape: pushdown filter + hash aggregate with map-side
    * partial aggregation. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_pushdown")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.entries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
