package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries: each entry pairs a Spark
  * implementation with (where SQL-expressible) an equivalent DuckDB oracle
  * over the same parquet tables. Column names and row order are made to
  * match exactly in both engines; floating aggregates are rounded on both
  * sides to absorb summation-order differences. */
trait QueryModule {
  def entries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
