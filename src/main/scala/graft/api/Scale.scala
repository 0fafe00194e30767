package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns: hot-key mitigation and co-located (exchange-free)
  * joins. The reference's only skew tool is Combine.withHotKeyFanout
  * (transforms/Combine.java:1550 — pre-aggregate hot keys across N
  * synthetic sub-keys); these are the Spark-native equivalents, plus the
  * bucketing pattern Beam has no analog for.
  */
object Scale {

  /** Salted two-level aggregation (≙ withHotKeyFanout): aggregate on
    * (key, salt) first — spreading a hot key over `fanout` reducers —
    * then combine the partials. Correct for any associative+commutative
    * aggregate pair (partial, combine). Spark's map-side partial
    * aggregation already handles moderate skew; use this when single keys
    * exceed one reducer's capacity.
    *
    * @param partials (aggName → partial agg expr over the raw rows)
    * @param combines (aggName → final combine expr over the partials)
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], fanout: Int,
      partials: Seq[(String, Column)], combines: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(fanout)))
    val partial = salted.groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(combines.head._2.as(combines.head._1),
        combines.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted join for a skewed fact side: replicate each dimension row
    * `fanout` times (one per salt) and salt the fact rows randomly, so a
    * hot join key spreads over `fanout` tasks. Equi-join semantics are
    * preserved exactly; dimension bytes grow by `fanout` (keep it small,
    * or prefer broadcast when the dimension fits). AQE's skew-join
    * handling does this adaptively at runtime — this is the explicit
    * form for when sizes are known ahead. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fanout: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()), lit(fanout)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(fanout - 1)).cast("array<long>")))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }

  /** Write a table bucketed+sorted by join key: two tables bucketed the
    * same way join WITHOUT any exchange (co-located sort-merge join) —
    * the foundation of repeated large-scale joins on the same key. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Pre-shuffle both sides of a repeated join key once (exchange reuse
    * within a job): repartition on the key so downstream joins/aggs on
    * that key reuse the partitioning instead of re-exchanging. */
  def coPartition(spark: SparkSession, dfs: Seq[DataFrame], key: String,
      partitions: Int): Seq[DataFrame] =
    dfs.map(_.repartition(partitions, col(key)))
}
