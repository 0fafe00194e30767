package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** The dataflow DSL: Beam-capability operators as extension methods on
  * DataFrame/Dataset. Each method maps a reference transform (SURVEY.md §2)
  * onto the declarative Spark op Catalyst can optimize — the DSL adds no
  * execution machinery of its own, which is the point: predicate pushdown,
  * column pruning, combiner lifting, broadcast selection and AQE all apply
  * to DSL pipelines for free.
  *
  * Reference mapping (file refs are into /root/reference):
  *  - MapElements/FlatMapElements/Filter (transforms/MapElements.java …)
  *      → mapElements / flatMapElements / filterBy
  *  - ParDo with setup/bundle semantics (transforms/ParDo.java:1081)
  *      → parDo (mapPartitions: per-partition setup ≙ @Setup/@StartBundle)
  *  - Flatten (transforms/Flatten.java) → flattenWith
  *  - Partition (transforms/Partition.java) → partitionInto
  *  - Keys/Values/KvSwap/WithKeys (transforms/{Keys,…}.java) → same names
  *  - WithTimestamps (transforms/WithTimestamps.java) → withEventTime
  *  - Reshuffle (transforms/Reshuffle.java:49) → reshuffle (repartition;
  *    Spark has no fusion to break — stages already materialize at shuffles)
  *  - WithFailures (transforms/WithFailures.java) → withFailures (try_*
  *    expression + tag-split; exceptions can't cross rows in codegen'd
  *    expressions, so failure routing is null-signalled, not thrown)
  *  - multi-output ParDo (PCollectionTuple) → tagged + split
  */
object Dataflow {

  implicit class GraftFrameOps(private val df: DataFrame) extends AnyVal {

    /** MapElements: pure column projection (stays in codegen). */
    def mapElements(cols: Column*): DataFrame = df.select(cols: _*)

    /** Filter.by. */
    def filterBy(cond: Column): DataFrame = df.filter(cond)

    /** FlatMapElements via a generator column (explode/inline). */
    def flatMapElements(generator: Column, as: String): DataFrame =
      df.select(col("*"), explode(generator).as(as))

    /** ParDo escape hatch: per-partition imperative logic. `setup` runs
      * once per partition (≙ DoFn @Setup/@StartBundle), the returned
      * iterator streams (≙ @ProcessElement per element, constant memory).
      * Use ONLY when no expression composition works — this exits codegen. */
    def parDo[O: Encoder](setup: () => Row => IterableOnce[O]): Dataset[O] =
      df.mapPartitions { it =>
        val process = setup()
        it.flatMap(process)
      }

    /** Flatten (UNION ALL, bag semantics) of this plus `others`. */
    def flattenWith(others: DataFrame*): DataFrame =
      others.foldLeft(df)((a, b) => a.unionByName(b, allowMissingColumns = true))

    /** Partition: split into n outputs by a partition-index expression.
      * The parent is cached so the n branches share one upstream compute. */
    def partitionInto(n: Int, indexExpr: Column): Seq[DataFrame] = {
      val tagged = df.withColumn("__part", indexExpr).cache()
      (0 until n).map(i => tagged.filter(col("__part") === i).drop("__part"))
    }

    /** WithKeys: designate key columns (KV<K,V> ≙ key struct + rest). */
    def withKeys(first: String, rest: String*): DataFrame =
      df.withColumn("key", struct((first +: rest).map(col): _*))

    /** Keys / Values / KvSwap over a two-column (key, value) frame. */
    def keys: DataFrame = df.select(col("key"))
    def values: DataFrame = df.select(col("value"))
    def kvSwap: DataFrame =
      df.select(col("value").as("key"), col("key").as("value"))

    /** WithTimestamps: designate the event-time column. */
    def withEventTime(ts: Column): DataFrame = df.withColumn("event_time", ts)

    /** Reshuffle: redistribute into `n` partitions (checkpoint/stable-input
      * semantics are Spark-native at every shuffle boundary). */
    def reshuffle(n: Int): DataFrame = df.repartition(n)

    /** WithFailures: attempt a fallible expression; rows where it yields
      * null (use try_* expressions: try_cast, try_divide, try_to_timestamp…)
      * while `inputOk` holds are routed to the failure output with the
      * original row preserved. Returns (successes-with-result, failures). */
    def withFailures(attempt: Column, as: String, inputOk: Column): (DataFrame, DataFrame) = {
      val tagged = df.withColumn(as, attempt).cache()
      val ok = tagged.filter(col(as).isNotNull || !inputOk)
      val failed = tagged.filter(col(as).isNull && inputOk).drop(as)
      (ok, failed)
    }

    /** Multi-output ParDo: one pass computes a tag column; split lazily. */
    def taggedOutputs(tag: Column, tags: Seq[String]): Map[String, DataFrame] = {
      val tagged = df.withColumn("__tag", tag).cache()
      tags.map(t => t -> tagged.filter(col("__tag") === t).drop("__tag")).toMap
    }
  }
}
