package graft.api

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** The reference's CombineFn surface (transforms/Combine.java:398-424:
  * createAccumulator / addInput / mergeAccumulators / extractOutput)
  * adapted 1:1 onto Spark's `Aggregator[IN, BUF, OUT]`.
  *
  * Catalyst lifts every Aggregator into partial (map-side) + final
  * aggregation automatically — the reference's combiner lifting
  * (beam_runner_api.proto:375-401) — so a CombineFn written against this
  * API shuffles only accumulators, never raw rows. `withHotKeyFanout`
  * (Combine.java:1550) needs no analog: two-level partial aggregation plus
  * AQE skew handling gives the same hot-key relief without user hints.
  */
object Combine {

  /** Build an Aggregator from the four CombineFn methods. */
  def combineFn[I, A, O](
      createAccumulator: () => A,
      addInput: (A, I) => A,
      mergeAccumulators: (A, A) => A,
      extractOutput: A => O)(
      implicit bufEnc: Encoder[A], outEnc: Encoder[O]): Aggregator[I, A, O] =
    new Aggregator[I, A, O] {
      override def zero: A = createAccumulator()
      override def reduce(acc: A, in: I): A = addInput(acc, in)
      override def merge(a: A, b: A): A = mergeAccumulators(a, b)
      override def finish(acc: A): O = extractOutput(acc)
      override def bufferEncoder: Encoder[A] = bufEnc
      override def outputEncoder: Encoder[O] = outEnc
    }

  /** Register a CombineFn as a SQL aggregate (≙ Beam UdafImpl /
    * `CREATE AGGREGATE FUNCTION`): usable from both the DataFrame API
    * (`expr("name(col)")`) and `spark.sql`. */
  def register[I: TypeTag, A, O](
      spark: SparkSession, name: String, agg: Aggregator[I, A, O]): Unit =
    spark.udf.register(name, functions.udaf(agg))
}
