package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional locality: Z-order (Morton)
  * clustering — the lakehouse technique for making file/row-group min-max
  * statistics selective on MORE THAN ONE column at once.
  *
  * A 100 TB table sorted by `a` skips files for predicates on `a` but
  * reads everything for predicates on `b`. Writing in Z-order of (a, b)
  * interleaves the bits of both keys, so consecutive rows are close in
  * BOTH dimensions; each file's (min, max) bounding box becomes a small
  * rectangle and the scan planner's stats-based pruning works for either
  * predicate. Same math as the public Delta/Iceberg OPTIMIZE ZORDER.
  *
  * The z-value is a pure codegen'd column expression (shift/mask/or terms
  * — no UDF); the layout pass is one range repartition on z (sampled
  * range boundaries, the same machinery as a global sort) plus an
  * in-partition sort, i.e. exactly one shuffle.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative int
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure closed-form arithmetic, so any engine can re-derive it. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    (0 until bits).map { i =>
      (shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` in Z-order of two non-negative integer-valued columns:
    * range-partition on the z-value into `numFiles` partitions and sort
    * within each — one shuffle; each output file covers a compact
    * rectangle of (aCol, bCol) space. For skewed/real-valued keys,
    * normalize to ranks or fixed-width buckets first. */
  def zorder(df: DataFrame, aCol: String, bCol: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
