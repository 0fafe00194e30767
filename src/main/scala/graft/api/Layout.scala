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
  * in-partition sort, i.e. exactly one shuffle. For skewed or real-valued
  * keys, [[zorderBy]] first rank-normalizes each column to its quantile
  * bucket (one driver-side `approxQuantile` pass; the per-row bucket index
  * is a codegen'd comparison chain against the literal boundaries — no
  * per-column shuffle), which is the same move Delta's OPTIMIZE ZORDER
  * makes with `range_partition_id`.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative int
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure closed-form arithmetic, so any engine can re-derive it.
    * Equal to `zValueN(Seq(a, b), bits)`. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** n-ary Morton interleave of the low `bits` bits of each non-negative
    * integer-valued column: bit i of column j lands at position
    * `i * n + j` (the 2-column case reproduces the classic a-even/b-odd
    * layout). `n * bits` must fit a long's usable width. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zValueN needs >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62, s"$n cols x $bits bits exceeds long range")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1), i * n + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Quantile-bucket index of `c` against sorted `boundaries`: the count
    * of boundaries <= c, i.e. a rank-normalized value in
    * [0, boundaries.size]. A codegen'd sum of comparisons against literal
    * values — no UDF, no shuffle; NULLs deterministically land in bucket
    * 0. This is what makes the interleave meaningful for skewed or
    * real-valued keys, where raw bit patterns concentrate in a few
    * prefixes and the z-curve degenerates to a 1-D sort. */
  def rankBucket(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0).cast("long")) { (acc, b) =>
      acc + when(c.cast("double") >= lit(b), 1L).otherwise(0L)
    }

  /** Cluster `df` in Z-order of two non-negative integer-valued columns:
    * range-partition on the z-value into `numFiles` partitions and sort
    * within each — one shuffle; each output file covers a compact
    * rectangle of (aCol, bCol) space. Use [[zorderBy]] for skewed,
    * real-valued, or more-than-two keys. */
  def zorder(df: DataFrame, aCol: String, bCol: String,
      numFiles: Int, bits: Int = 16): DataFrame =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** Cluster `df` in Z-order of any >= 2 numeric columns, each first
    * rank-normalized to its `2^bits` quantile bucket, so skewed and
    * real-valued keys get equal-population buckets instead of degenerate
    * bit prefixes. One `approxQuantile` pass sizes the boundaries (error
    * << bucket width, driver-held: `2^bits - 1` doubles per column); the
    * layout itself stays one range-repartition shuffle + in-partition
    * sort. `bits` defaults to 6 (64 buckets/dim) — enough z granularity
    * to separate up to ~4096 files at 2 dims while keeping the generated
    * comparison chain small; raise it only alongside a larger `numFiles`.
    */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 6): DataFrame = {
    require(cols.size >= 2, "zorderBy needs >= 2 columns")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val eps = 1.0 / (4.0 * nBuckets)
    val boundaries = df.stat.approxQuantile(cols.toArray, probs, eps)
    val bucketCols = cols.zip(boundaries.toSeq).map { case (c, bs) =>
      rankBucket(col(c), bs.toSeq)
    }
    df.withColumn("__z", zValueN(bucketCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Compact a fragmented parquet table into ~`targetFileMB` files —
    * the small-file maintenance pass every long-lived 100 TB table needs
    * (a streaming or per-increment writer leaves thousands of KB-sized
    * files; scan planning and file-open overhead then dominate reads).
    *
    * File count is sized from the SOURCE's physical bytes (the sum of the
    * input file lengths — no data scan), so the only job is one
    * shuffle-free-when-possible rewrite: `coalesce` merges partitions
    * without an exchange. Pass `sortCol` to restore clustering while
    * compacting (then a range repartition replaces the coalesce — one
    * shuffle, same file count). Returns the number of files written. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileMB: Int = 256,
      sortCol: Option[String] = None): Int = {
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val fs = inP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place would be data loss: the source is read LAZILY, so the
    // overwrite of outPath would delete input files mid-scan. Compare
    // fully-qualified paths so "dir" vs "file:/.../dir" can't slip through.
    val inQ = fs.makeQualified(inP)
    val outQ = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    require(inQ != outQ, s"compact cannot rewrite in place: $inQ")
    // size from the DATA bytes only — a table dir also carries _SUCCESS,
    // checkpoint and metadata files that would inflate the file count
    val it = fs.listFiles(inP, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1, math.ceil(
      bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    val df = spark.read.parquet(inPath)
    val shaped = sortCol match {
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case None => df.coalesce(nFiles)
    }
    shaped.write.mode("overwrite").parquet(outPath)
    val out = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.getPath.getName.endsWith(".parquet"))
    out
  }
}
