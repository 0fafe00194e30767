package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.api.Layout

/** Z-order layout contracts: the n-ary interleave closed form, the
  * rank-bucket normalization for skewed/real-valued keys, and — the point
  * of the whole exercise — that parquet row-group min/max pruning
  * actually skips data under a point predicate on EITHER dimension of a
  * z-ordered table, where a 1-D sorted layout only skips on its own sort
  * key.
  */
class LayoutSpec extends GraftSpec {
  import spark.implicits._

  test("n-ary interleave closed form and 2-ary compatibility") {
    val one = spark.range(1)
    // (a=0b11, b=0b101, c=0b010), 3 bits: bit i of col j -> position 3i+j
    // a bits (1,1,0) -> pos 0,3,6 ; b bits (1,0,1) -> pos 1,4,7 ;
    // c bits (0,1,0) -> pos 2,5,8  => set {0,1,3,5,7} = 0b010101011 = 0xAB
    val z3 = one.select(
      Layout.zValueN(Seq(lit(3), lit(5), lit(2)), 3).as("z")).head().getLong(0)
    assert(z3 == 0xABL, s"got ${z3.toBinaryString}")
    // 2-ary zValueN must equal the published zValue layout (a even, b odd)
    val pair = one.select(
      Layout.zValue(lit(3), lit(5), 3).as("z2"),
      Layout.zValueN(Seq(lit(3), lit(5)), 3).as("zn")).head()
    assert(pair.getLong(0) == 0x27L && pair.getLong(1) == 0x27L)
  }

  test("rankBucket: equal-population buckets on skewed keys, nulls to 0") {
    // power-law key: raw bit interleave would put ~everything in one
    // prefix; quantile buckets must spread it evenly
    val skewed = spark.range(10000)
      .select((col("id") * col("id") * col("id")).cast("double").as("w"))
    val probs = (1 until 8).map(_ / 8.0).toArray
    val bounds = skewed.stat.approxQuantile("w", probs, 0.001).toSeq
    val counts = skewed.select(Layout.rankBucket(col("w"), bounds).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until 8L).toSet, s"buckets ${counts.keySet}")
    assert(counts.values.min > 800 && counts.values.max < 1700,
      s"bucket populations skewed: $counts")
    val nullBucket = Seq[Option[Double]](None).toDF("w")
      .select(Layout.rankBucket(col("w"), bounds).as("b")).head().getLong(0)
    assert(nullBucket == 0L)
  }

  /** Rows the parquet scan emitted AFTER pushed-filter row-group/page
    * pruning (the Filter node re-applies the predicate above it, so scan
    * output < total rows proves stats-based skipping happened). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    leaves.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("z-ordered parquet skips row groups under point predicates on every dim") {
    val n = 100000L
    // two INDEPENDENT uniform int dims (hash-scrambled — (id*k) % m is a
    // pure function of id % m and would let a 1-D sort prune both) + one
    // power-law real dim (the zorderBy case)
    val base = spark.range(n).select(
      col("id"),
      (col("id") % 1000).as("x"),
      pmod(hash(col("id")), lit(1000)).as("y"),
      (pow(pmod(hash(col("id") + 500000), lit(1000)), 3.0) / 1000.0).as("w"))
    val dir = Files.createTempDirectory("graft-layout").toFile
    dir.deleteOnExit()
    val zPath = dir.getAbsolutePath + "/zorder"
    val sortedPath = dir.getAbsolutePath + "/sorted_x"
    // small row groups so one 32-partition write yields many prunable
    // groups per file (default 128MB groups would put all 100k rows in one)
    val writerOpts = Map("parquet.block.size" -> (64 * 1024).toString)
    Layout.zorderBy(base, Seq("x", "y", "w"), numFiles = 32, bits = 5)
      .write.options(writerOpts).mode("overwrite").parquet(zPath)
    base.repartitionByRange(32, col("x")).sortWithinPartitions("x")
      .write.options(writerOpts).mode("overwrite").parquet(sortedPath)

    val z = spark.read.parquet(zPath)
    val sorted = spark.read.parquet(sortedPath)
    val total = z.count()
    assert(total == n)

    // point predicates on each dimension; w gets a tight range around a
    // high-quantile value (real-valued keys have no exact point)
    val px = col("x") === 173
    val py = col("y") === 411
    val pw = col("w").between(600000.0, 610000.0)
    for ((pred, name) <- Seq((px, "x"), (py, "y"), (pw, "w"))) {
      val scanned = scannedRows(z.filter(pred))
      assert(scanned < total / 2,
        s"z-order scan on $name read $scanned of $total rows - no pruning")
    }
    // control: the x-sorted layout prunes on x but NOT on y — the failure
    // mode z-order exists to fix
    assert(scannedRows(sorted.filter(px)) < total / 2)
    assert(scannedRows(sorted.filter(py)) > (total * 3) / 4,
      "x-sorted layout unexpectedly pruned on y; control is broken")
  }

  test("zorderBy boxes stay compact in all three dims vs 1-D sort") {
    val n = 50000L
    val base = spark.range(n).select(
      (col("id") % 500).as("x"),
      ((col("id") * 7919) % 500).as("y"),
      (pow(col("id") % 500, 3.0)).as("w"))
    def avgNormRange(df: DataFrame, c: String, span: Double): Double = {
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(((max(c) - min(c)) / span).as("r"))
        .agg(avg("r")).head().getDouble(0)
    }
    val z = Layout.zorderBy(base, Seq("x", "y", "w"), numFiles = 27, bits = 5)
      .cache()
    z.count()
    val sorted = base.repartitionByRange(27, col("x")).cache()
    sorted.count()
    val wSpan = 499.0 * 499.0 * 499.0
    // z-order: every dim's average per-partition range well under full span
    assert(avgNormRange(z, "x", 499.0) < 0.5)
    assert(avgNormRange(z, "y", 499.0) < 0.5)
    assert(avgNormRange(z, "w", wSpan) < 0.5)
    // 1-D sort: x compact but y spans everything
    assert(avgNormRange(sorted, "x", 499.0) < 0.2)
    assert(avgNormRange(sorted, "y", 499.0) > 0.9)
    z.unpersist(); sorted.unpersist()
  }

  test("compact merges a fragmented table to the byte-sized file count") {
    val dir = Files.createTempDirectory("graft-compact").toFile
    val in = s"${dir.getAbsolutePath}/frag"
    val out = s"${dir.getAbsolutePath}/compacted"
    val outSorted = s"${dir.getAbsolutePath}/compacted_sorted"
    try {
      // 64 deliberate fragments of a 20k-row table
      spark.range(0, 20000).select(col("id"),
          (col("id") * 7919 % 1000).as("k"))
        .repartition(64).write.parquet(in)
      val fs = new org.apache.hadoop.fs.Path(in)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(new org.apache.hadoop.fs.Path(in))
        .count(_.getPath.getName.endsWith(".parquet")) == 64)

      // tiny source → targetFileMB dominates → exactly 1 file, same rows
      val n = Layout.compact(spark, in, out, targetFileMB = 256)
      assert(n == 1)
      assert(spark.read.parquet(out).count() == 20000)
      assert(spark.read.parquet(out).agg(sum("id")).head.getLong(0) ==
        spark.read.parquet(in).agg(sum("id")).head.getLong(0))

      // sortCol variant restores clustering: each output file covers a
      // narrow k-range (range partitioning + in-file sort)
      val n2 = Layout.compact(spark, in, outSorted, targetFileMB = 1,
        sortCol = Some("k"))
      assert(n2 >= 1 && spark.read.parquet(outSorted).count() == 20000)
      val spans = spark.read.parquet(outSorted)
        .groupBy(input_file_name().as("f"))
        .agg((max("k") - min("k")).as("span"))
        .collect().map(_.getAs[Long]("span"))
      if (spans.length > 1) assert(spans.forall(_ <= 1000 / spans.length * 3))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
