package graft.pack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out into fixed-token-budget training
  * sequences — the step between a curated corpus and a pretraining data
  * loader.
  *
  * Two layouts, matching the two conventions in use:
  *
  *  - [[concatAndChunk]] — GPT-style: concatenate each stream's documents
  *    in id order and cut every `budget` tokens; documents may straddle a
  *    cut (they get one output row per sequence they touch). Fully
  *    declarative: one window cumsum per stream + an explode over the
  *    touched sequence range. At 100 TB: one shuffle on the stream key,
  *    sequences within a stream are contiguous by construction, and the
  *    output is ready to be written bucketed by (stream, seq_id).
  *  - [[greedyPack]] — no-split first-fit-sequential (SFT-style): a doc
  *    never crosses a sequence boundary; when it doesn't fit, a new
  *    sequence starts. The fill level is a running recurrence, so this is
  *    genuine per-partition imperative logic (the documented
  *    `mapPartitions` case): sort within partitions by (stream, id) and
  *    scan each stream once with O(1) state. Parallelism = number of
  *    streams; pick `streams` ≈ cluster cores at scale.
  *
  * Both are deterministic given (idCol, streams): stream = id % streams,
  * order = id within stream — so results are reproducible run-to-run and
  * verifiable row-for-row against an independent SQL derivation (window
  * cumsum for chunking, a per-stream recursive recurrence for greedy).
  */
object Packing {

  /** GPT-style concat-and-chunk packing.
    *
    * Output: one row per (document, sequence it touches):
    * `idCol, stream, seq_id, doc_from, seq_from, piece_len` — the piece
    * `[doc_from, doc_from+piece_len)` of the document lands at offset
    * `seq_from` of sequence `seq_id` in its stream.
    */
  def concatAndChunk(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, streams: Int): DataFrame = {
    require(budget > 0 && streams > 0)
    val w = Window.partitionBy("stream").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(tokensCol) > 0)
      .withColumn("stream", col(idCol) % streams)
      .withColumn("off", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      // sequences touched: floor(off/B) .. floor((off+tok-1)/B)
      .withColumn("seq_id",
        explode(sequence(expr(s"off DIV $budget"),
          expr(s"(off + $tokensCol - 1) DIV $budget"))))
      .withColumn("piece_start", greatest(col("off"), col("seq_id") * budget))
      .select(col(idCol), col("stream"), col("seq_id"),
        (col("piece_start") - col("off")).as("doc_from"),
        (col("piece_start") - col("seq_id") * budget).as("seq_from"),
        (least(col("off") + col(tokensCol), (col("seq_id") + 1) * budget)
          - col("piece_start")).as("piece_len"))
  }

  /** No-split greedy packing: documents in id order per stream; a doc that
    * would overflow the budget opens the next sequence (an oversized doc
    * gets a sequence of its own). Output: `idCol, stream, seq_no, offset`
    * — the doc starts at `offset` tokens into sequence `seq_no` of its
    * stream.
    */
  def greedyPack(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, streams: Int): DataFrame = {
    require(budget > 0 && streams > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.filter(col(tokensCol) > 0)
      .select(col(idCol).cast("long").as("id"),
        (col(idCol).cast("long") % streams).as("stream"),
        col(tokensCol).cast("long").as("tok"))
      .repartition(col("stream"))
      .sortWithinPartitions("stream", "id")
      .as[(Long, Long, Long)]
    in.mapPartitions { it =>
      // several streams can share a partition; the sort above makes each
      // stream a contiguous run, so reset the fill state on stream change
      var curStream = Long.MinValue
      var seqNo = 0L
      var filled = 0L
      it.map { case (id, stream, tok) =>
        if (stream != curStream) { curStream = stream; seqNo = 0L; filled = 0L }
        else if (filled + tok > budget) { seqNo += 1L; filled = 0L }
        val off = filled
        filled += tok
        (id, stream, seqNo, off)
      }
    }.toDF(idCol, "stream", "seq_no", "offset")
  }

  /** Deterministic global shuffle + token-budget shard assignment: the
    * step that turns a curated corpus into training shards of ~`budget`
    * tokens each, in a reproducible pseudo-random document order.
    *
    * Order is `md5("shard:" <> id)` — content-independent, portable
    * across engines and runs, and free of RNG state (the same
    * reproducibility contract as [[graft.api.Sampling.weightedMix]]).
    * A document's shard is `floor(exclusivePrefixTokens / budget)`:
    * greedy fill in hash order, so shards are contiguous runs of the
    * shuffled order and every shard except the last holds ≥ `budget`
    * tokens counting its straddling tail document.
    *
    * The global prefix sum is computed the scale-correct way — NO
    * single-partition window:
    *   1. the first `bucketHexChars` of the hash splits rows into 16^c
    *      buckets that are CONTIGUOUS ranges of the global hash order;
    *   2. per-bucket token subtotals (one tiny agg, 16^c rows) turn into
    *      bucket start offsets with a window over that tiny frame;
    *   3. offsets broadcast-join back and a per-bucket window adds the
    *      within-bucket running sum.
    * Per-bucket work is ~n/16^c rows; pick `bucketHexChars` so a bucket
    * fits a task (3 hex chars = 4096 buckets ≈ 25M docs/bucket at 100 TB).
    *
    * Output: input columns + `shard` (long). Write with [[writeShards]].
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, bucketHexChars: Int = 2): DataFrame = {
    require(budget > 0 && bucketHexChars >= 1 && bucketHexChars <= 8)
    val keyed = df
      .withColumn("__h", md5(concat(lit("shard:"), col(idCol).cast("string"))))
      .withColumn("__b", substring(col("__h"), 1, bucketHexChars))
    val offsets = keyed.groupBy("__b")
      .agg(sum(col(tokensCol).cast("long")).as("__btok"))
      .withColumn("__off", coalesce(sum("__btok").over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__btok")
    val wIn = Window.partitionBy("__b").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum",
        col("__off") + coalesce(sum(col(tokensCol).cast("long")).over(wIn), lit(0L)))
      // integer division: token totals at 100 TB exceed double's exact
      // range, so floating division could misassign boundary documents
      .withColumn("shard", expr(s"__cum DIV $budget"))
      .drop("__h", "__b", "__off", "__cum")
  }

  /** Materialize shards as a parquet dataset partitioned by shard id —
    * each shard directory is one training-ready file group. */
  def writeShards(df: DataFrame, outDir: String): Unit =
    df.write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
