package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.text.TextAnalysis

/** The crawl-ingest shape: the scan-stage curation operators (markup
  * strip → text features → PII redaction) composed over a STREAMING
  * source. These are stateless projections, so Structured Streaming
  * accepts the identical DataFrame code the batch path uses — this suite
  * pins that contract (batch ≡ streaming row-for-row on the same input),
  * which is what lets one curation pipeline serve both the backfill and
  * the live crawl without a second implementation. */
class StreamingCurationSpec extends GraftSpec {
  import spark.implicits._

  private def curate(df: org.apache.spark.sql.DataFrame) = {
    val stripped = TextAnalysis.stripMarkup(df, "raw")
    val feats = TextAnalysis.withTextFeatures(stripped, "text_plain")
    TextAnalysis.redactPii(feats, "text_plain")
      .select(col("doc_id"), col("text_plain"),
        col("n_tokens").cast("long").as("n_tokens"), col("text_redacted"))
  }

  test("markup strip + features + PII redaction run unchanged on a stream") {
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (1L, "<html><body><p>Contact me at alice@example.com today.</p></body></html>"),
      (2L, "<script>var x = 1;</script>Call 555-123-4567 <b>now</b>"),
      (3L, "plain text, no markup, no pii at all"))
    val input = MemoryStream[(Long, String)]
    val q = curate(input.toDF().toDF("doc_id", "raw"))
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("curated")
        .as[(Long, String, Long, String)].collect().sortBy(_._1).toList
      val batch = curate(rows.toDF("doc_id", "raw"))
        .as[(Long, String, Long, String)].collect().sortBy(_._1).toList
      assert(streamed == batch)
      // and the transforms actually did their jobs
      val byId = streamed.map(r => r._1 -> r).toMap
      assert(!byId(1L)._2.contains("<") && byId(1L)._2.contains("alice@example.com"))
      assert(byId(1L)._4.contains("<EMAIL>") && !byId(1L)._4.contains("alice@"))
      assert(!byId(2L)._2.contains("var x") && byId(2L)._4.contains("<PHONE>"))
      assert(byId(3L)._2 == "plain text, no markup, no pii at all")
    } finally q.stop()
  }

  test("streaming CDC: foreachBatch changelog apply equals one batch apply") {
    // The live-ingest mirror of Cdc's batch composition law: a stream of
    // changelog micro-batches folded into a snapshot via foreachBatch
    // must land on the same state as applying the unioned changelog
    // once. Sequence numbers are monotone across batches (the well-formed
    // changelog contract), so per-batch LWW composes.
    import graft.api.Cdc
    implicit val ctx = spark.sqlContext
    val snap0 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val b1 = Seq((1L, "a2", 10L, "U"), (4L, "d", 11L, "I"))
    val b2 = Seq((2L, "", 20L, "D"), (4L, "d2", 21L, "U"))

    var state = snap0
    val input = MemoryStream[(Long, String, Long, String)]
    val q = input.toDF().toDF("k", "v", "seq", "op")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // localCheckpoint flattens the plan so state doesn't grow a
        // lineage chain across micro-batches (same pattern as the
        // Nexmark foreachBatch fold)
        state = Cdc.applyChangelog(state, batch, Seq("k"), "seq", "op")
          .localCheckpoint(true)
      }
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val streamed = state.as[(Long, String)].collect().toSet
      val once = Cdc.applyChangelog(snap0, (b1 ++ b2).toDF("k", "v", "seq", "op"),
        Seq("k"), "seq", "op").as[(Long, String)].collect().toSet
      assert(streamed == once)
      assert(streamed == Set((1L, "a2"), (3L, "c"), (4L, "d2")))
    } finally q.stop()
  }
}
