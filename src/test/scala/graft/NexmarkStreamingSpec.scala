package graft

import org.apache.spark.sql.streaming.Trigger
import graft.queries.{Nexmark, NexmarkStreaming}

/** Micro-batch Nexmark: the same plans produce the same answers whether
  * the bounded event stream is replayed as a batch or drained through the
  * graft-seqgen MICRO_BATCH_READ source under Trigger.AvailableNow.
  * Append mode withholds windows still above the final watermark, so
  * stateful-query outputs are checked as a non-empty subset of batch. */
class NexmarkStreamingSpec extends GraftSpec {

  private val N = 20000L

  private def runToMemory(name: String): Seq[String] = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"nxs-$name").toString
    val ev = NexmarkStreaming.stream(spark, N, rowsPerBatch = N / 5)
    val q = NexmarkStreaming.plans(ev)(name)
      .writeStream.format("memory").queryName(s"nxs_$name")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), s"$name did not finish")
    spark.table(s"nxs_$name").collect().map(_.toString).toSeq
  }

  test("q0 streaming emits exactly the batch bid stream") {
    val streamed = runToMemory("q0")
    val batch = Nexmark.bids(spark, N).collect().map(_.toString).toSeq
    assert(streamed.sorted == batch.sorted)
  }

  test("q11 session windows: streaming output is a non-empty subset of batch") {
    val streamed = runToMemory("q11")
    val batch = Nexmark.q11(spark, N).collect().map(_.toString).toSet
    assert(streamed.nonEmpty)
    val missing = streamed.filterNot(batch)
    assert(missing.isEmpty, s"rows not in batch answer: ${missing.take(5)}")
  }

  test("q5 hot items: streaming argmax rows agree with the batch answer") {
    val streamed = runToMemory("q5")
    val batch = Nexmark.q5(spark, N).collect().map(_.toString).toSet
    assert(streamed.nonEmpty)
    val missing = streamed.filterNot(batch)
    assert(missing.isEmpty, s"rows not in batch answer: ${missing.take(5)}")
  }

  test("q4/q6/q9 foreachBatch two-stage equals the batch plan exactly") {
    // the two-stage fold (per-batch partial max/argmax merged into running
    // state, final projection at stream end) must reproduce the one-shot
    // batch answer; q9 compares the full winning ROWS (argmax tie-breaks)
    val batchPlans = Map[String, org.apache.spark.sql.DataFrame](
      "q4" -> Nexmark.q4(spark, N), "q6" -> Nexmark.q6(spark, N),
      "q9" -> Nexmark.q9(spark, N))
    for (name <- Seq("q4", "q6", "q9")) {
      val ckpt = java.nio.file.Files.createTempDirectory(s"nxs2-$name").toString
      val ev = NexmarkStreaming.stream(spark, N, rowsPerBatch = N / 5)
      val out = NexmarkStreaming.twoStage(spark, name, ev, ckpt, 120000)
        .getOrElse(fail(s"$name two-stage did not finish"))
        .collect().map(_.toString).toSet
      val batch = batchPlans(name).collect().map(_.toString).toSet
      assert(out == batch, s"$name: stream-only=${(out -- batch).take(3)} " +
        s"batch-only=${(batch -- out).take(3)}")
      // flat-plan contract: localCheckpoint truncates the fold's lineage
      // every batch, so the state plan must NOT grow with batch count — the
      // property that lets the fold run unbounded (one union per batch
      // would nest and hit the plan-doubling wall)
      import scala.jdk.CollectionConverters._
      val sizes = NexmarkStreaming.statePlanSizes.asScala.map(_.toInt).toSeq
      assert(sizes.size >= 5, s"$name: expected >=5 micro-batches, got $sizes")
      assert(sizes.distinct.size == 1,
        s"$name: state plan grew across batches: $sizes")
    }
  }
}
