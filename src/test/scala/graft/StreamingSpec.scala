package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Stateful, Windows}

/** TestStream-style scripted streaming checks (reference
  * testing/TestStream.java pattern): push elements, advance the watermark
  * by pushing later elements, assert per-window outputs. */
class StreamingSpec extends GraftSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** flatMapGroupsWithState + ProcessingTimeTimeout queries never quiesce
    * (Spark schedules no-data batches forever to check timers, so
    * `processAllAvailable` never observes noNewData). Poll the memory sink
    * until the expected row count lands instead. */
  private def awaitRows(table: String, n: Long, timeoutMs: Long = 120000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(spark.table(table).count() >= n,
      s"$table did not reach $n rows within ${timeoutMs}ms")
  }

  test("tumbling window with watermark drops late data (append mode)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val agg = Windows.withLateness(
      input.toDF().toDF("k", "event_time"), "event_time", "10 seconds")
      .groupBy(window(col("event_time"), "1 minute"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("k"), col("n"))
    val q = agg.writeStream.format("memory").queryName("tumbled")
      .outputMode("append").start()
    try {
      input.addData(("a", ts("2024-01-01 00:00:10")), ("a", ts("2024-01-01 00:00:40")))
      q.processAllAvailable()
      // advance watermark past 00:01:00 + 10s → first window closes
      input.addData(("a", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      // this element targets the closed window → must be dropped
      input.addData(("a", ts("2024-01-01 00:00:50")))
      q.processAllAvailable()
      input.addData(("a", ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      val rows = spark.table("tumbled")
        .select("start", "n").as[(Timestamp, Long)].collect().toMap
      assert(rows(ts("2024-01-01 00:00:00")) == 2L) // late element NOT counted
    } finally q.stop()
  }

  test("streaming deduplicate keeps first occurrence across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val deduped = Stateful.deduplicate(input.toDS(), ttlMs = 60000)
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode("append").trigger(Trigger.ProcessingTime(200)).start()
    try {
      input.addData(("a", 1), ("a", 2), ("b", 3))
      awaitRows("deduped", 2)
      input.addData(("a", 4), ("c", 5)) // a is a cross-batch duplicate
      awaitRows("deduped", 3)
      val vals = spark.table("deduped").as[Int].collect().sorted.toSeq
      assert(vals == Seq(1, 3, 5))
    } finally q.stop()
  }

  test("groupIntoBatches flushes full batches immediately") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    val batched = Stateful.groupIntoBatches(input.toDS(), batchSize = 2, maxWaitMs = 3600000)
    val q = batched.writeStream.format("memory").queryName("batched")
      .outputMode("append").trigger(Trigger.ProcessingTime(200)).start()
    try {
      input.addData(("a", 1), ("a", 2), ("a", 3), ("b", 9))
      awaitRows("batched", 1)
      val out = spark.table("batched").as[(String, Seq[Int])].collect()
      // a: one full batch of 2 emitted, 1 buffered; b: buffered
      assert(out.toSeq == Seq(("a", Seq(1, 2))))
    } finally q.stop()
  }

  test("session windows merge within gap on a stream") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val agg = input.toDF().toDF("k", "event_time")
      .withWatermark("event_time", "10 seconds")
      .groupBy(session_window(col("event_time"), "30 seconds"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData(("a", ts("2024-01-01 00:00:00")), ("a", ts("2024-01-01 00:00:20")),
        ("a", ts("2024-01-01 00:02:00"))) // third is a separate session
      q.processAllAvailable()
      input.addData(("a", ts("2024-01-01 00:10:00"))) // advance watermark
      q.processAllAvailable()
      val closed = spark.table("sessions").as[(String, Long)].collect().toSeq
      assert(closed.contains(("a", 2L)) && closed.contains(("a", 1L)))
    } finally q.stop()
  }

  test("windows DSL assigns identical structs on batch frames") {
    val df = Seq(ts("2024-01-01 00:00:30")).toDF("event_time")
    val fixed = Windows.windowed(df, Windows.Fixed("1 minute"), col("event_time"))
      .select(col("window.start").cast("string")).as[String].head()
    assert(fixed == "2024-01-01 00:00:00")
    val cal = Windows.windowed(df, Windows.Calendar("month"), col("event_time"))
      .select(col("window.end").cast("string")).as[String].head()
    assert(cal == "2024-02-01 00:00:00")
  }
}
