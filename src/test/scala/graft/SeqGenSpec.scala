package graft

import org.apache.spark.sql.functions._

/** DataSource V2 sequence generator (reference seqgen table provider /
  * SDF offset-range source contract). */
class SeqGenSpec extends GraftSpec {
  import spark.implicits._

  test("batch read produces the exact range across split partitions") {
    val df = spark.read.format("graft-seqgen")
      .option("from", "10").option("count", "1000").option("partitions", "7").load()
    assert(df.count() == 1000)
    val (mn, mx) = df.agg(min("value"), max("value")).as[(Long, Long)].head()
    assert(mn == 10L && mx == 1009L)
    assert(df.select("value").distinct().count() == 1000) // no dup/missing across splits
    assert(df.rdd.getNumPartitions == 7)
  }

  test("event timestamps tick deterministically") {
    val df = spark.read.format("graft-seqgen").option("count", "3").load()
    val ts = df.orderBy("value").select(col("ts").cast("string")).as[String].collect()
    assert(ts.head == "2024-01-01 00:00:00" && ts(1) == "2024-01-01 00:00:00.01")
  }

  test("micro-batch stream advances the offset frontier to completion") {
    val q = spark.readStream.format("graft-seqgen")
      .option("count", "250").option("rowsPerBatch", "100").load()
      .writeStream.format("memory").queryName("seq").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("seq").count() < 250 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(spark.table("seq").count() == 250)
      assert(spark.table("seq").select("value").distinct().count() == 250)
    } finally q.stop()
  }

  test("streaming windowed aggregation over the generated event time") {
    // the ts column is watermark-capable: windowed counts per 1s of
    // virtual time (100 rows per window at 10ms ticks)
    val q = spark.readStream.format("graft-seqgen")
      .option("count", "300").option("rowsPerBatch", "150").load()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 second")).agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("s"), col("n"))
      .writeStream.format("memory").queryName("seqwin").outputMode("complete").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("seqwin").count() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      val rows = spark.table("seqwin").as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 00:00:00") == 100L && rows("2024-01-01 00:00:01") == 100L)
    } finally q.stop()
  }
}
