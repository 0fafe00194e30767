package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NEXMark benchmark queries (the reference's only published performance
  * baseline — BASELINE.md: Nexmark SMOKE, 100k events, streaming
  * DirectRunner; queries documented in
  * sdks/java/testing/nexmark/.../queries/ and the public NEXMark spec).
  *
  * The event stream is regenerated deterministically from `spark.range`
  * with the reference's person:auction:bid ≈ 1:3:46 mix (NexmarkConfig
  * defaults), so runs are reproducible without any stored dataset and the
  * generator itself is a one-pass projection (no shuffle, codegen'd).
  * Event timestamps advance ~100 events/sec of virtual time.
  *
  * These run as batch over the bounded stream — the Dataflow-model point
  * (boundedness is a property of the source, not the query) means the same
  * plans run under Structured Streaming; the windowed aggregations below
  * are watermark-compatible (group on `window(...)`).
  */
object Nexmark {

  private val PersonProp = 1
  private val AuctionProp = 3
  private val BidProp = 46
  private val Total = PersonProp + AuctionProp + BidProp

  private val states = Seq("OR", "ID", "CA", "WA", "NV", "AZ", "NM", "UT")
  private val cities = Seq("Portland", "Boise", "LosAngeles", "Seattle",
    "Reno", "Phoenix", "Santa Fe", "Provo")

  /** Tag an (id, ts) frame — batch range or streaming source — with its
    * event kind (0=person, 1=auction, 2=bid), mirroring the interleaved
    * generator. The streaming path feeds the graft-seqgen source here,
    * whose (value, ts) columns share the same epoch and 10 ms tick. */
  def eventsFrom(idTs: DataFrame): DataFrame =
    idTs
      .withColumn("slot", (col("id") % Total).cast("int"))
      .withColumn("kind",
        when(col("slot") < PersonProp, 0)
          .when(col("slot") < PersonProp + AuctionProp, 1)
          .otherwise(2))

  /** One row per event id with its kind, batch flavor.
    * Virtual event time: 100 events/s starting 2024-01-01. */
  private def events(spark: SparkSession, n: Long): DataFrame =
    eventsFrom(spark.range(n)
      .withColumn("ts", timestamp_millis(lit(1704067200000L) + col("id") * 10)))

  /** Persons: ~1/50 of events. */
  def personsFrom(ev: DataFrame): DataFrame =
    ev.filter(col("kind") === 0)
      .select(
        col("id").as("p_id"),
        concat(lit("person-"), col("id")).as("name"),
        element_at(array(states.map(lit): _*), (col("id") % 8 + 1).cast("int")).as("state"),
        element_at(array(cities.map(lit): _*), (col("id") % 7 + 1).cast("int")).as("city"),
        col("ts"))

  def persons(spark: SparkSession, n: Long): DataFrame =
    personsFrom(events(spark, n))

  /** Auctions: ~3/50 of events; seller is a prior person id. */
  def auctionsFrom(ev: DataFrame): DataFrame =
    ev.filter(col("kind") === 1)
      .select(
        col("id").as("a_id"),
        (floor(col("id") / Total) * Total).as("seller"), // the period's person
        (col("id") % 10).cast("int").as("category"),
        (col("id") % 100 + 1).cast("long").as("initial_bid"),
        col("ts"),
        (col("ts") + expr("INTERVAL 10 SECONDS")).as("expires"))

  def auctions(spark: SparkSession, n: Long): DataFrame =
    auctionsFrom(events(spark, n))

  /** Bids: ~46/50 of events; auction/bidder reference recent ids. */
  def bidsFrom(ev: DataFrame): DataFrame =
    ev.filter(col("kind") === 2)
      .select(
        // bid on one of the ~3 auctions from the same 50-event period
        (floor(col("id") / Total) * Total + 1 + (col("id") % AuctionProp)).as("auction"),
        (floor(col("id") / Total) * Total).as("bidder"),
        (xxhash64(col("id")) % 10000 + 10000).as("price"), // deterministic pseudo-random
        col("ts"))

  def bids(spark: SparkSession, n: Long): DataFrame =
    bidsFrom(events(spark, n))

  /** Q0: passthrough (measures raw event plumbing). */
  def q0(spark: SparkSession, n: Long): DataFrame = bids(spark, n)

  /** Q1: currency conversion dollar→euro. */
  def q1(spark: SparkSession, n: Long): DataFrame =
    bids(spark, n).select(col("auction"), col("bidder"),
      (col("price") * 0.908).as("price_eur"), col("ts"))

  /** Q2: filter auctions by id set. */
  def q2(spark: SparkSession, n: Long): DataFrame =
    bids(spark, n).filter(col("auction") % 123 === 0)
      .select(col("auction"), col("price"))

  /** Q3: local item suggestion — auctions in category 1 by sellers in
    * OR/ID/CA (incremental join in the reference, state+timers). */
  def q3(spark: SparkSession, n: Long): DataFrame =
    auctions(spark, n).filter(col("category") === 1)
      .join(persons(spark, n).filter(col("state").isin("OR", "ID", "CA")),
        col("seller") === col("p_id"))
      .select(col("name"), col("city"), col("state"), col("a_id"))

  /** Q4: average closing price per category (winning bid = max bid per
    * auction before expiry). */
  def q4(spark: SparkSession, n: Long): DataFrame = {
    val a = auctions(spark, n)
    val b = bids(spark, n).withColumnRenamed("ts", "b_ts")
    b.join(a, col("auction") === col("a_id") && col("b_ts") <= col("expires"))
      .groupBy(col("a_id"), col("category"))
      .agg(max(col("price")).as("final_price"))
      .groupBy(col("category"))
      .agg(round(avg(col("final_price")), 2).as("avg_price"))
  }

  /** Q5: hot items — auction(s) with most bids per sliding window. */
  def q5(spark: SparkSession, n: Long): DataFrame = {
    val counts = bids(spark, n)
      .groupBy(window(col("ts"), "10 seconds", "2 seconds"), col("auction"))
      .agg(count(lit(1)).as("n_bids"))
    val w = Window.partitionBy("window").orderBy(col("n_bids").desc, col("auction"))
    counts.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("window.start").as("win_start"), col("auction"), col("n_bids"))
  }

  /** Q6: average selling price per seller (winning bids). */
  def q6(spark: SparkSession, n: Long): DataFrame = {
    val winning = bids(spark, n).withColumnRenamed("ts", "b_ts")
      .join(auctions(spark, n),
        col("auction") === col("a_id") && col("b_ts") <= col("expires"))
      .groupBy(col("a_id"), col("seller"))
      .agg(max(col("price")).as("final_price"))
    winning.groupBy(col("seller"))
      .agg(round(avg(col("final_price")), 2).as("avg_sell_price"))
  }

  /** Q7: highest bid per fixed window (side-input fanout in the
    * reference; a windowed max + semi-join here). */
  def q7(spark: SparkSession, n: Long): DataFrame = {
    val b = bids(spark, n).withColumn("win", window(col("ts"), "10 seconds"))
    val maxes = b.groupBy(col("win")).agg(max(col("price")).as("max_price"))
    b.join(maxes, Seq("win"))
      .filter(col("price") === col("max_price"))
      .select(col("win.start").as("win_start"), col("auction"), col("bidder"), col("price"))
  }

  /** Q8: monitor new users — persons who created an auction in the same
    * window they registered. */
  def q8(spark: SparkSession, n: Long): DataFrame = {
    val p = persons(spark, n).withColumn("win", window(col("ts"), "10 seconds"))
      .select(col("p_id"), col("name"), col("win"))
    val a = auctions(spark, n).withColumn("a_win", window(col("ts"), "10 seconds"))
      .select(col("seller"), col("a_win"))
    p.join(a, col("p_id") === col("seller") && col("win") === col("a_win"))
      .select(col("p_id"), col("name"), col("win.start").as("win_start"))
      .distinct()
  }

  /** Q9: winning bid per auction (highest price before expiry; ties to
    * the earliest bid). */
  def q9(spark: SparkSession, n: Long): DataFrame = {
    val b = bids(spark, n).withColumnRenamed("ts", "b_ts")
    val joined = b.join(auctions(spark, n),
      col("auction") === col("a_id") && col("b_ts") <= col("expires"))
    val w = Window.partitionBy("a_id").orderBy(col("price").desc, col("b_ts"))
    joined.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("a_id"), col("category"), col("bidder"), col("price"), col("b_ts"))
  }

  /** Q10: log all events to sharded files, one directory per window
    * (the reference writes windowed bid logs to sharded files with
    * day/hour dynamic destinations). Rows route to per-window directories
    * via partitionBy after a repartition on the partition columns, so each
    * window is written by one task (small-files control at scale); the
    * returned frame is the read-back of the committed output, making the
    * benched path write + commit + scan. */
  def q10(spark: SparkSession, n: Long): DataFrame = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-nexmark-q10").resolve("logs").toString
    val out = bids(spark, n)
      .withColumn("win", window(col("ts"), "10 seconds"))
      .select(col("auction"), col("bidder"), col("price"), col("ts"),
        date_format(col("win.start"), "yyyy-MM-dd").as("day"),
        date_format(col("win.start"), "HH-mm").as("hhmm"))
      .repartition(col("day"), col("hhmm"))
    graft.sources.FileIO.writeDynamic(out, path, "parquet", Seq("day", "hhmm"))
    spark.read.parquet(path)
  }

  /** Q11: bids per bidder per session (10s gap session windows). */
  def q11(spark: SparkSession, n: Long): DataFrame =
    bids(spark, n)
      .groupBy(session_window(col("ts"), "10 seconds"), col("bidder"))
      .agg(count(lit(1)).as("n_bids"))
      .select(col("session_window.start").as("sess_start"), col("bidder"), col("n_bids"))

  /** Q12: bid count per bidder per processing-time window — on a bounded
    * replay, processing time is the ingestion tick, so the event-time
    * column stands in (the reference's q12 measures the same shape). */
  def q12(spark: SparkSession, n: Long): DataFrame =
    bids(spark, n)
      .groupBy(window(col("ts"), "10 seconds"), col("bidder"))
      .agg(count(lit(1)).as("n_bids"))
      .select(col("window.start").as("win_start"), col("bidder"), col("n_bids"))

  /** All queries keyed like the baseline table. */
  def all: Map[String, (SparkSession, Long) => DataFrame] = Map(
    "q0" -> q0, "q1" -> q1, "q2" -> q2, "q3" -> q3, "q4" -> q4,
    "q5" -> q5, "q6" -> q6, "q7" -> q7, "q8" -> q8, "q9" -> q9,
    "q10" -> q10, "q11" -> q11, "q12" -> q12)
}
