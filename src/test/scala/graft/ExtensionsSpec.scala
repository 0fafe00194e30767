package graft

import java.sql.Timestamp

import graft.plans.{Ddl, GraftExtensions}

class ExtensionsSpec extends GraftSpec {
  import spark.implicits._

  test("tumble/hop/session SQL functions plan like window()/session_window()") {
    GraftExtensions.install(spark)
    Seq(("a", Timestamp.valueOf("2024-01-01 00:10:00")),
      ("a", Timestamp.valueOf("2024-01-01 00:50:00")),
      ("a", Timestamp.valueOf("2024-01-01 02:00:00")))
      .toDF("k", "ts").createOrReplaceTempView("ext_events")

    val tumbled = spark.sql(
      "SELECT count(*) AS n FROM ext_events GROUP BY tumble(ts, '1 hour') ORDER BY n DESC")
    assert(tumbled.as[Long].collect().toSeq == Seq(2L, 1L))

    val hopped = spark.sql(
      "SELECT count(*) AS n FROM ext_events GROUP BY hop(ts, '1 hour', '2 hours')")
    // 2-hour windows sliding hourly: each element in 2 windows
    assert(hopped.as[Long].collect().sum == 6L)

    val sessions = spark.sql(
      "SELECT count(*) AS n FROM ext_events GROUP BY session(ts, '45 minutes'), k")
    assert(sessions.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("graft_seqgen table function plans as the DSv2 scan, not a local relation") {
    GraftExtensions.install(spark)
    val df = spark.sql(
      "SELECT count(*) AS n, min(value) AS lo, max(value) AS hi FROM graft_seqgen(100, 5)")
    assert(df.as[(Long, Long, Long)].head() == ((100L, 5L, 104L)))
    // the TVF must reach the splittable batch source, not materialize rows
    // on the driver
    val plan = spark.sql("SELECT * FROM graft_seqgen(50)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected a DSv2 BatchScan, got:\n$plan")
    // composes with ordinary SQL: windowed agg over the generated ts
    val winN = spark.sql(
      "SELECT count(*) AS n FROM graft_seqgen(600) GROUP BY tumble(ts, '1 second')")
      .as[Long].collect()
    assert(winN.sum == 600L && winN.forall(_ == 100L)) // 10ms ticks -> 100/window
  }

  test("tumble() SQL runs on a STREAM with watermark semantics (streaming SQL windowing)") {
    // the same GROUP BY tumble(...) text works on an unbounded input —
    // the reference's core design point (boundedness is a source property)
    GraftExtensions.install(spark)
    implicit val ctx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Timestamp)]
    input.toDF().toDF("k", "ts").withWatermark("ts", "10 seconds")
      .createOrReplaceTempView("stream_events")
    val agg = spark.sql(
      "SELECT count(*) AS n FROM stream_events GROUP BY tumble(ts, '1 minute')")
    assert(agg.isStreaming)
    val q = agg.writeStream.format("memory").queryName("sqltumble")
      .outputMode("append").start()
    try {
      input.addData(("a", Timestamp.valueOf("2024-01-01 00:00:10")),
        ("a", Timestamp.valueOf("2024-01-01 00:00:40")))
      q.processAllAvailable()
      input.addData(("a", Timestamp.valueOf("2024-01-01 00:05:00"))) // close window 0
      q.processAllAvailable()
      val ns = spark.table("sqltumble").as[Long].collect().toSeq
      assert(ns == Seq(2L), ns.toString)
    } finally q.stop()
  }

  test("reference extra-UDF aliases: to_hex / from_hex / length_bytes") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT lower(to_hex('abc')) AS h, CAST(from_hex('616263') AS STRING) AS s, length_bytes('abc') AS b")
      .as[(String, String, Int)].head()
    assert(r == (("616263", "abc", 3)))
  }

  test("SQL MATCH_RECOGNIZE runs through spark.sql via the parser extension") {
    // reference BeamMatchRel.java:67 — the standard clause over the graft
    // CEP engine (session built with spark.sql.extensions=GraftExtensions)
    Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      (1L, 5L, "click"), (2L, 6L, "purchase"), (2L, 7L, "click"), (2L, 8L, "purchase"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_events")
    val out = spark.sql(
      """SELECT user_id, purchase_event_id, n_clicks
        |FROM mr_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES LAST(P.event_id) AS purchase_event_id, COUNT(C.*) AS n_clicks
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (C+ P)
        |  DEFINE C AS C.event_type = 'click', P AS P.event_type = 'purchase'
        |) ORDER BY user_id""".stripMargin)
      .as[(Long, Long, Long)].collect().toSeq
    // user 1: clicks 2,3 -> purchase 4 (the trailing click 5 never completes);
    // user 2: purchase 6 has no preceding click; click 7 -> purchase 8
    assert(out == Seq((1L, 4L, 2L), (2L, 8L, 1L)), out.toString)
  }

  test("MATCH_RECOGNIZE composes with an outer WHERE and a subquery source") {
    Seq((1L, 1L, "click"), (1L, 2L, "purchase"), (2L, 3L, "click"), (2L, 4L, "purchase"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_events2")
    val out = spark.sql(
      """SELECT user_id, n_clicks FROM
        |  (SELECT * FROM mr_events2 WHERE event_id <= 4) MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY event_id
        |  MEASURES user_id AS uid, COUNT(*) AS total, COUNT(C.*) AS n_clicks
        |  PATTERN (C+ P)
        |  DEFINE C AS event_type = 'click', P AS event_type = 'purchase'
        |) WHERE user_id > 1 ORDER BY user_id""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L)), out.toString)
  }

  test("MATCH_RECOGNIZE plans one hash exchange (predicates in the scan stage)") {
    Seq((1L, 1L, "click"), (1L, 2L, "purchase"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_plan")
    val df = spark.sql(
      """SELECT * FROM mr_plan MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY event_id
        |  MEASURES COUNT(C.*) AS n_clicks
        |  PATTERN (C+ P)
        |  DEFINE C AS event_type = 'click', P AS event_type = 'purchase')""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString()
    // one shuffle on the partition key; the DEFINE predicates are plain
    // boolean projections below it, not per-row lambdas above it
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan)
  }

  test("MATCH_RECOGNIZE rejects out-of-subset constructs loudly") {
    Seq((1L, 1L, "click")).toDF("user_id", "event_id", "event_type")
      .createOrReplaceTempView("mr_events3")
    // a measure outside the subset is rejected, never mis-executed
    val e = intercept[Exception] {
      spark.sql(
        """SELECT * FROM mr_events3 MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES AVG(A.event_id) AS x
          |  PATTERN (A) DEFINE A AS true)""".stripMargin)
    }
    assert(e.getMessage.contains("unsupported measure"), e.getMessage)
    // SKIP TO LAST A where A's last row IS the match start: the SQL
    // standard's runtime loop protection must fire (at materialization —
    // the rewrite itself is lazy)
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT * FROM mr_events3 MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES COUNT(*) AS n
          |  AFTER MATCH SKIP TO LAST A
          |  PATTERN (A) DEFINE A AS true)""".stripMargin).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e2).contains("match start"), msgs(e2))
  }

  test("MATCH_RECOGNIZE SKIP TO NEXT ROW emits overlapping matches") {
    // values 1,3,5,2: rises (1,3) and (3,5) SHARE row 2 — PAST LAST ROW
    // would consume rows 1-2 and miss the (3,5) pair
    Seq((1L, 1L, 1.0), (1L, 2L, 3.0), (1L, 3L, 5.0), (1L, 4L, 2.0))
      .toDF("user_id", "event_id", "value").createOrReplaceTempView("mr_skipnext")
    def q(skip: String) = spark.sql(
      s"""SELECT a_id, b_id FROM mr_skipnext MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY event_id
         |  MEASURES FIRST(A.event_id) AS a_id, LAST(B.event_id) AS b_id
         |  AFTER MATCH SKIP $skip
         |  PATTERN (A B)
         |  DEFINE B AS B.value > PREV(value)
         |) ORDER BY a_id""".stripMargin).as[(Long, Long)].collect().toSeq
    assert(q("TO NEXT ROW") == Seq((1L, 2L), (2L, 3L)))
    assert(q("PAST LAST ROW") == Seq((1L, 2L)))
  }

  test("MATCH_RECOGNIZE ALL ROWS PER MATCH emits running measures + CLASSIFIER") {
    Seq((1L, 1L, "click"), (1L, 2L, "click"), (1L, 3L, "purchase"), (1L, 4L, "view"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_allrows")
    val out = spark.sql(
      """SELECT event_id, n_sofar, sym FROM mr_allrows MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY event_id
        |  MEASURES COUNT(*) AS n_sofar, CLASSIFIER() AS sym
        |  ALL ROWS PER MATCH
        |  PATTERN (C+ P)
        |  DEFINE C AS C.event_type = 'click', P AS P.event_type = 'purchase'
        |) ORDER BY event_id""".stripMargin)
      .as[(Long, Long, String)].collect().toSeq
    // one row per matched input row (3), running count, per-row symbol
    assert(out == Seq((1L, 1L, "C"), (2L, 2L, "C"), (3L, 3L, "P")), out.toString)
  }

  test("MATCH_RECOGNIZE PREV navigates the physical previous row") {
    // price drops: 10 > 8 > 7 is one maximal D+ run; 9 resets; 9 > 5 a second
    Seq((1L, 1L, 10.0), (1L, 2L, 8.0), (1L, 3L, 7.0), (1L, 4L, 9.0), (1L, 5L, 5.0))
      .toDF("user_id", "event_id", "price").createOrReplaceTempView("mr_prev")
    val out = spark.sql(
      """SELECT * FROM mr_prev MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY event_id
        |  MEASURES FIRST(D.event_id) AS first_id, LAST(D.event_id) AS last_id,
        |           COUNT(D.*) AS n
        |  PATTERN (D+)
        |  DEFINE D AS D.price < PREV(price)
        |) ORDER BY first_id""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 2L), (1L, 5L, 5L, 1L)), out.toString)
  }

  test("MATCH_RECOGNIZE PREV with offset and one exchange") {
    Seq((1L, 1L, 10.0), (1L, 2L, 9.0), (1L, 3L, 8.0), (1L, 4L, 20.0))
      .toDF("user_id", "event_id", "price").createOrReplaceTempView("mr_prev2")
    val df = spark.sql(
      """SELECT * FROM mr_prev2 MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY event_id
        |  MEASURES LAST(D.event_id) AS last_id
        |  PATTERN (D)
        |  DEFINE D AS D.price < PREV(D.price, 2))""".stripMargin)
    // lag/lead reuse the match stage's exchange + sort: still exactly one
    assert(df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange")) == 1)
    val out = df.as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L)), out.toString) // 8.0 < lag2=10.0 only
  }

  test("MATCH_RECOGNIZE rejects cross-symbol DEFINE references loudly") {
    Seq((1L, 1L, 10.0)).toDF("user_id", "event_id", "price")
      .createOrReplaceTempView("mr_cross")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT * FROM mr_cross MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY event_id
          |  MEASURES COUNT(*) AS n
          |  PATTERN (A B)
          |  DEFINE A AS A.price > 0, B AS B.price > A.price)""".stripMargin)
    }
    assert(e.getMessage.contains("cross-symbol"), e.getMessage)
  }

  test("MATCH_RECOGNIZE rewrites multiple clauses in one statement") {
    Seq((1L, 1L, "click"), (1L, 2L, "purchase"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_multi")
    val out = spark.sql(
      """SELECT a.user_id, a.n + b.n AS total FROM
        |  (SELECT * FROM mr_multi MATCH_RECOGNIZE (
        |     PARTITION BY user_id ORDER BY event_id
        |     MEASURES COUNT(*) AS n PATTERN (C P)
        |     DEFINE C AS event_type = 'click', P AS event_type = 'purchase')) a
        |  JOIN
        |  (SELECT * FROM mr_multi MATCH_RECOGNIZE (
        |     PARTITION BY user_id ORDER BY event_id
        |     MEASURES COUNT(P.*) AS n PATTERN (C P)
        |     DEFINE C AS event_type = 'click', P AS event_type = 'purchase')) b
        |  ON a.user_id = b.user_id""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L)), out.toString) // 2 rows + 1 purchase
  }

  test("MATCH_RECOGNIZE resolves columns case-insensitively") {
    Seq((1L, 1L, "click"), (1L, 2L, "purchase"))
      .toDF("user_id", "event_id", "event_type").createOrReplaceTempView("mr_ci")
    val out = spark.sql(
      """SELECT * FROM mr_ci MATCH_RECOGNIZE (
        |  PARTITION BY USER_ID ORDER BY EVENT_ID
        |  MEASURES LAST(P.EVENT_ID) AS pid
        |  PATTERN (C P)
        |  DEFINE C AS C.EVENT_TYPE = 'click', P AS P.event_type = 'purchase')""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L)), out.toString)
  }

  test("CREATE EXTERNAL TABLE DDL registers a readable view") {
    val df = Ddl.execute(spark,
      "CREATE EXTERNAL TABLE ext_nation TYPE parquet LOCATION '/root/testdata/sf0.001/nation.parquet'")
    assert(df.count() == 25)
    assert(spark.table("ext_nation").columns.contains("n_name"))
  }

  test("ZetaSQL delta: strftime directives translate to java.time patterns") {
    import graft.plans.ZetaFunctions.strftimeToJava
    assert(strftimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(strftimeToJava("%H:%M:%S") == "HH:mm:ss")
    // literal alphabetic text must be quoted so it can't read as a pattern
    assert(strftimeToJava("%Y at %H") == "yyyy' at 'HH")
    assert(strftimeToJava("100%% %j") == "100% DDD")
    intercept[IllegalArgumentException] { strftimeToJava("%q") }
  }

  test("ZetaSQL delta: SAFE_ semantics under the session's ANSI default") {
    // overflow → NULL (not error, not wraparound), zero divisor → NULL,
    // IEEE division constructs ±Inf/NaN where ANSI would error
    val r = spark.sql("""SELECT
        safe_add(9223372036854775807, 1) AS sa,
        safe_negate(-9223372036854775808) AS sn,
        safe_divide(1, 0) AS sd,
        is_inf(ieee_divide(1, 0)) AS pinf,
        is_inf(ieee_divide(-1, 0)) AS ninf,
        isnan(ieee_divide(0, 0)) AS nn,
        safe_array_at_offset(array(1, 2), -1) AS neg,
        safe_array_at_ordinal(array(1, 2), 0) AS ord0
      """).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5))
    assert(r.isNullAt(6) && r.isNullAt(7))
  }

  test("ZetaSQL delta: approx_quantiles returns the n+1 split points") {
    // ZetaSQL shape: APPROX_QUANTILES(x, n) = [min, …, max] with n+1
    // entries — on 0..100 exact values the sketch is exact
    val qs = spark.sql(
      "SELECT approx_quantiles(id, 4) AS q FROM range(0, 101)")
      .collect().head.getSeq[Long](0)
    assert(qs == Seq(0L, 25L, 50L, 75L, 100L), qs.toString)
  }
}
