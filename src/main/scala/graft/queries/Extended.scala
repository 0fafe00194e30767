package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Combine, Sampling}
import graft.cep.Pattern
import graft.plans.GraftExtensions
import graft.sources.Tables

/** Wave-2 operator coverage: deterministic sampling (Sample.java),
  * user-defined CombineFn aggregation (Combine.java:398 / UdafImpl),
  * ORDER BY OFFSET/FETCH (BeamSortRel.java:98), the SQL front end
  * (SqlTransform → spark.sql, incl. the tumble() windowing extension), and
  * MATCH_RECOGNIZE row-pattern matching (BeamMatchRel.java:67).
  */
object Extended extends QueryModule {

  // Sample.fixedSizeGlobally (transforms/Sample.java) — deterministic
  // hash-ranked variant; TakeOrderedAndProject, no full sort at scale.
  private def q44(s: SparkSession, dir: String): DataFrame =
    Sampling.fixedSizeGlobally(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice")),
      n = 500, key = col("o_orderkey"))
      .orderBy("o_orderkey")

  private val q44Sql =
    """SELECT o_orderkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  ORDER BY md5(o_orderkey::VARCHAR) LIMIT 500) t
      |ORDER BY o_orderkey""".stripMargin

  // User-defined CombineFn (createAccumulator/addInput/merge/extract)
  // registered as a SQL aggregate: geometric mean of extended price.
  // Catalyst lifts it to partial+final — only (sumLog, n) pairs shuffle.
  private val geomean = Combine.combineFn[Double, (Double, Long), Double](
    createAccumulator = () => (0.0, 0L),
    addInput = (a, x) => (a._1 + math.log(x), a._2 + 1),
    mergeAccumulators = (a, b) => (a._1 + b._1, a._2 + b._2),
    extractOutput = a => if (a._2 == 0) 0.0 else math.exp(a._1 / a._2))(
    Encoders.product[(Double, Long)], Encoders.scalaDouble)

  private def q45(s: SparkSession, dir: String): DataFrame = {
    Combine.register(s, "geomean", geomean)
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("geomean(l_extendedprice)"), 2).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val q45Sql =
    """SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 2) AS geo_price,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Sample.fixedSizePerKey — per-key deterministic reservoir analog.
  private def q46(s: SparkSession, dir: String): DataFrame =
    Sampling.fixedSizePerKey(
      Tables.orders(s, dir).select(col("o_orderpriority"), col("o_orderkey")),
      n = 5, keyCol = col("o_orderpriority"), idCol = col("o_orderkey"))
      .orderBy("o_orderpriority", "o_orderkey")

  private val q46Sql =
    """SELECT o_orderpriority, o_orderkey FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY md5(o_orderkey::VARCHAR)) AS rn
      |  FROM orders) t
      |WHERE rn <= 5 ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ORDER BY ... OFFSET/FETCH (BeamSortRel.java:98: LIMIT/OFFSET/FETCH).
  private def q47(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(20)

  private val q47Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin

  // Re-aggregatable HLL sketches (HllCount.Init/MergePartial/Extract,
  // extensions/zetasketch HllCount.java:87): per-chunk sketches built
  // independently, merged with hll_union_agg, then estimated — the
  // mergeability contract that lets 1000 executors sketch shards and
  // combine. At verify scale the DataSketches HLL is in exact (sparse)
  // mode, so the estimate equals exact COUNT DISTINCT.
  private def q48(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .withColumn("chunk", pmod(col("s_suppkey"), lit(4)))
      .groupBy(col("s_nationkey"), col("chunk"))
      .agg(hll_sketch_agg(col("s_suppkey")).as("sk"))
      .groupBy(col("s_nationkey"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_distinct"))
      .orderBy("s_nationkey")

  private val q48Sql =
    """SELECT s_nationkey, CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_distinct
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // Count-min frequency sketch (extensions/sketching SketchFrequencies):
  // one pass builds the sketch; point queries read it. Width 1/eps is
  // far above the key cardinality here, so estimates are collision-free
  // and match exact counts.
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val sk = ev.agg(count_min_sketch(col("event_type"), lit(0.0001), lit(0.99), lit(42)).as("sk"))
    val estimate = udf((bytes: Array[Byte], key: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes)).estimateCount(key))
    ev.select(col("event_type")).distinct()
      .crossJoin(sk)
      .select(col("event_type"), estimate(col("sk"), col("event_type")).as("est_count"))
      .orderBy("event_type")
  }

  private val q49Sql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // Misra-Gries frequent-items sketch (q49's complement: CMS answers
  // point lookups, MG finds the heavy SET with k counters of state).
  // Keys are constructed with 4 planted ~5%-frequency heavies over a
  // long tail of per-order keys; with k=32 the deterministic MG
  // guarantee (every key above n/(k+1) surfaces; estimates undercount by
  // at most n/(k+1)) is pinned as booleans, and the heavy count is
  // recomputed exactly by the oracle.
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val k = 32
    val li = Tables.lineitem(s, dir).select(
      when(col("l_orderkey") % 20 < 4,
        concat(lit("h"), (col("l_orderkey") % 20).cast("string")))
        .otherwise(concat(lit("c"), col("l_orderkey").cast("string")))
        .as("key"))
    val entries = li.agg(graft.api.FreqItems.sketch(col("key"), k).as("mg"))
      .select(explode(col("mg")).as(Seq("key", "est")))
    val exact = li.groupBy("key").agg(count(lit(1)).as("freq"))
      .crossJoin(li.agg(count(lit(1)).as("n")))
    val heavyAgg = exact.filter(col("freq") * (k + 1) > col("n"))
      .join(entries, Seq("key"), "left")
      .agg(count(lit(1)).as("n_heavy"),
        bool_and(col("est").isNotNull).as("all_heavy_in_sketch"))
    val boundsAgg = entries.join(exact, Seq("key"))
      .agg(bool_and(col("est") <= col("freq") &&
        (col("freq") - col("est")) * (k + 1) <= col("n")).as("bounds_ok"))
    heavyAgg.crossJoin(boundsAgg)
  }

  private val q123Sql =
    """WITH li AS (SELECT CASE WHEN l_orderkey % 20 < 4
      |    THEN 'h' || (l_orderkey % 20) ELSE 'c' || l_orderkey END AS key
      |  FROM lineitem),
      |t AS (SELECT count(*) AS n FROM li),
      |e AS (SELECT key, count(*) AS freq FROM li GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_heavy,
      |  TRUE AS all_heavy_in_sketch, TRUE AS bounds_ok
      |FROM e, t WHERE freq * 33 > n""".stripMargin

  // SQL front end + streaming-SQL windowing syntax: GROUP BY tumble(...)
  // through our SparkSessionExtensions function (≙ the reference's
  // GROUP BY TUMBLE(...) rewrite, BeamAggregationRule.java:121).
  private def q56(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    GraftExtensions.install(s)
    s.sql(
      """SELECT w.start AS win_start, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM (SELECT tumble(ts, '1 day') AS w, value FROM events)
        |GROUP BY w ORDER BY win_start""".stripMargin)
  }

  private val q56Sql =
    """SELECT make_timestamp((CAST(epoch(ts) AS BIGINT) // 86400) * 86400 * 1000000) AS win_start,
      |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1 ORDER BY win_start""".stripMargin

  // SQL front end parity: the SAME SQL text runs on spark.sql and DuckDB
  // (SqlTransform.query ≙ spark.sql; Calcite's planning job is Catalyst's).
  private val q57Text =
    """SELECT n_name,
      |  round(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS urgent_rev,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private def q57(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q57Text)
  }

  // MATCH_RECOGNIZE: PATTERN (click+ purchase) per user ordered by event
  // time — emit each purchase reached through an uninterrupted click run,
  // with the run length. Oracle: gaps-and-islands window SQL.
  // not private: encoder codegen (SpecificSafeProjection) needs public access
  final case class Ev(event_id: Long, user_id: Long, event_type: String, ts_us: Long)
  final case class CepHit(user_id: Long, purchase_event_id: Long, n_clicks: Long)

  private def q58(s: SparkSession, dir: String): DataFrame = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[CepHit]
    val evs = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    val pat = Seq(
      Pattern.Sym[Ev]("c", _.event_type == "click", Pattern.Plus),
      Pattern.Sym[Ev]("p", _.event_type == "purchase"))
    Pattern.matchPattern(evs, (e: Ev) => e.user_id, (e: Ev) => (e.ts_us, e.event_id), pat) {
      (user, m) =>
        CepHit(user, m.measures("p").head.event_id, m.measures("c").length.toLong)
    }.toDF().orderBy("user_id", "purchase_event_id")
  }

  private val q58Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |runs AS (
      |  SELECT *, rn - 1 - coalesce(max(CASE WHEN event_type <> 'click' THEN rn END)
      |    OVER (PARTITION BY user_id ORDER BY rn
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_clicks
      |  FROM e)
      |SELECT user_id, event_id AS purchase_event_id, CAST(n_clicks AS BIGINT) AS n_clicks
      |FROM runs WHERE event_type = 'purchase' AND n_clicks >= 1
      |ORDER BY user_id, purchase_event_id""".stripMargin

  // q58's SQL form: the standard MATCH_RECOGNIZE clause through spark.sql
  // (reference BeamMatchRel.java:67 exposes the engine via Calcite SQL; the
  // graft parser extension rewrites the clause onto the same cep.Pattern
  // matcher q58 drives through the Scala API). Same oracle as q58.
  private def q81(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, purchase_event_id, n_clicks
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES LAST(P.event_id) AS purchase_event_id, COUNT(C.*) AS n_clicks
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (C+ P)
        |  DEFINE C AS C.event_type = 'click', P AS P.event_type = 'purchase'
        |)
        |ORDER BY user_id, purchase_event_id""".stripMargin)
  }

  // PREV physical navigation in DEFINE (reference impl/cep/CEPCall.java
  // PREV operator, NFA takeToNextRow semantics): per user, maximal runs of
  // strictly-decreasing event values — PATTERN (D+) with D defined against
  // the physical previous row. Oracle: lag() + gaps-and-islands SQL.
  private def q83(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, first_event_id, last_event_id, n_drops
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(D.event_id) AS first_event_id,
        |           LAST(D.event_id) AS last_event_id,
        |           COUNT(D.*) AS n_drops
        |  AFTER MATCH SKIP PAST LAST ROW
        |  PATTERN (D+)
        |  DEFINE D AS D.value < PREV(value)
        |)
        |ORDER BY user_id, first_event_id""".stripMargin)
  }

  private val q83Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |d AS (SELECT * FROM e WHERE pv IS NOT NULL AND value < pv),
      |g AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      |      FROM d)
      |SELECT user_id, min_by(event_id, rn) AS first_event_id,
      |  max_by(event_id, rn) AS last_event_id, count(*) AS n_drops
      |FROM g GROUP BY user_id, grp
      |ORDER BY user_id, first_event_id""".stripMargin

  // ALL ROWS PER MATCH with RUNNING measures (reference BeamMatchRel
  // emits per-row output when Calcite plans ALL ROWS): every row of each
  // decreasing run, with the running drop count. Oracle: row_number()
  // within the lag() islands.
  private def q84(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, event_id, n_sofar
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES COUNT(D.*) AS n_sofar
        |  ALL ROWS PER MATCH
        |  PATTERN (D+)
        |  DEFINE D AS D.value < PREV(value)
        |)
        |ORDER BY user_id, event_id""".stripMargin)
  }

  private val q84Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |d AS (SELECT * FROM e WHERE pv IS NOT NULL AND value < pv),
      |g AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
      |      FROM d)
      |SELECT user_id, event_id,
      |  row_number() OVER (PARTITION BY user_id, grp ORDER BY rn) AS n_sofar
      |FROM g ORDER BY user_id, event_id""".stripMargin

  // AFTER MATCH SKIP TO NEXT ROW (reference NFA match-resumption modes):
  // overlapping pairs — every row followed by a higher value starts its
  // own (A B) match, so consecutive rises yield matches sharing a row,
  // which PAST LAST ROW would suppress. Oracle: a lead() self-pair.
  private def q85(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, a_id, b_id
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(A.event_id) AS a_id, LAST(B.event_id) AS b_id
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A B)
        |  DEFINE B AS B.value > PREV(value)
        |)
        |ORDER BY user_id, a_id""".stripMargin)
  }

  private val q85Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nv,
      |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
      |  FROM events)
      |SELECT user_id, event_id AS a_id, nid AS b_id
      |FROM e WHERE nv > value
      |ORDER BY user_id, a_id""".stripMargin

  // AFTER MATCH SKIP TO LAST <symbol>: V-shapes (fall then rise) where the
  // recovery peak may START the next V — W-shape detection, the
  // SQL-standard use case for TO LAST. A match is a maximal strict
  // descent run immediately followed by a maximal ascent run; resuming AT
  // the peak row lets chained V's share it (PAST LAST ROW would lose the
  // first drop of the next V, TO NEXT ROW would emit sub-V suffixes).
  // Oracle: gaps-and-islands over lag() steps — every adjacent
  // (descent-run, ascent-run) pair IS a match, independently derived.
  private def q99(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, first_drop_id, start_value, bottom_value, peak_value, n_rows
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(DOWN.event_id) AS first_drop_id,
        |           FIRST(STRT.value) AS start_value,
        |           LAST(DOWN.value) AS bottom_value,
        |           LAST(UP.value) AS peak_value,
        |           COUNT(*) AS n_rows
        |  AFTER MATCH SKIP TO LAST UP
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS DOWN.value < PREV(value),
        |         UP AS UP.value > PREV(value)
        |)
        |ORDER BY user_id, first_drop_id""".stripMargin)
  }

  private val q99Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |s AS (SELECT *, CASE WHEN value < pv THEN 'D' WHEN value > pv THEN 'U' END AS st
      |      FROM e WHERE pv IS NOT NULL),
      |g AS (SELECT *, rn - row_number() OVER (PARTITION BY user_id, st ORDER BY rn) AS grp
      |      FROM s WHERE st IS NOT NULL),
      |runs AS (SELECT user_id, st, min(rn) AS rn0, max(rn) AS rn1,
      |           CAST(count(*) AS BIGINT) AS len,
      |           min_by(event_id, rn) AS first_id,
      |           min_by(pv, rn) AS start_v, max_by(value, rn) AS end_v
      |         FROM g GROUP BY user_id, st, grp)
      |SELECT d.user_id, d.first_id AS first_drop_id, d.start_v AS start_value,
      |  d.end_v AS bottom_value, u.end_v AS peak_value,
      |  1 + d.len + u.len AS n_rows
      |FROM runs d JOIN runs u
      |  ON d.user_id = u.user_id AND d.st = 'D' AND u.st = 'U' AND u.rn0 = d.rn1 + 1
      |ORDER BY d.user_id, first_drop_id""".stripMargin

  // Reluctant quantifiers (reference impl/cep/Quantifier.java:28-34): B*?
  // takes the SHORTEST filler, pairing each spike with the FIRST dip after
  // it (greedy B* would run to the LAST dip, a genuinely different
  // answer — ExtendedOpsSpec pins the divergence). SKIP PAST LAST ROW
  // makes the match set an alternating recurrence (next spike strictly
  // after the previous dip), which the oracle replays with a recursive
  // CTE — the p91 pattern for inherently sequential semantics.
  private def q103(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events")
    s.sql(
      """SELECT user_id, spike_id, dip_id, n_between
        |FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES FIRST(A.event_id) AS spike_id,
        |           LAST(C.event_id) AS dip_id,
        |           COUNT(B.*) AS n_between
        |  PATTERN (A B*? C)
        |  DEFINE A AS A.value >= 100, C AS C.value <= 10
        |)
        |ORDER BY user_id, spike_id""".stripMargin)
  }

  private val q103Sql =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |seq AS (
      |  SELECT DISTINCT user_id, CAST(0 AS BIGINT) AS a_rn, CAST(0 AS BIGINT) AS c_rn
      |  FROM e
      |  UNION ALL
      |  SELECT * FROM (
      |    SELECT s.user_id,
      |      (SELECT min(rn) FROM e sp WHERE sp.user_id = s.user_id
      |         AND sp.rn > s.c_rn AND sp.value >= 100) AS a_rn,
      |      (SELECT min(rn) FROM e d WHERE d.user_id = s.user_id AND d.value <= 10
      |         AND d.rn > (SELECT min(rn) FROM e sp WHERE sp.user_id = s.user_id
      |                       AND sp.rn > s.c_rn AND sp.value >= 100)) AS c_rn
      |    FROM seq s) t
      |  WHERE t.a_rn IS NOT NULL AND t.c_rn IS NOT NULL)
      |SELECT s.user_id, a.event_id AS spike_id, c.event_id AS dip_id,
      |  CAST(s.c_rn - s.a_rn - 1 AS BIGINT) AS n_between
      |FROM seq s
      |JOIN e a ON a.user_id = s.user_id AND a.rn = s.a_rn
      |JOIN e c ON c.user_id = s.user_id AND c.rn = s.c_rn
      |WHERE s.a_rn > 0
      |ORDER BY s.user_id, spike_id""".stripMargin

  // Arbitrary merging windows (WindowFn.mergeWindows): each event claims
  // [ts, ts+30min); overlapping/touching claims merge per user into
  // maximal windows — the oracle rebuilds the islands independently.
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    graft.streaming.Windows.mergeIntervals(ev, Seq("user_id"), "w_start", "w_end")
      .groupBy(col("user_id"), col("merged_start"), col("merged_end"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "merged_start")
  }

  private val q59Sql =
    """WITH iv AS (
      |  SELECT user_id, ts AS w_start, ts + INTERVAL 30 MINUTE AS w_end
      |  FROM events),
      |marked AS (
      |  SELECT *, CASE WHEN max(w_end) OVER (PARTITION BY user_id ORDER BY w_start, w_end
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |    OR w_start > max(w_end) OVER (PARTITION BY user_id ORDER BY w_start, w_end
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    THEN 1 ELSE 0 END AS is_new
      |  FROM iv),
      |islands AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY w_start, w_end
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS window_id
      |  FROM marked)
      |SELECT user_id, min(w_start) AS merged_start, max(w_end) AS merged_end,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM islands GROUP BY user_id, window_id
      |ORDER BY user_id, merged_start""".stripMargin

  // Correlated scalar subquery (Calcite decorrelates these before the
  // reference's rules run — BeamSqlDslExistsTest; Catalyst's
  // RewriteCorrelatedScalarSubquery turns it into an aggregate + join).
  // Identical SQL text runs on both engines.
  private val q71Text =
    """SELECT s1.s_suppkey, s1.s_name FROM supplier s1
      |WHERE s1.s_acctbal >= (SELECT avg(s2.s_acctbal) FROM supplier s2
      |                      WHERE s2.s_nationkey = s1.s_nationkey)
      |ORDER BY s1.s_suppkey""".stripMargin

  private def q71(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q71Text)
  }

  // IN subquery with HAVING (aggregate predicate pushdown + semi-join
  // rewrite); count-based threshold keeps it non-empty at every SF.
  private val q72Text =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    GROUP BY o_custkey HAVING count(*) >= 5)
      |ORDER BY c_custkey""".stripMargin

  private def q72(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q72Text)
  }

  // TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated to the same
  // outer row — the hardest decorrelation case (two semi/anti joins with
  // non-equi conjuncts). Same SQL text on both engines.
  private val q75Text =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  private def q75(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q75Text)
  }

  // N-ary CoGroup (schemas/transforms/CoGroup.java:80 with
  // withOptionalParticipation ≙ outer): three keyed collections —
  // customers, their orders, their nation's suppliers — cogrouped on
  // nationkey into per-key summaries via co-partitioned aggregates +
  // chained full-outer joins (the distributed form; no per-key iterators).
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk1"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk2"))
      .agg(count(lit(1)).as("n_suppliers"))
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk3"))
      .agg(round(sum("o_totalprice"), 2).as("order_total"))
    c.join(sup, col("nk1") === col("nk2"), "full_outer")
      .join(o, coalesce(col("nk1"), col("nk2")) === col("nk3"), "full_outer")
      .select(
        coalesce(col("nk1"), col("nk2"), col("nk3")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("order_total"), lit(0.0)).as("order_total"))
      .orderBy("nationkey")
  }

  private val q74Sql =
    """WITH c AS (SELECT c_nationkey nk, count(*) n_customers FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey nk, count(*) n_suppliers FROM supplier GROUP BY 1),
      |o AS (SELECT c_nationkey nk, round(sum(o_totalprice), 2) order_total
      |      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
      |SELECT coalesce(c.nk, s.nk, o.nk) AS nationkey,
      |  CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers,
      |  CAST(coalesce(n_suppliers, 0) AS BIGINT) AS n_suppliers,
      |  coalesce(order_total, 0.0) AS order_total
      |FROM c FULL OUTER JOIN s ON c.nk = s.nk
      |FULL OUTER JOIN o ON coalesce(c.nk, s.nk) = o.nk
      |ORDER BY nationkey""".stripMargin

  // Partition (reference transforms/Partition.java): a disjoint covering
  // split into n outputs sharing one cached upstream — gated by
  // re-aggregating each branch with its partition index and comparing to
  // the direct GROUP BY the split must equal.
  private def q145(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Dataflow._
    val parts = Tables.orders(s, dir)
      .partitionInto(4, col("o_orderkey") % 4)
    parts.zipWithIndex.map { case (p, i) =>
      p.agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(lit(i.toLong).as("part"), col("n"), col("total"))
    }.reduce(_.unionByName(_)).orderBy("part")
  }

  private val q145Sql =
    """SELECT CAST(o_orderkey % 4 AS BIGINT) AS part,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1 ORDER BY part""".stripMargin

  // WithFailures (reference transforms/WithFailures.java): a fallible
  // expression routes rows that fail to a failure output with the input
  // preserved, instead of failing the pipeline — here a try_divide whose
  // divisor is zero on every third key. Gate compares branch summaries.
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Dataflow._
    val (ok, failed) = Tables.orders(s, dir).withFailures(
      try_divide(col("o_totalprice").cast("double"),
        (col("o_orderkey") % 3).cast("double")),
      as = "ratio", inputOk = lit(true))
    val okSum = ok.agg(count(lit(1)).cast("long").as("n"),
        round(sum(col("ratio")), 2).as("s"))
      .select(lit("ok").as("branch"), col("n"), col("s"))
    val flSum = failed.agg(count(lit(1)).cast("long").as("n"))
      .select(lit("failed").as("branch"), col("n"),
        lit(null).cast("double").as("s"))
    okSum.unionByName(flSum).orderBy("branch")
  }

  private val q146Sql =
    """WITH r AS (
      |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
      |    ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 3) END AS ratio
      |  FROM orders)
      |SELECT 'failed' AS branch, CAST(count(*) AS BIGINT) AS n,
      |  CAST(NULL AS DOUBLE) AS s FROM r WHERE ratio IS NULL
      |UNION ALL
      |SELECT 'ok' AS branch, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(ratio), 2) AS s FROM r WHERE ratio IS NOT NULL
      |ORDER BY branch""".stripMargin

  // Keys/Values/KvSwap/WithKeys (reference transforms/{Keys,Values,KvSwap,
  // WithKeys}.java): the KV<K,V> shaping library — WithKeys designates a
  // key struct, KvSwap exchanges the pair. Gated by round-tripping both
  // against the flat projection they must reconstruct.
  private def q147(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Dataflow._
    val base = Tables.customer(s, dir).filter(col("c_custkey") <= 200)
    val swapped = base
      .select(col("c_custkey").as("key"), col("c_acctbal").as("value"))
      .kvSwap // key := acctbal, value := custkey
    val keyed = base.withKeys("c_nationkey", "c_mktsegment")
    keyed.select(col("c_custkey"),
        col("key.c_nationkey").as("knat"), col("key.c_mktsegment").as("kseg"))
      .join(swapped.select(col("value").as("c_custkey"),
        round(col("key").cast("double"), 2).as("bal_key")), "c_custkey")
      .orderBy("c_custkey")
  }

  private val q147Sql =
    """SELECT c_custkey, c_nationkey AS knat, c_mktsegment AS kseg,
      |  round(CAST(c_acctbal AS DOUBLE), 2) AS bal_key
      |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_partition_fanout" -> q145,
    "q146_with_failures" -> q146,
    "q147_kv_shaping" -> q147,
    "q71_correlated_scalar_subquery" -> q71,
    "q72_having_in_subquery" -> q72,
    "q74_cogroup_3way" -> q74,
    "q75_multi_exists_decorrelation" -> q75,
    "q44_sample_fixed_global" -> q44,
    "q45_udaf_combinefn" -> q45,
    "q46_sample_per_key" -> q46,
    "q47_offset_fetch" -> q47,
    "q48_hll_mergeable_sketch" -> q48,
    "q49_count_min_sketch" -> q49,
    "q123_freq_items_sketch" -> q123,
    "q56_sql_tumble" -> q56,
    "q57_sql_frontend" -> q57,
    "q58_cep_match_recognize" -> q58,
    "q81_sql_match_recognize" -> q81,
    "q83_match_recognize_prev" -> q83,
    "q84_match_recognize_all_rows" -> q84,
    "q85_match_recognize_skip_next" -> q85,
    "q99_match_recognize_skip_to_last" -> q99,
    "q103_match_recognize_reluctant" -> q103,
    "q59_merging_windows" -> q59)

  override val oracles: Map[String, String] = Map(
    "q145_partition_fanout" -> q145Sql,
    "q146_with_failures" -> q146Sql,
    "q147_kv_shaping" -> q147Sql,
    "q71_correlated_scalar_subquery" -> q71Text,
    "q72_having_in_subquery" -> q72Text,
    "q74_cogroup_3way" -> q74Sql,
    "q75_multi_exists_decorrelation" -> q75Text,
    "q44_sample_fixed_global" -> q44Sql,
    "q45_udaf_combinefn" -> q45Sql,
    "q46_sample_per_key" -> q46Sql,
    "q47_offset_fetch" -> q47Sql,
    "q48_hll_mergeable_sketch" -> q48Sql,
    "q49_count_min_sketch" -> q49Sql,
    "q123_freq_items_sketch" -> q123Sql,
    "q56_sql_tumble" -> q56Sql,
    "q57_sql_frontend" -> q57Text,
    "q58_cep_match_recognize" -> q58Sql,
    "q81_sql_match_recognize" -> q58Sql,
    "q83_match_recognize_prev" -> q83Sql,
    "q84_match_recognize_all_rows" -> q84Sql,
    "q85_match_recognize_skip_next" -> q85Sql,
    "q99_match_recognize_skip_to_last" -> q99Sql,
    "q103_match_recognize_reluctant" -> q103Sql,
    "q59_merging_windows" -> q59Sql)
}
