package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytic (OVER-clause) functions, sorts/limits/top-k, statistical and
  * positional aggregates, grouping sets (SURVEY.md §2.4–2.6).
  *
  * Reference surface: BeamWindowRel.java:78 (agg OVER partition/order/rows/
  * range frames), BeamBuiltinAnalyticFunctions.java:35-48 (FIRST_VALUE,
  * LAST_VALUE, ROW_NUMBER, RANK, DENSE_RANK, PERCENT_RANK), Top.java,
  * Latest.java, BeamBuiltinAggregations.java:55-74 (VAR_POP/VAR_SAMP/
  * COVAR_POP/COVAR_SAMP/COUNTIF/BIT_AND/BIT_OR/BIT_XOR), ArrayAgg/StringAgg
  * UDAFs, GroupIntoBatches.java:59.
  *
  * Scale notes: every window here partitions by a key (no global windows
  * without partitioning — a single-partition sort would serialize 100 TB);
  * top-k global uses TakeOrderedAndProject (k rows per partition then a
  * k-sized driver merge, never a full sort); per-key top-k is a window
  * row_number with partial pushdown. All frames are deterministic: every
  * ORDER BY includes a unique tiebreak column.
  */
object Analytics extends QueryModule {

  // ROW_NUMBER / RANK / DENSE_RANK / PERCENT_RANK over a keyed partition.
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q30Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(rank() OVER w AS INT) AS rnk,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  round(percent_rank() OVER w, 6) AS prnk
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // Running aggregates with ROWS frames.
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_total"),
        round(avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).as("moving_avg3"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("n_in_part"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q31Sql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
      |  CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_in_part
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // RANGE BETWEEN value frame (BeamWindowRel.java:60-72 documents the
  // RANGE x PRECEDING form). Value frames are tie-insensitive → no
  // tiebreak needed for determinism.
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(sum("l_extendedprice").over(w), 2).as("range_sum"),
        count(lit(1)).over(w).as("range_n"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q32Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  round(sum(l_extendedprice) OVER w, 2) AS range_sum,
      |  CAST(count(*) OVER w AS BIGINT) AS range_n
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
      |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  // FIRST_VALUE / LAST_VALUE / LEAD / LAG.
  private def q33(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(wf).as("first_order"),
        last("o_orderkey").over(wf).as("last_order"),
        lag("o_orderkey", 1).over(w).as("prev_order"),
        lead("o_orderkey", 1).over(w).as("next_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q33Sql =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w2 AS first_order,
      |  last_value(o_orderkey) OVER w2 AS last_order,
      |  lag(o_orderkey, 1) OVER w1 AS prev_order,
      |  lead(o_orderkey, 1) OVER w1 AS next_order
      |FROM orders
      |WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |       w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // Global top-k (Top.of / BeamSortRel): ORDER BY ... LIMIT compiles to
  // TakeOrderedAndProject — the distributed heap the reference's in-memory
  // Top.of approximates on one node.
  private def q34(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  private val q34Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // Per-key top-k (Top.perKey): window row_number ≤ k.
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  private val q35Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin

  // Latest.perKey (transforms/Latest.java) ≙ max_by on event time.
  private def q36(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        max_by(col("event_id"), col("ts")).as("latest_event_id"),
        max_by(col("event_type"), col("ts")).as("latest_type"),
        max(col("ts")).as("latest_ts"),
        min_by(col("event_id"), col("ts")).as("earliest_event_id"))
      .orderBy("user_id")

  private val q36Sql =
    """SELECT user_id,
      |  arg_max(event_id, ts) AS latest_event_id,
      |  arg_max(event_type, ts) AS latest_type,
      |  max(ts) AS latest_ts,
      |  arg_min(event_id, ts) AS earliest_event_id
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // Statistical + bit + conditional aggregates (BeamBuiltinAggregations
  // :55-74, VarianceFn/CovarianceFn/CountIf).
  private def q37(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(var_pop(col("value")), 4).as("var_pop_v"),
        round(var_samp(col("value")), 4).as("var_samp_v"),
        round(stddev_pop(col("value")), 4).as("stddev_pop_v"),
        round(covar_pop(col("value"), col("user_id").cast("double")), 4).as("covar_pop_v"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 4).as("covar_samp_v"),
        round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_v"),
        count_if(col("value") > 100).as("n_big"),
        bit_and(col("user_id")).as("band"),
        bit_or(col("user_id")).as("bor"),
        bit_xor(col("user_id")).as("bxor"))
      .orderBy("event_type")

  private val q37Sql =
    """SELECT event_type,
      |  round(var_pop(value), 4) AS var_pop_v,
      |  round(var_samp(value), 4) AS var_samp_v,
      |  round(stddev_pop(value), 4) AS stddev_pop_v,
      |  round(covar_pop(value, CAST(user_id AS DOUBLE)), 4) AS covar_pop_v,
      |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS covar_samp_v,
      |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_v,
      |  CAST(count_if(value > 100) AS BIGINT) AS n_big,
      |  CAST(bit_and(user_id) AS BIGINT) AS band,
      |  CAST(bit_or(user_id) AS BIGINT) AS bor,
      |  CAST(bit_xor(user_id) AS BIGINT) AS bxor
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ARRAY_AGG / STRING_AGG (impl/udaf/{ArrayAgg,StringAgg}.java) — made
  // deterministic by sorting the collected set.
  private def q38(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        array_join(slice(array_sort(collect_set(col("user_id"))), 1, 5), ",").as("first5_users"),
        size(collect_set(col("user_id"))).as("n_users"),
        size(collect_list(col("user_id"))).as("n_rows"))
      .orderBy("event_type")

  private val q38Sql =
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT user_id))[1:5], ',') AS first5_users,
      |  CAST(len(list(DISTINCT user_id)) AS INT) AS n_users,
      |  CAST(count(user_id) AS INT) AS n_rows
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // Exact percentiles (the reference's ApproximateQuantiles contract,
  // ApproximateQuantiles.java:61, verified here against DuckDB's exact
  // quantile_cont; the approx variant is q40, accuracy-gated).
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
      .orderBy("event_type")

  private val q39Sql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.25), 4) AS p25,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.75), 4) AS p75,
      |  round(quantile_cont(value, 0.95), 4) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // Approximate aggregates (ApproximateUnique / HllCount / percentile_approx)
  // — sketch bytes are engine-local, so the gate is a checked ACCURACY
  // contract (reference analog: extensions/sketching accuracy-bounded
  // tests): per group, both HLL estimators within 2% relative error of the
  // exact distinct count, approx p50 within 1% of the exact median. The
  // oracle re-derives the exact counts and pins the booleans TRUE. At
  // scale these sketches are the ones to reach for: mergeable,
  // single-pass, fixed memory.
  private def q40(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id")).as("approx_users"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
        expr("percentile(value, 0.5)").as("exact_p50"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") <= 0.02).as("approx_users_ok"),
        (abs(col("hll_users") - col("exact_users")).cast("double")
          / col("exact_users") <= 0.02).as("hll_users_ok"),
        (abs(col("approx_p50") - col("exact_p50"))
          / greatest(abs(col("exact_p50")), lit(1e-9)) <= 0.01).as("p50_ok"))
      .orderBy("event_type")

  private val q40Sql =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_users_ok, TRUE AS hll_users_ok, TRUE AS p50_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ROLLUP — not supported by the reference's SQL (SURVEY §2.4 notes it's
  // free via Catalyst); exposed as a capability superset.
  private def q41(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q41Sql =
    """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  private def q42(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(avg("l_quantity"), 4).as("avg_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q42Sql =
    """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(l_quantity), 4) AS avg_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // GroupIntoBatches (batch analog, GroupIntoBatches.java:59): per-key
  // batch assignment via windowed row_number; output batch sizes.
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(s, dir)
      .withColumn("batch_id", floor((row_number().over(w) - 1) / 4))
      .groupBy(col("o_custkey"), col("batch_id"))
      .agg(count(lit(1)).as("batch_size"))
      .orderBy("o_custkey", "batch_id")
  }

  private val q43Sql =
    """SELECT o_custkey, CAST(floor((rn - 1) / 4) AS BIGINT) AS batch_id,
      |  CAST(count(*) AS BIGINT) AS batch_size
      |FROM (SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderkey) AS rn FROM orders) t
      |GROUP BY o_custkey, batch_id ORDER BY o_custkey, batch_id""".stripMargin

  // T-Digest mergeable quantile sketch (graft.plans.TDigestSketch;
  // reference sdks/java/extensions/sketching/TDigestQuantiles.java).
  // Estimates depend on merge order, so the gate checks ACCURACY instead
  // of reproduction: per-(returnflag, linestatus) digests merge up to
  // returnflag level (exercising sketch + merge + quantile), and the
  // emitted booleans assert each estimated quantile lands within 1%
  // relative error of the EXACT percentile — the oracle expects all-true,
  // so an accuracy regression is a hash mismatch, not a silent drift.
  private def q80(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{tdigestSketch, tdigestMerge, tdigestQuantile}
    val li = Tables.lineitem(s, dir)
    val parts = li.groupBy("l_returnflag", "l_linestatus")
      .agg(tdigestSketch(col("l_extendedprice").cast("double")).as("sk"))
    val merged = parts.groupBy("l_returnflag").agg(tdigestMerge(col("sk")).as("sk"))
    val exact = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").as("ex"))
    def ok(q: Double, i: Int) = {
      val e = element_at(col("ex"), i)
      (abs(tdigestQuantile(col("sk"), q) - e) / e < 0.01).as(s"ok_p${(q * 100).toInt}")
    }
    merged.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"), ok(0.5, 1), ok(0.95, 2), ok(0.99, 3))
      .orderBy("l_returnflag")
  }

  private val q80Sql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |  TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // One-pass dataset profile (ANALYZE-for-data-quality): per-column
  // row/null/distinct counts and native-typed min/max over four
  // heterogeneous lineitem columns; exact distinct here so the oracle is
  // a value compare (approx HLL is the documented 100 TB default).
  private def p126(s: SparkSession, dir: String): DataFrame =
    graft.api.Profile.describe(Tables.lineitem(s, dir),
      Seq("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag"),
      exactDistinct = true)
      .orderBy("column")

  private val p126Sql = Seq("l_orderkey", "l_quantity", "l_shipdate", "l_returnflag")
    .map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
         |FROM lineitem""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p126_dataset_profile" -> p126,
    "q80_tdigest_quantiles" -> q80,
    "q30_window_rank" -> q30,
    "q31_window_running" -> q31,
    "q32_window_range_frame" -> q32,
    "q33_first_last_lead_lag" -> q33,
    "q34_top_k_global" -> q34,
    "q35_top_k_per_key" -> q35,
    "q36_latest_per_key" -> q36,
    "q37_stat_aggs" -> q37,
    "q38_array_string_agg" -> q38,
    "q39_percentiles" -> q39,
    "q40_approx_aggs" -> q40,
    "q41_rollup" -> q41,
    "q42_cube" -> q42,
    "q43_group_into_batches" -> q43)

  override val oracles: Map[String, String] = Map(
    "p126_dataset_profile" -> p126Sql,
    "q80_tdigest_quantiles" -> q80Sql,
    "q30_window_rank" -> q30Sql,
    "q31_window_running" -> q31Sql,
    "q32_window_range_frame" -> q32Sql,
    "q33_first_last_lead_lag" -> q33Sql,
    "q34_top_k_global" -> q34Sql,
    "q35_top_k_per_key" -> q35Sql,
    "q36_latest_per_key" -> q36Sql,
    "q37_stat_aggs" -> q37Sql,
    "q38_array_string_agg" -> q38Sql,
    "q39_percentiles" -> q39Sql,
    "q40_approx_aggs" -> q40Sql,
    "q41_rollup" -> q41Sql,
    "q42_cube" -> q42Sql,
    "q43_group_into_batches" -> q43Sql)
}
