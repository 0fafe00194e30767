package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operator coverage (SURVEY.md §2.1–2.4, §2.7):
  * aggregation with combiner lifting, filter/project pushdown, the full
  * join taxonomy (inner/outer/semi/anti/broadcast/cogroup), Flatten
  * (union all), set operations, and Distinct.
  *
  * Scale notes (100 TB): every groupBy here is a hash aggregate with
  * map-side partial aggregation (Beam's combiner lifting,
  * beam_runner_api.proto:375-401, is automatic in Catalyst); joins against
  * dimension tables (part/nation/region/customer at TPC-H ratios) are
  * explicitly broadcast so the fact-table scan never shuffles; the
  * remaining shuffles are on aggregation keys only, after pushed-down
  * filters have reduced the scan.
  */
object Relational extends QueryModule {

  // TPC-H Q1 shape: scan-heavy agg, the partial-agg + pushdown showcase.
  // Reference analog: Combine.perKey (transforms/Combine.java:398).
  private def q01(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // TPC-H Q6 shape: pure filter + global agg; filters reach the parquet scan.
  private def q02(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q02Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  // TPC-H Q3 shape: 3-way join, dimension side broadcast, agg on fact keys.
  // Money math in DECIMAL: double-summing l_extendedprice*(1-l_discount) is
  // order-dependent and lands on half-cent boundaries; decimal products and
  // sums are exact, so the result is hash-stable at any scale and partition
  // count. Final cast to DOUBLE (exact for money magnitudes) keeps the
  // output type portable.
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1996-06-30").cast("timestamp"))
    val revenue = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(revenue).cast("double").as("revenue"))
      .orderBy("l_orderkey")
  }

  private val q03Sql =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY l_orderkey""".stripMargin

  // Broadcast join against a small dimension (Beam side-input join,
  // BeamSideInputJoinRel.java:69 ≙ broadcast hash join — no fact shuffle).
  private def q04(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("total_price"))
      .orderBy("p_brand")

  private val q04Sql =
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
      |  round(sum(l_extendedprice), 2) AS total_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // TPC-H Q5 shape: 5-way star join; all dimensions broadcast.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val dims = broadcast(
      Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE")),
          col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  private val q05Sql =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // Semi join ≙ SQL EXISTS (reference: Calcite rewrite, BeamSqlDslExistsTest).
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 150000)
    Tables.customer(s, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  // Anti join ≙ SQL NOT EXISTS (customers with no urgent orders).
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(s, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // Left outer join + agg (schemas/transforms/Join.java:133 left outer).
  private def q08(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spent"))
      .orderBy("c_custkey")

  private val q08Sql =
    """SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin

  // Full outer join of two aggregates (CoGroup with optional participation,
  // schemas/transforms/CoGroup.java:168 withOptionalParticipation).
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  private val q09Sql =
    """SELECT coalesce(c.ck, s.sk) AS nationkey,
      |  CAST(coalesce(c.n_customers, 0) AS BIGINT) AS n_customers,
      |  CAST(coalesce(s.n_suppliers, 0) AS BIGINT) AS n_suppliers
      |FROM (SELECT c_nationkey AS ck, count(*) AS n_customers FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
      |ON c.ck = s.sk
      |ORDER BY nationkey""".stripMargin

  // Flatten ≙ UNION ALL (transforms/Flatten.java) then re-aggregate.
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    a.unionByName(b).groupBy("custkey").agg(count(lit(1)).as("n"))
      .orderBy("custkey")
  }

  private val q10Sql =
    """SELECT custkey, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') u
      |GROUP BY custkey ORDER BY custkey""".stripMargin

  // UNION DISTINCT (Sets.unionDistinct, transforms/Sets.java:516).
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val b = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    a.unionByName(b).distinct().orderBy("nationkey")
  }

  private val q11Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // INTERSECT / EXCEPT, distinct + ALL variants (transforms/Sets.java:116-586).
  private def setOperands(s: SparkSession, dir: String): (DataFrame, DataFrame) = (
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")),
    Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")))

  private def q12(s: SparkSession, dir: String): DataFrame = {
    val (a, b) = setOperands(s, dir); a.intersect(b).orderBy("nationkey")
  }
  private val q12Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  // Subtrahend restricted to low nation keys so the result is non-empty at
  // every scale factor (suppliers cover all 25 nations from sf0.01 up).
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val b = Tables.supplier(s, dir).filter(col("s_nationkey") < 13)
      .select(col("s_nationkey").as("nationkey"))
    a.except(b).orderBy("nationkey")
  }
  private val q13Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier WHERE s_nationkey < 13
      |ORDER BY nationkey""".stripMargin

  private def q14(s: SparkSession, dir: String): DataFrame = {
    val (a, b) = setOperands(s, dir); a.intersectAll(b).orderBy("nationkey")
  }
  private val q14Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT ALL
      |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  private def q15(s: SparkSession, dir: String): DataFrame = {
    val (a, b) = setOperands(s, dir); a.exceptAll(b).orderBy("nationkey")
  }
  private val q15Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT ALL
      |SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin

  // Distinct (transforms/Distinct.java:67) ≙ dropDuplicates.
  private def q16(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus"))
      .dropDuplicates()
      .orderBy("l_returnflag", "l_linestatus")

  private val q16Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // CoGroupByKey (transforms/join/CoGroupByKey.java): group two keyed
  // collections by the same key, emit per-key summaries of both sides.
  // Expressed as co-partitioned aggregates + full outer join — the plan a
  // 1000-executor cluster wants (no per-key iterators materialized).
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val ordersByCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("order_total"))
    val liByCust = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("custkey2"))
      .agg(count(lit(1)).as("n_items"))
    ordersByCust.join(liByCust, col("custkey") === col("custkey2"), "full_outer")
      .select(coalesce(col("custkey"), col("custkey2")).as("custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(round(col("order_total"), 2), lit(0.0)).as("order_total"),
        coalesce(col("n_items"), lit(0L)).as("n_items"))
      .orderBy("custkey")
  }

  private val q17Sql =
    """SELECT coalesce(a.custkey, b.custkey2) AS custkey,
      |  CAST(coalesce(a.n_orders, 0) AS BIGINT) AS n_orders,
      |  coalesce(round(a.order_total, 2), 0.0) AS order_total,
      |  CAST(coalesce(b.n_items, 0) AS BIGINT) AS n_items
      |FROM (SELECT o_custkey AS custkey, count(*) AS n_orders,
      |        round(sum(o_totalprice), 2) AS order_total
      |      FROM orders GROUP BY 1) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey AS custkey2, count(*) AS n_items
      |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |      GROUP BY 1) b
      |ON a.custkey = b.custkey2
      |ORDER BY custkey""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pushdown" -> q01,
    "q02_filter_global_agg" -> q02,
    "q03_join_agg" -> q03,
    "q04_broadcast_join" -> q04,
    "q05_star_join" -> q05,
    "q06_semi_join" -> q06,
    "q07_anti_join" -> q07,
    "q08_left_outer_join" -> q08,
    "q09_full_outer_join" -> q09,
    "q10_flatten_union_all" -> q10,
    "q11_union_distinct" -> q11,
    "q12_intersect" -> q12,
    "q13_except" -> q13,
    "q14_intersect_all" -> q14,
    "q15_except_all" -> q15,
    "q16_distinct" -> q16,
    "q17_cogroup" -> q17)

  override val oracles: Map[String, String] = Map(
    "q01_agg_pushdown" -> q01Sql,
    "q02_filter_global_agg" -> q02Sql,
    "q03_join_agg" -> q03Sql,
    "q04_broadcast_join" -> q04Sql,
    "q05_star_join" -> q05Sql,
    "q06_semi_join" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_left_outer_join" -> q08Sql,
    "q09_full_outer_join" -> q09Sql,
    "q10_flatten_union_all" -> q10Sql,
    "q11_union_distinct" -> q11Sql,
    "q12_intersect" -> q12Sql,
    "q13_except" -> q13Sql,
    "q14_intersect_all" -> q14Sql,
    "q15_except_all" -> q15Sql,
    "q16_distinct" -> q16Sql,
    "q17_cogroup" -> q17Sql)
}
