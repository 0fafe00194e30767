package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar expression surface (SURVEY.md §2.8): the reference's tested 92
  * Calcite operators (BeamSqlDslSqlStdOperatorsTest.java:183-1370) plus its
  * extra UDF set (impl/udf/BuiltinStringFunctions.java,
  * BuiltinHashFunctions.java, BuiltinTrigonometricFunctions.java).
  * Every function here is a built-in Catalyst expression — whole-stage
  * codegen applies, no UDF serialization anywhere.
  *
  * Oracle-parity notes baked in: DuckDB regexp_replace needs the 'g' flag
  * to match Spark's replace-all; DuckDB casts double→int by rounding while
  * Spark truncates (align via explicit trunc); Spark dayofweek is 1-based
  * Sunday, DuckDB 0-based (align with +1); doubles rounded on both sides.
  */
object Scalar extends QueryModule {

  // String functions over part names (CHAR_LENGTH/UPPER/LOWER/TRIM/SUBSTRING/
  // POSITION/||/LPAD/RPAD/REVERSE/STARTS_WITH/ENDS_WITH/LENGTH_BYTES).
  private def q20(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        length(col("p_name")).as("chlen"),
        octet_length(col("p_name")).as("bytelen"),
        substring(col("p_name"), 3, 5).as("sub"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        reverse(col("p_name")).as("rev"),
        trim(lit("  pad  ")).as("trimmed"),
        locate("a", col("p_name")).cast("int").as("pos_a"),
        col("p_name").startsWith("a").as("sw"),
        col("p_type").endsWith("d").as("ew"))
      .orderBy("p_partkey")

  private val q20Sql =
    """SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo,
      |  CAST(length(p_name) AS INT) AS chlen,
      |  CAST(strlen(p_name) AS INT) AS bytelen,
      |  substring(p_name, 3, 5) AS sub,
      |  p_brand || '#' || p_type AS cat,
      |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
      |  reverse(p_name) AS rev, trim('  pad  ') AS trimmed,
      |  CAST(coalesce(position('a' in p_name), 0) AS INT) AS pos_a,
      |  starts_with(p_name, 'a') AS sw, ends_with(p_type, 'd') AS ew
      |FROM part ORDER BY p_partkey""".stripMargin

  // Hash + hex functions (reference BuiltinHashFunctions.java MD5/SHA256;
  // TO_HEX/FROM_HEX from BuiltinStringFunctions.java).
  private def q21(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .select(
        col("n_nationkey"),
        md5(col("n_name").cast("binary")).as("md5_hex"),
        sha2(col("n_name").cast("binary"), 256).as("sha256_hex"),
        lower(hex(col("n_name"))).as("to_hex"),
        decode(unhex(lower(hex(col("n_name")))), "UTF-8").as("hex_roundtrip"))
      .orderBy("n_nationkey")

  private val q21Sql =
    """SELECT n_nationkey, md5(n_name) AS md5_hex, sha256(n_name) AS sha256_hex,
      |  lower(hex(n_name)) AS to_hex,
      |  decode(from_hex(lower(hex(n_name)))) AS hex_roundtrip
      |FROM nation ORDER BY n_nationkey""".stripMargin

  // Math functions (ABS LN SQRT ROUND LOG10 EXP trig SIGN POWER PI etc.
  // + reference COSH/SINH/TANH, emulated in the oracle via exp()).
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val x = col("s_acctbal") / 10000.0 // normalize into trig-friendly range
    Tables.supplier(s, dir)
      .select(
        col("s_suppkey"),
        round(abs(col("s_acctbal")), 2).as("abs_v"),
        round(ln(abs(col("s_acctbal")) + 1), 6).as("ln_v"),
        round(sqrt(abs(col("s_acctbal"))), 6).as("sqrt_v"),
        round(log10(abs(col("s_acctbal")) + 1), 6).as("log10_v"),
        round(exp(x), 6).as("exp_v"),
        round(pow(x, 2), 6).as("pow_v"),
        signum(col("s_acctbal")).as("sign_v"),
        round(sin(x), 6).as("sin_v"),
        round(cos(x), 6).as("cos_v"),
        round(tan(x), 6).as("tan_v"),
        round(atan(x), 6).as("atan_v"),
        round(atan2(x, lit(1.0)), 6).as("atan2_v"),
        round(degrees(x), 6).as("degrees_v"),
        round(radians(x), 6).as("radians_v"),
        round(lit(1.0) / tan(x + 2), 6).as("cot_v"),
        round(cosh(x), 6).as("cosh_v"),
        round(sinh(x), 6).as("sinh_v"),
        round(tanh(x), 6).as("tanh_v"),
        round(lit(Math.PI), 6).as("pi_v"),
        floor(col("s_acctbal")).as("floor_v"),
        ceil(col("s_acctbal")).as("ceil_v"),
        round(col("s_acctbal") % 97, 6).as("mod_v"))
      .orderBy("s_suppkey")
  }

  private val q22Sql =
    """SELECT s_suppkey,
      |  round(abs(s_acctbal), 2) AS abs_v,
      |  round(ln(abs(s_acctbal) + 1), 6) AS ln_v,
      |  round(sqrt(abs(s_acctbal)), 6) AS sqrt_v,
      |  round(log10(abs(s_acctbal) + 1), 6) AS log10_v,
      |  round(exp(s_acctbal/10000.0), 6) AS exp_v,
      |  round(pow(s_acctbal/10000.0, 2), 6) AS pow_v,
      |  CAST(sign(s_acctbal) AS DOUBLE) AS sign_v,
      |  round(sin(s_acctbal/10000.0), 6) AS sin_v,
      |  round(cos(s_acctbal/10000.0), 6) AS cos_v,
      |  round(tan(s_acctbal/10000.0), 6) AS tan_v,
      |  round(atan(s_acctbal/10000.0), 6) AS atan_v,
      |  round(atan2(s_acctbal/10000.0, 1.0), 6) AS atan2_v,
      |  round(degrees(s_acctbal/10000.0), 6) AS degrees_v,
      |  round(radians(s_acctbal/10000.0), 6) AS radians_v,
      |  round(cot(s_acctbal/10000.0 + 2), 6) AS cot_v,
      |  round((exp(s_acctbal/10000.0) + exp(-s_acctbal/10000.0)) / 2, 6) AS cosh_v,
      |  round((exp(s_acctbal/10000.0) - exp(-s_acctbal/10000.0)) / 2, 6) AS sinh_v,
      |  round((exp(2*s_acctbal/10000.0) - 1) / (exp(2*s_acctbal/10000.0) + 1), 6) AS tanh_v,
      |  round(pi(), 6) AS pi_v,
      |  CAST(floor(s_acctbal) AS BIGINT) AS floor_v,
      |  CAST(ceil(s_acctbal) AS BIGINT) AS ceil_v,
      |  round(s_acctbal % 97, 6) AS mod_v
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  // Date/time extraction + arithmetic (EXTRACT family, FLOOR-to-unit,
  // TIMESTAMPADD/TIMESTAMPDIFF — reference BeamSqlDslSqlStdOperatorsTest
  // :1089-1229). Spark dayofweek is 1-based-Sunday; DuckDB 0-based.
  private def q23(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        weekofyear(col("o_orderdate")).as("w"),
        dayofyear(col("o_orderdate")).as("doy"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_floor"),
        expr("timestampadd(DAY, 30, o_orderdate)").as("plus_30d"),
        expr("timestampdiff(DAY, o_orderdate, timestamp'2002-01-01 00:00:00')").as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  private val q23Sql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(week(o_orderdate) AS INT) AS w,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_floor,
      |  o_orderdate + INTERVAL 30 DAY AS plus_30d,
      |  date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // Conditional expressions: CASE / NULLIF / COALESCE / LEAST / GREATEST /
  // IN / BETWEEN / IS NULL (reference :1368-1370, :236-238).
  private def q24(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
        least(col("o_totalprice"), lit(150000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floored"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_urgent"),
        col("o_totalprice").between(80000, 120000).as("in_band"),
        col("o_custkey").isNull.as("cust_missing"))
      .orderBy("o_orderkey")

  private val q24Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'high'
      |       WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
      |  nullif(o_orderstatus, 'P') AS status_or_null,
      |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
      |  least(o_totalprice, 150000.0) AS capped,
      |  greatest(o_totalprice, 50000.0) AS floored,
      |  o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
      |  o_totalprice BETWEEN 80000 AND 120000 AS in_band,
      |  o_custkey IS NULL AS cust_missing
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // CAST matrix (BeamSqlCastTest): numeric narrowing aligned via trunc,
  // string→number, number→string, timestamp→date→string.
  private def q25(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        col("p_size").cast("long").as("size_long"),
        col("p_size").cast("double").as("size_double"),
        col("p_size").cast("string").as("size_str"),
        col("p_retailprice").cast("int").as("price_int"), // Spark truncates
        col("p_retailprice").cast("decimal(12,2)").cast("string").as("price_str"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
        // DECIMAL round-trip witnessed via price_str above; emitted as DOUBLE
        // because the driver's hash of DECIMAL output columns is not portable.
        col("p_retailprice").cast("decimal(12,2)").cast("double").as("price_dec"))
      .orderBy("p_partkey")

  private val q25Sql =
    """SELECT p_partkey,
      |  CAST(p_size AS BIGINT) AS size_long,
      |  CAST(p_size AS DOUBLE) AS size_double,
      |  CAST(p_size AS VARCHAR) AS size_str,
      |  CAST(trunc(p_retailprice) AS INT) AS price_int,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
      |  CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
      |FROM part ORDER BY p_partkey""".stripMargin

  // Regex family (transforms/Regex.java:44): extract, replace-all, match,
  // split-count. DuckDB needs the 'g' flag for replace-all parity.
  private def q26(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "\\b(\\w{7,})\\b", 1).as("first_long_word"),
        regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
        col("text").rlike("data").as("mentions_data"),
        size(split(col("text"), "\\s+")).as("n_splits"))
      .filter(col("doc_id") < 100)
      .orderBy("doc_id")

  private val q26Sql =
    """SELECT doc_id,
      |  coalesce(regexp_extract(text, '\b(\w{7,})\b', 1), '') AS first_long_word,
      |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
      |  regexp_matches(text, 'data') AS mentions_data,
      |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_splits
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // JSON parse (JsonToRow, transforms/JsonToRow.java:88): extract typed
  // field from the events props JSON payload, then aggregate.
  private def q27(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"), max("k").as("k_max"))
      .orderBy("event_type")

  private val q27Sql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // Array constructors + indexing + CARDINALITY (BeamSqlDslArrayTest;
  // 1-based indexing like Calcite's arr[i]).
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(toks).as("cardinality"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "data").as("has_data"),
        size(array_distinct(toks)).as("n_unique"),
        array_join(slice(sort_array(array_distinct(toks)), 1, 3), ",").as("first3_sorted"))
      .filter(col("doc_id") < 100)
      .orderBy("doc_id")
  }

  private val q28Sql =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks
      |           FROM documents WHERE doc_id < 100)
      |SELECT doc_id, CAST(len(toks) AS INT) AS cardinality,
      |  toks[1] AS first_tok, toks[-1] AS last_tok,
      |  list_contains(toks, 'data') AS has_data,
      |  CAST(len(list_distinct(toks)) AS INT) AS n_unique,
      |  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
      |FROM t ORDER BY doc_id""".stripMargin

  // UNNEST (BeamUnnestRel.java:53) ≙ explode: flatten tokens to rows,
  // re-aggregate per token.
  private def q29(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("tok")

  private val q29Sql =
    """SELECT tok, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
      |      FROM documents WHERE doc_id < 50) t
      |GROUP BY tok ORDER BY tok""".stripMargin

  // INITCAP / OVERLAY / TRANSLATE / REPEAT / interval arithmetic /
  // FLOOR-to-quarter (BeamSqlDslSqlStdOperatorsTest :701-710, :1089;
  // DuckDB lacks initcap/overlay, so the oracle emulates them).
  private def q19(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") <= 200)
      .select(col("o_orderkey"),
        initcap(translate(lower(col("o_orderpriority")), "-", " ")).as("pri_initcap"),
        overlay(col("o_orderpriority"), lit("XX"), lit(2), lit(3)).as("pri_overlay"),
        repeat(substring(col("o_orderstatus"), 1, 1), 3).as("status_rep"),
        (col("o_orderdate") + expr("INTERVAL 2 MONTHS")).as("plus_2m"),
        date_trunc("quarter", col("o_orderdate")).as("qtr_start"))
      .orderBy("o_orderkey")

  private val q19Sql =
    """SELECT o_orderkey,
      |  array_to_string(list_transform(
      |    string_split(replace(lower(o_orderpriority), '-', ' '), ' '),
      |    w -> CASE WHEN len(w) = 0 THEN w
      |         ELSE upper(w[1:1]) || lower(w[2:]) END), ' ') AS pri_initcap,
      |  substr(o_orderpriority, 1, 1) || 'XX' || substr(o_orderpriority, 5) AS pri_overlay,
      |  repeat(substr(o_orderstatus, 1, 1), 3) AS status_rep,
      |  o_orderdate + INTERVAL 2 MONTH AS plus_2m,
      |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr_start
      |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin

  // ZetaSQL-dialect delta (reference extensions/sql/zetasql/.../
  // SupportedZetaSqlBuiltinFunctions.java), exercised through the SQL
  // front end so the gate proves the REGISTERED functions, not DataFrame
  // equivalents: SAFE_ arithmetic (NULL instead of error on overflow /
  // zero divisor), IEEE_DIVIDE (±Inf/NaN), DIV, GENERATE_ARRAY's
  // empty-on-reversed-range, strftime-dialect PARSE_DATE/FORMAT_DATE,
  // ZetaSQL-argument-order TIMESTAMP_ADD/DIFF, 0-based ARRAY_AT_OFFSET
  // with SAFE_ bounds behavior, FORMAT (printf), and the COUNTIF /
  // LOGICAL_AND / LOGICAL_OR aggregates (as windows). The DuckDB oracle
  // derives overflow independently in HUGEINT, re-renders dates with its
  // own strftime, and emulates only the IEEE inf-sign rule (stated
  // inline) that no portable SQL can compute.
  private def q143(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("zeta_nation")
    s.sql("""
      SELECT n_nationkey,
        round(safe_divide(n_nationkey, n_nationkey % 3), 4) AS sdiv,
        safe_add(9223372036854775807, n_nationkey) AS sadd,
        safe_subtract(-9223372036854775808, n_nationkey) AS ssub,
        safe_multiply(4611686018427387904, n_nationkey) AS smul,
        safe_negate(-9223372036854775808 + n_nationkey) AS sneg,
        round(ieee_divide(n_nationkey + 1, 4), 4) AS ieee,
        is_inf(ieee_divide(n_nationkey % 2, 0)) AS infchk,
        n_nationkey div 4 AS idiv,
        format('%03d|%s', n_nationkey, n_name) AS fmt,
        concat_ws(',', generate_array(1, n_nationkey % 5)) AS genarr,
        format_date('%Y/%m/%d', date_add(DATE '2024-01-01', n_nationkey)) AS fdate,
        parse_date('%Y-%m-%d', format('2024-03-%02d', n_nationkey + 1)) AS pdate,
        timestamp_diff(timestamp_add(TIMESTAMP '2024-01-01 00:00:00',
          n_nationkey, 'HOUR'), TIMESTAMP '2024-01-01 00:00:00', 'HOUR') AS tdiff,
        array_at_offset(array(10, 20, 30), n_nationkey % 3) AS offok,
        safe_array_at_offset(array(10, 20, 30), n_nationkey) AS offsafe,
        safe_array_at_ordinal(array(10, 20, 30), n_nationkey % 4) AS ordsafe,
        countif(n_nationkey % 2 = 0) OVER () AS cif,
        logical_and(n_nationkey < 30) OVER () AS land,
        logical_or(n_nationkey > 23) OVER () AS lor
      FROM zeta_nation ORDER BY n_nationkey""")
  }

  private val q143Sql =
    """SELECT n_nationkey,
      |  round(CASE WHEN n_nationkey % 3 = 0 THEN NULL
      |    ELSE CAST(n_nationkey AS DOUBLE) / (n_nationkey % 3) END, 4) AS sdiv,
      |  CAST(CASE WHEN 9223372036854775807::HUGEINT + n_nationkey <= 9223372036854775807::HUGEINT
      |    THEN 9223372036854775807::HUGEINT + n_nationkey END AS BIGINT) AS sadd,
      |  CAST(CASE WHEN (-9223372036854775807 - 1)::HUGEINT - n_nationkey >= (-9223372036854775807 - 1)::HUGEINT
      |    THEN (-9223372036854775807 - 1)::HUGEINT - n_nationkey END AS BIGINT) AS ssub,
      |  CAST(CASE WHEN 4611686018427387904::HUGEINT * n_nationkey <= 9223372036854775807::HUGEINT
      |    THEN 4611686018427387904::HUGEINT * n_nationkey END AS BIGINT) AS smul,
      |  CAST(CASE WHEN -((-9223372036854775807 - 1)::HUGEINT + n_nationkey) <= 9223372036854775807::HUGEINT
      |    THEN -((-9223372036854775807 - 1)::HUGEINT + n_nationkey) END AS BIGINT) AS sneg,
      |  round(CAST(n_nationkey + 1 AS DOUBLE) / 4, 4) AS ieee,
      |  n_nationkey % 2 = 1 AS infchk, -- IEEE rule: x/0 = Inf iff x<>0 (0/0 = NaN)
      |  CAST(n_nationkey // 4 AS BIGINT) AS idiv,
      |  printf('%03d|%s', n_nationkey, n_name) AS fmt,
      |  coalesce(array_to_string(generate_series(1, n_nationkey % 5, 1), ','), '') AS genarr,
      |  strftime(DATE '2024-01-01' + n_nationkey, '%Y/%m/%d') AS fdate,
      |  CAST(strptime(printf('2024-03-%02d', n_nationkey + 1), '%Y-%m-%d') AS DATE) AS pdate,
      |  CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
      |    TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (n_nationkey) HOUR) AS BIGINT) AS tdiff,
      |  list_extract([10, 20, 30], (n_nationkey % 3) + 1) AS offok,
      |  list_extract([10, 20, 30], n_nationkey + 1) AS offsafe,
      |  CASE WHEN n_nationkey % 4 = 0 THEN NULL
      |    ELSE list_extract([10, 20, 30], n_nationkey % 4) END AS ordsafe,
      |  CAST(sum(CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END) OVER () AS BIGINT) AS cif,
      |  bool_and(n_nationkey < 30) OVER () AS land,
      |  bool_or(n_nationkey > 23) OVER () AS lor
      |FROM nation ORDER BY n_nationkey""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_zetasql_delta" -> q143,
    "q19_string_edit_funcs" -> q19,
    "q20_string_funcs" -> q20,
    "q21_hash_hex_funcs" -> q21,
    "q22_math_funcs" -> q22,
    "q23_datetime_funcs" -> q23,
    "q24_conditional_exprs" -> q24,
    "q25_cast_matrix" -> q25,
    "q26_regex_funcs" -> q26,
    "q27_json_extract" -> q27,
    "q28_array_ops" -> q28,
    "q29_unnest_explode" -> q29)

  override val oracles: Map[String, String] = Map(
    "q143_zetasql_delta" -> q143Sql,
    "q19_string_edit_funcs" -> q19Sql,
    "q20_string_funcs" -> q20Sql,
    "q21_hash_hex_funcs" -> q21Sql,
    "q22_math_funcs" -> q22Sql,
    "q23_datetime_funcs" -> q23Sql,
    "q24_conditional_exprs" -> q24Sql,
    "q25_cast_matrix" -> q25Sql,
    "q26_regex_funcs" -> q26Sql,
    "q27_json_extract" -> q27Sql,
    "q28_array_ops" -> q28Sql,
    "q29_unnest_explode" -> q29Sql)
}
