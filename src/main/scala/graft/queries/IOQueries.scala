package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{FileIO, Tables}

/** IO-path gate queries: each roundtrips real table data through a graft
  * source/sink and aggregates the read-back rows, so the driver's oracle
  * (which reads the original parquet) checks end-to-end fidelity of the
  * write+read path, not just rows>0.
  */
object IOQueries extends QueryModule {

  // Avro container roundtrip (io/AvroIO.java): orders → sharded .avro →
  // splittable DSv2 read-back → aggregate. Timestamp + long + double
  // fidelity is what the oracle hash checks.
  private def q76(s: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft-avro-gate").resolve("orders").toString
    FileIO.writeAvro(
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .repartition(4),
      path)
    // money math in DECIMAL (the q03 rule): a parallel double sum over 4
    // shards is order-dependent at half-cent boundaries vs the oracle's
    // sequential sum; decimal sums are exact on both engines
    FileIO.readAvro(s, path)
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"),
        max("o_orderkey").as("max_key"))
      .orderBy("y")
  }

  private val q76Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  max(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY y""".stripMargin

  // Seekable lookup join (BeamSideInputLookupJoinRel.java:61): customer
  // becomes the seekable side as a bucketed table; a bounded orders probe
  // seeks it via bucket pruning (only probed buckets scan — PlanSpec
  // asserts SelectedBucketsCount). Oracle: the equivalent plain join.
  private def q77(s: SparkSession, dir: String): DataFrame = {
    // a fresh session may inherit a stale managed-table location from a
    // previous run: drop the catalog entry AND the leftover directory
    s.sql("DROP TABLE IF EXISTS graft_lookup_customer")
    val warehouse = new java.io.File(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath,
      "graft_lookup_customer")
    if (warehouse.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(warehouse)
    }
    graft.api.Scale.writeBucketed(
      Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey"),
      "graft_lookup_customer", "c_custkey", 16)
    val probe = Tables.orders(s, dir)
      .filter(col("o_orderkey") <= 200)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    graft.api.Lookup.lookupJoin(s, probe, "graft_lookup_customer",
      "o_custkey", "c_custkey")
      .select(col("o_orderkey"), col("c_name"), col("c_nationkey"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  private val q77Sql =
    """SELECT o_orderkey, c_name, c_nationkey, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin

  // TFRecord roundtrip (io/TFRecordIO.java): document text → UTF-8
  // record bytes → sharded .tfrecord → CRC-checked read-back → content
  // aggregate. The oracle reads the original parquet; md5 equality pins
  // byte-exact record fidelity without depending on row order.
  private def q78(s: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft-tfrecord-gate").resolve("docs").toString
    FileIO.writeTFRecord(
      Tables.documents(s, dir).select(col("text").cast("binary").as("value"))
        .repartition(4),
      path)
    FileIO.readTFRecord(s, path)
      .select(md5(col("value")).as("m"), octet_length(col("value")).as("len"))
      .agg(count(lit(1)).as("n_docs"),
        sum("len").as("total_bytes"),
        countDistinct(col("m")).as("n_distinct"),
        min("m").as("min_md5"), max("m").as("max_md5"))
  }

  private val q78Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
      |  min(md5(text)) AS min_md5, max(md5(text)) AS max_md5
      |FROM documents""".stripMargin

  // XML roundtrip (sdks/java/io/xml/XmlIO.java) through Spark 4's
  // built-in XML source: nation → XML documents → read-back → aggregate.
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft-xml-gate").resolve("nation").toString
    FileIO.writeXml(Tables.nation(s, dir), path, rowTag = "nation")
    FileIO.readXml(s, path, rowTag = "nation")
      .agg(count(lit(1)).as("n"),
        sum(col("n_nationkey")).cast("long").as("key_sum"),
        min("n_name").as("first_name"), max("n_name").as("last_name"))
  }

  private val q79Sql =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
      |  min(n_name) AS first_name, max(n_name) AS last_name
      |FROM nation""".stripMargin

  // Thrift roundtrip (sdks/java/io/thrift/ThriftIO.java): orders →
  // sharded compact-protocol .thrift files → schema-declared DSv2
  // read-back → aggregate. i64 + date-as-i32 + double + varint string
  // fidelity is what the oracle hash checks.
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val path = Files.createTempDirectory("graft-thrift-gate").resolve("orders").toString
    val src = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        col("o_orderpriority"))
      .repartition(4)
    FileIO.writeThrift(src, path)
    FileIO.readThrift(s, path, src.schema)
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"),
        max("o_orderkey").as("max_key"),
        countDistinct("o_orderpriority").cast("long").as("n_prio"))
      .orderBy("y")
  }

  private val q82Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  max(o_orderkey) AS max_key,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
      |FROM orders GROUP BY 1 ORDER BY y""".stripMargin

  // Synthetic DSv2 batch source (the reference's GenerateSequence /
  // SyntheticBoundedSource, io/GenerateSequence.java): the graft-seqgen
  // source generates (value, ts) rows across 8 planned input partitions;
  // the gate folds them through an event-time calendar-minute aggregation
  // so the oracle (an independent DuckDB generate_series replay of the
  // generator law: ts = 2024-01-01T00:00Z + 10ms·value) checks the
  // emitted VALUES — partition planning, the InternalRow encoding, and
  // the micros timestamp arithmetic — not just row counts. Moves the
  // DSv2 batch-source contract from spec-only to oracle-gated.
  private def q154(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-seqgen")
      .option("from", 0L).option("count", 100000L).option("partitions", 8)
      .load()
      .groupBy(date_trunc("minute", col("ts")).as("minute_start"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_v"),
        min("value").as("min_v"), max("value").as("max_v"))
      .orderBy("minute_start")

  private val q154Sql =
    """SELECT CAST(date_trunc('minute',
      |    TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(10000 * i)) AS TIMESTAMP)
      |    AS minute_start,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(i) AS BIGINT) AS sum_v,
      |  CAST(min(i) AS BIGINT) AS min_v, CAST(max(i) AS BIGINT) AS max_v
      |FROM generate_series(0, 99999) AS t(i)
      |GROUP BY 1 ORDER BY minute_start""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_avro_roundtrip" -> q76,
    "q77_seekable_lookup_join" -> q77,
    "q78_tfrecord_roundtrip" -> q78,
    "q79_xml_roundtrip" -> q79,
    "q82_thrift_roundtrip" -> q82,
    "q154_seqgen_source" -> q154)

  override val oracles: Map[String, String] = Map(
    "q76_avro_roundtrip" -> q76Sql,
    "q77_seekable_lookup_join" -> q77Sql,
    "q78_tfrecord_roundtrip" -> q78Sql,
    "q79_xml_roundtrip" -> q79Sql,
    "q82_thrift_roundtrip" -> q82Sql,
    "q154_seqgen_source" -> q154Sql)
}
