package graft

import org.apache.spark.sql.functions._
import graft.sources.{JdbcIO, KafkaIO}

/** Connector wrappers: the Kafka option-translation contract (no broker
  * or spark-sql-kafka module in this environment — translation is the
  * tested surface), and a real JDBC roundtrip against embedded Derby
  * including the reference's readWithPartitions parallel-scan path. */
class ConnectorsSpec extends GraftSpec {
  import spark.implicits._

  // ---- Kafka option translation (KafkaIO.java:527-591) ----

  test("kafka read options: topics, offsets, read_committed, consumer overrides") {
    val opts = KafkaIO.readOptions(KafkaIO.ReadConfig(
      bootstrapServers = "b1:9092,b2:9092",
      topics = Seq("events", "clicks"),
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L),
      readCommitted = true,
      consumerOverrides = Map("max.poll.records" -> "1000")))
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "events,clicks")
    assert(opts("startingOffsets") == "latest")
    assert(opts("maxOffsetsPerTrigger") == "50000")
    assert(opts("kafka.isolation.level") == "read_committed")
    assert(opts("kafka.max.poll.records") == "1000")
    assert(!opts.contains("subscribePattern"))
  }

  test("kafka read options: pattern + startReadTime; invalid combos rejected") {
    val opts = KafkaIO.readOptions(KafkaIO.ReadConfig(
      bootstrapServers = "b:9092", topicPattern = Some("logs-.*"),
      startReadTimeMs = Some(1704067200000L)))
    assert(opts("subscribePattern") == "logs-.*")
    assert(opts("startingTimestamp") == "1704067200000")
    assert(!opts.contains("startingOffsets"))
    intercept[IllegalArgumentException] {
      KafkaIO.readOptions(KafkaIO.ReadConfig(bootstrapServers = "b:9092"))
    }
    intercept[IllegalArgumentException] {
      KafkaIO.readOptions(KafkaIO.ReadConfig(bootstrapServers = "b:9092",
        topics = Seq("a"), topicPattern = Some("b.*")))
    }
  }

  test("kafka write options and record projection") {
    val opts = KafkaIO.writeOptions(KafkaIO.WriteConfig(
      bootstrapServers = "b:9092", topic = "out",
      producerOverrides = Map("acks" -> "all")))
    assert(opts("topic") == "out" && opts("kafka.acks") == "all")
    val recs = KafkaIO.toRecords(
      Seq((1L, "payload")).toDF("id", "body"), "id", "body")
    assert(recs.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "binary"), ("value", "binary")))
  }

  // ---- JDBC against embedded Derby (JdbcIO.java read/write) ----

  private val derbyUrl = "jdbc:derby:memory:graftdb;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("jdbc write + partitioned read roundtrip on embedded Derby") {
    val df = spark.range(1000).select(col("id"),
      (col("id") % 7).as("grp"), concat(lit("row-"), col("id")).as("label"))
    JdbcIO.write(df, JdbcIO.WriteConfig(url = derbyUrl, table = "t_roundtrip",
      batchSize = Some(500)))
    val back = JdbcIO.read(spark, JdbcIO.ReadConfig(url = derbyUrl,
      table = Some("t_roundtrip"),
      partitioning = Some(JdbcIO.Partitioning("id", 0L, 1000L, 4))))
    // the reference's readWithPartitions: N parallel range scans
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    val total = back.agg(sum("id")).head().getLong(0)
    assert(total == (0L until 1000L).sum)
  }

  test("jdbc query read (withQuery) on embedded Derby") {
    // Spark's JDBC writer quotes COLUMN identifiers (case-sensitive
    // lowercase) but passes the table name through unquoted (Derby
    // upper-cases it) — a raw query must follow both conventions
    val back = JdbcIO.read(spark, JdbcIO.ReadConfig(url = derbyUrl,
      query = Some(
        """SELECT "grp", count(*) AS "n" FROM t_roundtrip GROUP BY "grp"""")))
    assert(back.count() == 7)
    assert(back.agg(sum("n")).head().getLong(0) == 1000L)
  }

  test("jdbc option translation is exact") {
    val opts = JdbcIO.readOptions(JdbcIO.ReadConfig(url = "jdbc:x", table = Some("t"),
      user = Some("u"), password = Some("p"), fetchSize = Some(5000),
      partitioning = Some(JdbcIO.Partitioning("k", 10, 20, 8))))
    assert(opts == Map("url" -> "jdbc:x", "dbtable" -> "t", "user" -> "u",
      "password" -> "p", "fetchsize" -> "5000", "partitionColumn" -> "k",
      "lowerBound" -> "10", "upperBound" -> "20", "numPartitions" -> "8"))
    intercept[IllegalArgumentException] {
      JdbcIO.readOptions(JdbcIO.ReadConfig(url = "jdbc:x",
        query = Some("SELECT 1"), partitioning = Some(JdbcIO.Partitioning("k", 0, 1, 2))))
    }
  }
}
