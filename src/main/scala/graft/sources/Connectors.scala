package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source/sink wrapper (reference sdks/java/io/kafka/KafkaIO.java:
  * 527-591 read builder, :2244 write builder) mapped onto Spark's
  * `format("kafka")` source options.
  *
  * The option-translation layer is pure and unit-tested; the load()/
  * start() calls require the spark-sql-kafka module and a broker, neither
  * of which ships in this environment — the translation is the tested
  * contract, the terminal calls are thin.
  *
  * Reference → Spark mapping:
  *  - withBootstrapServers        → kafka.bootstrap.servers
  *  - withTopics                  → subscribe (comma-joined)
  *  - withTopicPattern            → subscribePattern
  *  - withStartReadTime           → startingTimestamp (ms)
  *  - commitOffsetsInFinalize     → (checkpoint offsets are Spark's
  *                                   exactly-once mechanism instead)
  *  - withReadCommitted           → kafka.isolation.level=read_committed
  *  - withMaxNumRecords (bounded) → batch read with endingOffsets
  *  - withConsumerConfigUpdates   → kafka.* passthrough
  */
object KafkaIO {

  case class ReadConfig(
      bootstrapServers: String,
      topics: Seq[String] = Nil,
      topicPattern: Option[String] = None,
      startingOffsets: String = "earliest",
      endingOffsets: Option[String] = None, // batch reads only
      startReadTimeMs: Option[Long] = None,
      maxOffsetsPerTrigger: Option[Long] = None,
      readCommitted: Boolean = false,
      consumerOverrides: Map[String, String] = Map.empty)

  case class WriteConfig(
      bootstrapServers: String,
      topic: String,
      producerOverrides: Map[String, String] = Map.empty)

  /** Pure translation of a read config into Spark kafka source options. */
  def readOptions(c: ReadConfig): Map[String, String] = {
    require(c.topics.nonEmpty ^ c.topicPattern.nonEmpty,
      "exactly one of topics / topicPattern is required")
    require(c.startReadTimeMs.isEmpty || c.startingOffsets == "earliest",
      "startReadTimeMs replaces startingOffsets; don't set both")
    Map("kafka.bootstrap.servers" -> c.bootstrapServers) ++
      (if (c.topics.nonEmpty) Map("subscribe" -> c.topics.mkString(","))
       else Map("subscribePattern" -> c.topicPattern.get)) ++
      c.startReadTimeMs.map(t => "startingTimestamp" -> t.toString)
        .orElse(Some("startingOffsets" -> c.startingOffsets)).toMap ++
      c.endingOffsets.map("endingOffsets" -> _).toMap ++
      c.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString).toMap ++
      (if (c.readCommitted) Map("kafka.isolation.level" -> "read_committed")
       else Map.empty) ++
      c.consumerOverrides.map { case (k, v) => s"kafka.$k" -> v }
  }

  /** Pure translation of a write config into Spark kafka sink options. */
  def writeOptions(c: WriteConfig): Map[String, String] =
    Map("kafka.bootstrap.servers" -> c.bootstrapServers, "topic" -> c.topic) ++
      c.producerOverrides.map { case (k, v) => s"kafka.$k" -> v }

  /** Project a frame to the kafka sink's record shape (key/value binary —
    * the KafkaRecord<K,V> serialization step of the reference writer).
    * Binary/string columns serialize as-is; other types take their string
    * representation (≙ the reference's default coder choice; register a
    * custom projection upstream for binary formats). */
  def toRecords(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    def ser(name: String) = df.schema(name).dataType.typeName match {
      case "binary" => col(name)
      case "string" => col(name).cast("binary")
      case _ => col(name).cast("string").cast("binary")
    }
    df.select(ser(keyCol).as("key"), ser(valueCol).as("value"))
  }

  /** Unbounded read ≙ KafkaIO.read() (needs spark-sql-kafka + broker). */
  def readStream(spark: SparkSession, c: ReadConfig): DataFrame =
    spark.readStream.format("kafka").options(readOptions(c)).load()

  /** Bounded read ≙ KafkaIO.read().withMaxNumRecords-style bounded use. */
  def readBatch(spark: SparkSession, c: ReadConfig): DataFrame =
    spark.read.format("kafka")
      .options(readOptions(c) + ("endingOffsets" -> c.endingOffsets.getOrElse("latest")))
      .load()

  /** Streaming write ≙ KafkaIO.write() (needs spark-sql-kafka + broker). */
  def writeStream(df: DataFrame, c: WriteConfig, keyCol: String,
      valueCol: String, checkpoint: String): Unit =
    toRecords(df, keyCol, valueCol).writeStream.format("kafka")
      .options(writeOptions(c)).option("checkpointLocation", checkpoint)
      .start()
}

/** JDBC source/sink wrapper (reference sdks/java/io/jdbc/JdbcIO.java:
  * read :373, readWithPartitions :475, write :1461) on Spark's
  * `format("jdbc")`. The reference's readWithPartitions(column, lower,
  * upper, numPartitions) is exactly Spark's partitioned JDBC scan — each
  * partition reads one stride of the range in parallel, which is the 100
  * TB-relevant path (a single-connection read does not scale).
  * Integration-tested against embedded Derby (in the environment's
  * classpath); any JDBC driver on the executor classpath works the same.
  */
object JdbcIO {

  case class Partitioning(column: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int)

  case class ReadConfig(
      url: String,
      table: Option[String] = None, // ≙ withTable
      query: Option[String] = None, // ≙ withQuery
      driver: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      fetchSize: Option[Int] = None, // ≙ withFetchSize
      partitioning: Option[Partitioning] = None) // ≙ readWithPartitions

  case class WriteConfig(
      url: String,
      table: String,
      driver: Option[String] = None,
      user: Option[String] = None,
      password: Option[String] = None,
      batchSize: Option[Int] = None, // ≙ withBatchSize
      mode: String = "append")

  /** Pure translation of a read config into Spark jdbc options. */
  def readOptions(c: ReadConfig): Map[String, String] = {
    require(c.table.nonEmpty ^ c.query.nonEmpty,
      "exactly one of table / query is required")
    Map("url" -> c.url) ++
      c.table.map("dbtable" -> _).toMap ++
      c.query.map("query" -> _).toMap ++
      c.driver.map("driver" -> _).toMap ++
      c.user.map("user" -> _).toMap ++
      c.password.map("password" -> _).toMap ++
      c.fetchSize.map("fetchsize" -> _.toString).toMap ++
      c.partitioning.map { p =>
        require(c.query.isEmpty,
          "partitioned reads need `table` (Spark restriction)")
        Map("partitionColumn" -> p.column,
          "lowerBound" -> p.lowerBound.toString,
          "upperBound" -> p.upperBound.toString,
          "numPartitions" -> p.numPartitions.toString)
      }.getOrElse(Map.empty)
  }

  /** Pure translation of a write config into Spark jdbc options. */
  def writeOptions(c: WriteConfig): Map[String, String] =
    Map("url" -> c.url, "dbtable" -> c.table) ++
      c.driver.map("driver" -> _).toMap ++
      c.user.map("user" -> _).toMap ++
      c.password.map("password" -> _).toMap ++
      c.batchSize.map("batchsize" -> _.toString).toMap

  def read(spark: SparkSession, c: ReadConfig): DataFrame =
    spark.read.format("jdbc").options(readOptions(c)).load()

  def write(df: DataFrame, c: WriteConfig): Unit =
    df.write.format("jdbc").options(writeOptions(c)).mode(c.mode).save()
}
