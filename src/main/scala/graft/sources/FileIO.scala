package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** File IO (reference io/TextIO.java:185, io/FileIO.java, io/AvroIO.java,
  * sdks/java/io/parquet ParquetIO.java, io/WriteFiles.java:122,
  * io/CompressedSource.java) on Spark's native sources.
  *
  * The reference's file machinery — match/matchAll globs, compressed
  * sources, temp-file-then-rename commit, sharded writes, dynamic
  * destinations — all exists natively in Spark's FileFormat layer:
  * glob paths on read, codec inference from extension, the
  * FileOutputCommitter rename protocol, `repartition(n)` for shard
  * control, `partitionBy` for dynamic destinations. These helpers pin
  * that 1:1 mapping as API and document the scale contract.
  */
object FileIO {

  // ---- readers (glob paths supported, ≙ FileIO.match/readMatches) ----

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path) // gz/bz2/zstd decompressed by extension (≙ CompressedSource)

  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    spark.read.option("header", header).option("inferSchema", inferSchema).csv(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path) // JsonToRow with schema inference

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** AvroIO.read (io/AvroIO.java:186): splittable container-file reads via
    * the graft-avro DSv2 source; pass `readerSchemaJson` for schema
    * evolution (Avro resolution rules against each file's writer schema). */
  def readAvro(spark: SparkSession, path: String,
      readerSchemaJson: Option[String] = None): DataFrame =
    graft.sources.avro.AvroIO.read(spark, path, readerSchemaJson)

  /** TFRecordIO.read (io/TFRecordIO.java): one binary `value` column,
    * one file per task (the format has no sync markers — shard on write
    * for read parallelism). */
  def readTFRecord(spark: SparkSession, path: String,
      checkCrc: Boolean = true): DataFrame =
    graft.sources.tfrecord.TFRecordIO.read(spark, path, checkCrc)

  /** XmlIO (sdks/java/io/xml/XmlIO.java): Spark 4's built-in XML source;
    * `rowTag` names the repeated record element. */
  def readXml(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** ThriftIO.read (sdks/java/io/thrift/ThriftIO.java): concatenated
    * thrift structs decoded against a caller-declared schema (thrift
    * files carry none — the reference takes the generated class);
    * 'compact' or 'binary' protocol, one file per task. */
  def readThrift(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      protocol: String = "compact"): DataFrame =
    graft.sources.thrift.ThriftIO.read(spark, path, schema, protocol)

  /** Streaming file watch (≙ TextIO.watchForNewFiles / Watch.growthOf):
    * Spark's file stream source natively polls for new files. */
  def watchText(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  // ---- writers ----

  /** WriteFiles with explicit sharding (io/WriteFiles.java:229
    * withNumShards): one output file per shard, temp-file-then-rename
    * commit via the file output committer. */
  def writeSharded(df: DataFrame, path: String, format: String, shards: Int): Unit =
    df.repartition(shards).write.format(format).mode("overwrite").save(path)

  /** FileIO.writeDynamic (dynamic destinations by partition column):
    * `partitionBy` routes rows to per-value directories; at scale add the
    * partition columns to a `repartition` first so each task writes few
    * files (small-files control). */
  def writeDynamic(df: DataFrame, path: String, format: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 0L): Unit = {
    val w: DataFrameWriter[Row] = df.write.format(format)
      .partitionBy(partitionCols: _*).mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).save(path)
  }

  /** AvroIO.write (io/AvroIO.java:1135): sharded container files, one per
    * partition, temp-then-rename committed. `repartition(n)` upstream for
    * explicit shard control (withNumShards). */
  def writeAvro(df: DataFrame, path: String, codec: String = "snappy"): Unit =
    graft.sources.avro.AvroIO.write(df, path, codec)

  /** TFRecordIO.write: sharded record files from a binary column. */
  def writeTFRecord(df: DataFrame, path: String, recordCol: String = "value"): Unit =
    graft.sources.tfrecord.TFRecordIO.write(df, path, recordCol)

  /** ThriftIO.write: sharded files of concatenated thrift structs. */
  def writeThrift(df: DataFrame, path: String, protocol: String = "compact"): Unit =
    graft.sources.thrift.ThriftIO.write(df, path, protocol)

  /** XmlIO.write: one XML document per shard with `rowTag` records. */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.format("xml").option("rowTag", rowTag).mode("overwrite").save(path)
}
