package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Plays the role of the reference's SQL table-provider layer
  * (reference: sdks/java/extensions/sql/.../meta/provider/parquet,
  * meta/BeamSqlTable.java:33-48 — buildIOReader with filter/project
  * pushdown): here schema discovery, predicate/column pushdown and
  * partition pruning are delegated to Spark's native parquet source,
  * which implements the same capability surface
  * (SupportsPushDownFilters / SupportsPushDownRequiredColumns).
  *
  * At 100 TB these readers are the scan layer: filters and projections
  * declared on the returned DataFrame reach the parquet footer
  * (PushedFilters / ReadSchema in `.explain("formatted")`), so a query
  * over 2 columns of a 16-column table reads only those column chunks.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver has shipped events.parquet with two physical `ts`
    * layouts across rounds, so adapt on the actual schema:
    *  - INT64 TIMESTAMP(NANOS), which Spark's parquet reader rejects
    *    (PARQUET_TYPE_ILLEGAL): read nanos as raw longs (legacy conf) and
    *    convert to microsecond TimestampType explicitly — the same
    *    truncation DuckDB applies (its TIMESTAMP is micros);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    *    TIMESTAMP_NTZ: cast to TimestampType (sessions run UTC, so the
    *    values are identical) to keep one downstream type.
    * Either way every query sees microsecond TimestampType and matches
    * the oracle byte-for-byte. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))) // integer div: ns values exceed double's 2^53 mantissa
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works against the
    * same data (the reference's CREATE EXTERNAL TABLE registration path,
    * parserImpls.ftl:142-236, collapses to this + Ddl.createExternalTable). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
