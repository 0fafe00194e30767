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
    FileIO.readAvro(s, path)
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"),
        max("o_orderkey").as("max_key"))
      .orderBy("y")
  }

  private val q76Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total,
      |  max(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY y""".stripMargin

  override val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_avro_roundtrip" -> q76)

  override val oracles: Map[String, String] = Map(
    "q76_avro_roundtrip" -> q76Sql)
}
