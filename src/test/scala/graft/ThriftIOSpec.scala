package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.thrift.ThriftIO

/** Thrift file IO (reference sdks/java/io/thrift/ThriftIO.java):
  * self-contained TCompact/TBinary codecs, schema-declared read-back. */
class ThriftIOSpec extends GraftSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("n", IntegerType),
    StructField("flag", BooleanType),
    StructField("score", DoubleType),
    StructField("name", StringType),
    StructField("blob", BinaryType),
    StructField("d", DateType),
    StructField("ts", TimestampType)))

  private def sample = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, 10, true, 1.5, "alpha", Array[Byte](1, 2), Date.valueOf("2024-01-02"),
        Timestamp.valueOf("2024-01-02 03:04:05.123456")),
      Row(2L, null, false, -2.25, "βeta", Array[Byte](), Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.0")),
      Row(3L, -7, null, null, null, null, null, null)),
    schema)

  for (protocol <- Seq("compact", "binary"))
    test(s"$protocol protocol roundtrips all supported types incl. nulls") {
      val path = Files.createTempDirectory(s"thrift-$protocol").resolve("t").toString
      ThriftIO.write(sample.repartition(2), path, protocol)
      val back = ThriftIO.read(spark, path, schema, protocol)
        .orderBy("id").collect()
      val want = sample.orderBy("id").collect()
      assert(back.length == want.length)
      back.zip(want).foreach { case (a, b) =>
        (0 until schema.length).foreach { i =>
          val (x, y) = (a.get(i), b.get(i))
          (x, y) match {
            case (xb: Array[Byte], yb: Array[Byte]) => assert(xb.sameElements(yb))
            case _ => assert(x == y, s"col ${schema(i).name}: $x != $y")
          }
        }
      }
    }

  test("unknown appended fields are skipped on read (schema evolution)") {
    val path = Files.createTempDirectory("thrift-evo").resolve("t").toString
    ThriftIO.write(sample, path, "compact")
    // reader declares only a prefix of the writer schema: trailing fields
    // on the wire are unknown ids and must be skipped cleanly
    val prefix = StructType(schema.fields.take(2))
    val back = ThriftIO.read(spark, path, prefix, "compact").orderBy("id")
      .as[(Long, Option[Int])].collect().toSeq
    assert(back == Seq((1L, Some(10)), (2L, None), (3L, Some(-7))))
  }

  test("reader without a schema fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-thrift").option("path", "/tmp/nowhere").load()
    }
    assert(e.getMessage.contains("schema is required"))
  }

  test("one input partition per file (no mid-file splits)") {
    val path = Files.createTempDirectory("thrift-parts").resolve("t").toString
    ThriftIO.write(sample.repartition(3), path, "compact")
    val parts = ThriftIO.read(spark, path, schema, "compact").rdd.getNumPartitions
    assert(parts == 3)
  }
}
