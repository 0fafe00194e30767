package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FileIO
import graft.sources.avro.AvroIO

/** Avro container-file IO: roundtrip fidelity across the type matrix,
  * sharding, split planning within a file, and reader-schema evolution
  * (reference io/AvroIO.java read/write + Avro schema-resolution rules). */
class AvroIOSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-avro").resolve("out").toString

  test("roundtrip: primitives, timestamp, date, array, map, nested struct") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("flag", BooleanType, nullable = false),
      StructField("small", IntegerType, nullable = false),
      StructField("blob", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = false),
      StructField("day", DateType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
      StructField("attrs", MapType(StringType, LongType, valueContainsNull = false), nullable = false),
      StructField("inner", StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", StringType, nullable = true))), nullable = true)))
    val rows = (0L until 100L).map { i =>
      Row(i, if (i % 7 == 0) null else s"name_$i", i * 1.5, i % 2 == 0, i.toInt,
        if (i % 5 == 0) null else Array[Byte](i.toByte, (i + 1).toByte),
        java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${i % 60}"),
        java.sql.Date.valueOf(s"2024-01-${i % 28 + 1}"),
        Seq(s"t$i", "x"), Map("k" -> i, "k2" -> (i * 2)),
        if (i % 3 == 0) null else Row(i * 10, s"b$i"))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val path = tmp()
    FileIO.writeAvro(df, path)
    val back = FileIO.readAvro(spark, path)
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    // byte[] stringifies by identity (hex it); map iteration order is
    // unspecified (sort the entries)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("blob", hex(col("blob")))
        .withColumn("attrs", array_sort(map_entries(col("attrs"))))
        .orderBy("id").collect().map(_.toString).toSeq
    assert(canon(df) == canon(back))
  }

  test("write shards one file per partition and commits with _SUCCESS") {
    val path = tmp()
    FileIO.writeAvro(spark.range(1000).repartition(4).toDF(), path)
    val dir = new java.io.File(path)
    val parts = dir.listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.length == 4, parts.map(_.getName).mkString(","))
    assert(dir.listFiles().exists(_.getName == "_SUCCESS"))
    assert(!dir.listFiles().exists(_.getName.endsWith(".inprogress")))
    assert(FileIO.readAvro(spark, path).count() == 1000)
  }

  test("a single container file splits into multiple byte-range partitions") {
    val path = tmp()
    // one shard, deflate for deterministic multi-block layout
    AvroIO.write(spark.range(200000).select(col("id"),
      concat(lit("padpadpadpad_"), col("id")).as(("s"))).repartition(1), path,
      codec = "deflate")
    val df = AvroIO.read(spark, path, splitSizeBytes = 64 * 1024)
    val nParts = df.rdd.getNumPartitions
    assert(nParts > 1, s"expected multiple splits, got $nParts")
    // no loss, no duplication across split boundaries
    assert(df.count() == 200000)
    assert(df.agg(countDistinct("id")).as[Long].head() == 200000)
  }

  test("schema evolution: reader schema adds a defaulted field, drops one") {
    val path = tmp()
    FileIO.writeAvro(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score"), path)
    // v2 reader: drops `score`, adds `rank` with a default
    val readerSchema =
      """{"type":"record","name":"graft_record","namespace":"graft.avro","fields":[
        |{"name":"id","type":"long"},
        |{"name":"name","type":["null","string"],"default":null},
        |{"name":"rank","type":"int","default":-1}]}""".stripMargin
    val back = FileIO.readAvro(spark, path, Some(readerSchema)).orderBy("id")
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "rank"))
    assert(back.as[(Long, String, Int)].collect().toSeq ==
      Seq((1L, "a", -1), (2L, "b", -1)))
  }

  test("spark<->avro schema mapping is stable both directions") {
    val st = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", StringType, nullable = true),
      StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val round = AvroIO.sparkSchemaFor(AvroIO.avroSchemaFor(st))
    assert(round == st)
  }
}
