package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.FileIO
import graft.sources.tfrecord.TFRecordIO

/** TFRecord framing (masked-CRC32C length-prefixed records) and the
  * built-in XML source wrappers. */
class TFRecordXmlSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-tfx").resolve("out").toString

  test("tfrecord roundtrip preserves records, order within file, and shard count") {
    val path = tmp()
    val df = spark.range(5000)
      .select(concat(lit("rec-"), col("id")).cast("binary").as("value"))
      .repartition(3)
    FileIO.writeTFRecord(df, path)
    val dir = new java.io.File(path)
    assert(dir.listFiles().count(_.getName.endsWith(".tfrecord")) == 3)
    assert(dir.listFiles().exists(_.getName == "_SUCCESS"))
    val back = FileIO.readTFRecord(spark, path)
      .select(col("value").cast("string")).as[String].collect().toSet
    assert(back == (0L until 5000L).map(i => s"rec-$i").toSet)
  }

  test("tfrecord crc check rejects corrupted data") {
    val path = tmp()
    FileIO.writeTFRecord(
      Seq("hello", "world").toDF("s").select(col("s").cast("binary").as("value"))
        .repartition(1), path)
    val f = new java.io.File(path).listFiles()
      .find(_.getName.endsWith(".tfrecord")).get
    // flip one payload byte (offset 12 = first data byte of record 1)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(12) = (bytes(12) ^ 0x7f).toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val e = intercept[org.apache.spark.SparkException] {
      FileIO.readTFRecord(spark, path).count()
    }
    assert(e.getMessage.contains("crc") ||
      Option(e.getCause).exists(_.getMessage.contains("crc")))
    // integrity checking off: the corrupted bytes read through
    assert(FileIO.readTFRecord(spark, path, checkCrc = false).count() == 2)
  }

  test("tfrecord masked crc32c builds on the canonical CRC-32C check value") {
    // the CRC-32C (Castagnoli) check value: crc32c("123456789") = 0xE3069283
    val digits = "123456789".getBytes("UTF-8")
    val c = new java.util.zip.CRC32C
    c.update(digits, 0, digits.length)
    assert(c.getValue == 0xE3069283L, "JDK CRC32C disagrees with the check value")
    val expect = ((((c.getValue >>> 15) | (c.getValue << 17)) + 0xa282ead8L) & 0xFFFFFFFFL).toInt
    assert(TFRecordIO.maskedCrc(digits, digits.length) == expect)
  }

  test("xml roundtrip through the built-in source") {
    val path = tmp()
    val df = Seq((1L, "alpha", 3.5), (2L, "beta", 4.25), (3L, "gamma", 0.5))
      .toDF("id", "name", "score")
    FileIO.writeXml(df, path, rowTag = "row")
    val back = FileIO.readXml(spark, path, rowTag = "row")
      .select("id", "name", "score").orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 3.5), (2L, "beta", 4.25), (3L, "gamma", 0.5)))
  }
}
