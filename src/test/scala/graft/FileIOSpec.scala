package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.FileIO

/** Format roundtrips + sharded/dynamic writes (reference io/TextIO,
  * io/FileIO.writeDynamic, io/WriteFiles.withNumShards). */
class FileIOSpec extends GraftSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-io-$name").resolve("out").toString

  private lazy val df = Seq(
    (1L, "alpha", "en"), (2L, "beta", "de"), (3L, "gamma", "en"), (4L, "delta", "fr"))
    .toDF("id", "word", "lang")

  test("parquet/orc/json/csv roundtrip preserves rows") {
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = tmp(fmt)
      val w = df.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(path)
      val back = fmt match {
        case "csv" => FileIO.readCsv(spark, path)
        case "json" => FileIO.readJson(spark, path)
        case "orc" => FileIO.readOrc(spark, path)
        case _ => FileIO.readParquet(spark, path)
      }
      assert(back.count() == 4, s"$fmt roundtrip lost rows")
      assert(back.select("word").as[String].collect().toSet ==
        Set("alpha", "beta", "gamma", "delta"), s"$fmt roundtrip corrupted data")
    }
  }

  test("text write/read with gzip compression (CompressedSource analog)") {
    val path = tmp("textgz")
    df.select(col("word")).write.mode("overwrite")
      .option("compression", "gzip").text(path)
    val back = FileIO.readText(spark, path) // decompressed by extension
    assert(back.as[String].collect().toSet == Set("alpha", "beta", "gamma", "delta"))
  }

  test("writeSharded controls output file count (withNumShards)") {
    val path = tmp("sharded")
    FileIO.writeSharded(spark.range(1000).toDF("id"), path, "parquet", shards = 3)
    val files = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 3)
    assert(FileIO.readParquet(spark, path).count() == 1000)
  }

  test("writeDynamic routes rows to per-value directories (dynamic destinations)") {
    val path = tmp("dynamic")
    FileIO.writeDynamic(df, path, "parquet", Seq("lang"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("lang=en", "lang=de", "lang=fr"))
    // partition pruning: reading one destination reads only its rows
    val en = FileIO.readParquet(spark, path).filter(col("lang") === "en")
    assert(en.count() == 2)
  }
}
