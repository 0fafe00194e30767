package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.LocalCheckpointFileManager

/** The local checkpoint file manager must honor the exact contract the
  * streaming commit protocol relies on: atomic rename-into-place,
  * no-overwrite detection with the exception type HDFSMetadataLog catches,
  * cancel leaving no trace, and — the end-to-end proof — a query resuming
  * from a checkpoint written entirely through this manager. */
class LocalCheckpointFileManagerSpec extends GraftSpec {
  import spark.implicits._

  private def newFm(dir: String) =
    new LocalCheckpointFileManager(new Path(dir), new Configuration())

  test("atomic write, open, list, exists, delete roundtrip") {
    val dir = Files.createTempDirectory("lcfm").toString
    val fm = newFm(dir)
    val p = new Path(dir, "sub/7.delta")
    val os = fm.createAtomic(p, overwriteIfPossible = true)
    os.write("payload".getBytes("UTF-8"))
    os.close()
    assert(fm.exists(p))
    val in = fm.open(p)
    val buf = new Array[Byte](7)
    in.readFully(0L, buf)
    in.close()
    assert(new String(buf, "UTF-8") == "payload")
    val listed = fm.list(new Path(dir, "sub"))
    assert(listed.map(_.getPath.getName).toSeq == Seq("7.delta"))
    assert(listed.head.getLen == 7)
    fm.delete(p)
    assert(!fm.exists(p))
    intercept[java.io.FileNotFoundException](fm.list(new Path(dir, "missing")))
  }

  test("no-overwrite create throws the exception type the metadata log catches") {
    val dir = Files.createTempDirectory("lcfm").toString
    val fm = newFm(dir)
    val p = new Path(dir, "0")
    val first = fm.createAtomic(p, overwriteIfPossible = false)
    first.write(1); first.close()
    val second = fm.createAtomic(p, overwriteIfPossible = false)
    second.write(2)
    intercept[FileAlreadyExistsException](second.close())
    // loser's temp is cleaned up; winner's content intact
    assert(Files.list(Paths.get(dir)).count() == 1)
    val in = fm.open(p)
    assert(in.read() == 1)
    in.close()
  }

  test("cancel discards the temp file and writes nothing") {
    val dir = Files.createTempDirectory("lcfm").toString
    val fm = newFm(dir)
    val os = fm.createAtomic(new Path(dir, "x"), overwriteIfPossible = true)
    os.write(42)
    os.cancel()
    assert(Files.list(Paths.get(dir)).count() == 0)
  }

  test("rejects non-local paths instead of silently degrading durability") {
    val fm = newFm(Files.createTempDirectory("lcfm").toString)
    intercept[IllegalArgumentException](
      fm.exists(new Path("hdfs://namenode/checkpoints/q")))
  }

  test("streaming query checkpoints through the manager and resumes from them") {
    implicit val ctx = spark.sqlContext
    val ckpt = Files.createTempDirectory("lcfm-ckpt").toString
    val prevFm = spark.conf.getOption("spark.sql.streaming.checkpointFileManagerClass")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      classOf[LocalCheckpointFileManager].getName)
    try {
      val input = MemoryStream[(String, Int)]
      def start() = input.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("total"))
        .writeStream.format("memory").queryName("lcfm_counts")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.ProcessingTime(100)).start()

      val q1 = start()
      input.addData(("a", 1), ("b", 10))
      q1.processAllAvailable()
      assert(spark.table("lcfm_counts").as[(String, Long)].collect().toMap ==
        Map("a" -> 1L, "b" -> 10L))
      q1.stop()

      // resume from the same checkpoint: offsets + state must both be
      // recovered from files written by LocalCheckpointFileManager
      val q2 = start()
      input.addData(("a", 2))
      q2.processAllAvailable()
      assert(spark.table("lcfm_counts").as[(String, Long)].collect().toMap ==
        Map("a" -> 3L, "b" -> 10L))
      q2.stop()

      // the checkpoint on disk is real: offset log advanced past batch 0
      assert(newFm(ckpt).list(new Path(ckpt, "offsets"))
        .map(_.getPath.getName).toSet.contains("1"))
    } finally {
      prevFm.fold(spark.conf.unset("spark.sql.streaming.checkpointFileManagerClass"))(
        spark.conf.set("spark.sql.streaming.checkpointFileManagerClass", _))
    }
  }
}
