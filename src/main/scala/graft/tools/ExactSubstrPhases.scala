package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: phase breakdown of the exact-substring winnowed pole at
  * pipeline scale — the native anchor walk/scan vs the fingerprint
  * exchange + bounded-collect aggregate + pair expansion (not part of the
  * shipped surface). Phase (a) times the anchor pipeline alone (noop sink,
  * no exchange); phase (b) times the full pass; (b) − (a) attributes the
  * exchange+aggregate+expansion. */
object ExactSubstrPhases {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_SCALE", "100").toInt
    val pass = sys.env.getOrElse("SPARK_GRAFT_SUBSTR_PASS", "0").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.PipelineCorpus.ensure(spark, scale)
    val docs = spark.table("pipeline_documents")
    // untimed warm read, as the bench does between heavy poles
    try docs.write.format("noop").mode("overwrite").save() catch { case _: Throwable => }
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[substrPhases] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    t(s"anchors_scan_only_pass$pass") {
      docs.select(col("doc_id").as("id"),
          explode(graft.functions.winnowedAnchors(col("text"), 50, 10)).as("a"))
        .select(col("id"), col("a.i").as("i"), col("a.h").as("h"))
        .filter(pmod(col("h"), lit(2L)) === pass)
        .write.format("noop").mode("overwrite").save()
    }
    t(s"full_pass$pass") {
      graft.dedup.ExactSubstr.winnowedCandidates(docs, "doc_id", "text",
        hashSplit = 2, hashPart = pass)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
    sys.exit(0)
  }
}
