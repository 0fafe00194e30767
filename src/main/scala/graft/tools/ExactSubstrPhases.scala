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
    val maxPerGram = 1000
    def anchors = docs.select(col("doc_id").as("id"),
        explode(graft.functions.winnowedAnchors(col("text"), 50, 10)).as("a"))
      .select(col("id"), col("a.i").as("i"), col("a.h").as("h"))
      .filter(pmod(col("h"), lit(2L)) === pass)
    t(s"anchors_scan_only_pass$pass") {
      anchors.write.format("noop").mode("overwrite").save()
    }
    // in-session A/B: the bounded-collect aggregate shape vs the
    // sorted-run walk, alternated in ONE JVM so box drift cancels
    def aggShape() = anchors
      .groupBy("h").agg(graft.functions.boundedCollectPairs(
        col("id"), col("i"), maxPerGram + 1).as("xs"))
      .filter(size(col("xs")).between(2, maxPerGram))
      .select(col("h"), explode(flatten(transform(col("xs"), x =>
        transform(
          filter(col("xs"), y => y.getField("id") > x.getField("id") ||
            (y.getField("id") === x.getField("id") &&
             y.getField("i") > x.getField("i"))),
          y => struct(
            x.getField("id").as("id_a"), x.getField("i").as("pos_a"),
            y.getField("id").as("id_b"), y.getField("i").as("pos_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.pos_a").as("pos_a"),
        col("p.id_b").as("id_b"), col("p.pos_b").as("pos_b"), col("h"))
    def walkShape() =
      graft.dedup.ExactSubstr.walkSortedAnchors(anchors, maxPerGram)
    for (round <- 1 to 2) {
      t(s"agg_shape_pass${pass}_r$round") {
        aggShape().write.format("noop").mode("overwrite").save()
      }
      t(s"walk_shape_pass${pass}_r$round") {
        walkShape().write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
