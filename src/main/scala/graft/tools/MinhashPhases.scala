package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: phase breakdown of the minhash near-dup stage on the pipeline
  * corpus — signature+banding scan vs bucket-pair aggregation vs the
  * verified-pair tail (not part of the shipped surface). */
object MinhashPhases {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_SCALE", "100").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "100g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.PipelineCorpus.ensure(spark, scale)
    val docs = spark.table("pipeline_documents")
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[minhashPhases] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  rows=$n")
    }
    t("bands_scan") {
      graft.dedup.Dedup.minhashBands(docs, "doc_id", "text", 5, 200, 50).count()
    }
    t("candidate_pairs") {
      graft.dedup.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        5, 200, 50, 1000, 2).count()
    }
    t("verified_neardups") {
      graft.dedup.Dedup.minhashNearDups(docs, "doc_id", "text", 0.7).count()
    }
    spark.stop()
    sys.exit(0)
  }
}
