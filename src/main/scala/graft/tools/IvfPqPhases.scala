package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: phase breakdown of the ann_ivfpq_indexed bench stage at
  * pipeline scale — codebook fits vs encode+bucketed-write vs append vs
  * ADC+shortlist vs exact rerank (not part of the shipped surface).
  * Mirrors Bench's stage body operation-for-operation so the sum of the
  * phases ≈ the stage time. */
object IvfPqPhases {
  def main(args: Array[String]): Unit = {
    val scale = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_SCALE", "100").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.PipelineCorpus.ensure(spark, scale)
    val emb = spark.table("pipeline_embeddings")
    val nVec = graft.sources.PipelineCorpus.vecsFor(scale)
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ivfpqPhases] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    // untimed warm read, as the bench does
    try emb.write.format("noop").mode("overwrite").save() catch { case _: Throwable => }
    val nQueries = math.max(48L, math.min(200L, 400000000L / math.max(nVec, 1L)))
    val qVecs = emb.filter(col("vec_id") % lit(math.max(nVec / nQueries, 1L)) === 0).persist()
    qVecs.count()
    val (nlist, nprobe) = graft.similarity.Similarity.ivfParamsFor(nVec)
    val pqRerank = graft.similarity.Similarity.pqRerankFor(nVec, nlist, nprobe, 10)
    val kmFraction = graft.similarity.Similarity.kmeansFractionFor(nVec)
    println(s"[ivfpqPhases] nVec=$nVec nlist=$nlist nprobe=$nprobe rerank=$pqRerank frac=$kmFraction")
    val x0thr = emb.select(element_at(col("embedding"), 1).cast("double").as("x0"))
      .stat.approxQuantile("x0", Array(0.9), 0.01)(0)
    val embMain = emb.filter(element_at(col("embedding"), 1).cast("double") < x0thr)
    val embDrift = emb.filter(element_at(col("embedding"), 1).cast("double") >= x0thr)
    val c = embMain.select(col("vec_id").as("nn_id"),
      col("embedding").cast("array<double>").as("cv"))
    val sampleOpt = t("sample_collect") {
      graft.similarity.Similarity.collectSample(c.select(col("cv")),
        math.max(nlist, 256).toLong * 10, 42L, kmFraction)
    }
    val centers = t("coarse_kmeans_fit") {
      graft.similarity.Similarity.localKMeans(sampleOpt.get, nlist, 5, 42L)
    }
    val books = t("pq_books_fit") {
      // same shape as Similarity.pqTrainLocal (private): m sub-space fits
      val sample = sampleOpt.get
      val m = 8
      val dsub = sample(0).length / m
      Array.tabulate(m) { j =>
        graft.similarity.Similarity.localKMeans(
          sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)),
          256, 5, 42L + j)
      }
    }
    t("assign_scan_noop") {
      c.withColumn("cell",
          graft.similarity.Similarity.nearestCell(centers)(col("cv")))
        .select(col("nn_id"), col("cell"))
        .write.format("noop").mode("overwrite").save()
    }
    t("assign_encode_noop") {
      val assigned = c.withColumn("cell",
        graft.similarity.Similarity.nearestCell(centers)(col("cv")))
        .select(col("nn_id"), col("cv"), col("cell"))
      graft.similarity.Similarity.pqEncode(assigned, "nn_id", "cv", books,
          keepCols = Seq("cell"))
        .select(col("nn_id"), col("cell"), col("codes"), col("norm"))
        .write.format("noop").mode("overwrite").save()
    }
    // full build (re-runs the fits internally — fit cost above subtracts)
    val (centersB, booksB) = t("build_total(fits+encode+write)") {
      graft.similarity.Similarity.buildIvfPqIndex(embMain, "vec_id", "embedding",
        "bench_pq_idx_phases", nlist = nlist, m = 8, ksub = 256,
        trainFraction = kmFraction)
    }
    t("append_drift") {
      graft.similarity.Similarity.appendToIvfPqIndex("bench_pq_idx_phases",
        centersB, booksB, embDrift, "vec_id", "embedding")
    }
    t("query_adc_shortlist_only") {
      // rerank=0, k=pqRerank: times ADC scoring + the shortlist ranking
      // (the window path), without the exact rerank tail
      graft.similarity.Similarity.ivfPqTopKIndexed(spark, "bench_pq_idx_phases",
        centersB, booksB, qVecs, "vec_id", "embedding", pqRerank,
        nprobe = nprobe, rerank = 0)
        .write.format("noop").mode("overwrite").save()
    }
    t("query_full(adc+rerank)") {
      graft.similarity.Similarity.ivfPqTopKIndexed(spark, "bench_pq_idx_phases",
        centersB, booksB, qVecs, "vec_id", "embedding", 10,
        nprobe = nprobe, rerank = pqRerank, rerankFrom = Some(emb))
        .write.format("noop").mode("overwrite").save()
    }
    spark.sql("DROP TABLE IF EXISTS bench_pq_idx_phases")
    spark.sql("DROP TABLE IF EXISTS bench_pq_idx_phases_codebooks")
    spark.stop()
    sys.exit(0)
  }
}
