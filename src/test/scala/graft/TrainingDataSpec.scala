package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis

class TrainingDataSpec extends GraftSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 0
    (2L, "completely different content about database query optimization engines"),
    (3L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 0
    (4L, "der hund und die katze sind das beste team und der freund")) // German markers
    .toDF("doc_id", "text")

  test("exact dedup groups identical normalized docs") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = out.filter(col("n_dups") === 2).select("kept_id").as[Long].collect()
    assert(dupGroup.toSeq == Seq(0L)) // 0 and 3 collapse, min id kept
    assert(out.count() == 4)
  }

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5,
      numHashes = 60, bands = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dups are trivially near-dups
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }) // the outlier pairs with nothing
  }

  test("simhash puts exact dups at hamming 0") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((0L, 3L)) == 0L)
  }

  test("simhash banding is complete: banded pairs ≡ brute-force at the bound") {
    // regression: a fixed 4-band split misses distance-4..8 pairs whose
    // differing bits touch all four bands; maxHamming+1 bands (pigeonhole)
    // must reproduce the exact all-pairs answer
    import graft.functions._
    for (h <- Seq(3, 5, 8)) {
      val banded = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = h)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val fp = docs.select(col("doc_id"), simhash64(lower(col("text"))).as("fp"))
      val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("hamming", hamming64(col("a.fp"), col("b.fp")))
        .filter(col("hamming") <= h)
        .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
      assert(banded == brute, s"maxHamming=$h: banded ${banded.size} vs brute ${brute.size}")
    }
  }

  test("brute-force cosine topk ranks the closest vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 2)
      .select("rnk", "nn_id").as[(Int, Long)].collect().toMap
    assert(top(1) == 1L && top(2) == 2L)

    // string/uuid corpus ids rank identically and keep their type
    val svecs = vecs.withColumn("vec_id", concat(lit("doc-"), col("vec_id")))
    val stop = Similarity.bruteForceTopK(svecs, svecs.filter(col("vec_id") === "doc-0"),
      "vec_id", "embedding", k = 2)
      .select("rnk", "nn_id").as[(Int, String)].collect().toMap
    assert(stop(1) == "doc-1" && stop(2) == "doc-2")

    // other id types fail fast instead of silently nulling candidates
    val bad = vecs.withColumn("vec_id", col("vec_id").cast("timestamp"))
    intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(bad, bad.limit(1), "vec_id", "embedding", k = 2))
  }

  test("text features: language markers and fingerprint invariance") {
    val feats = TextAnalysis.withTextFeatures(docs, "text")
      .select("doc_id", "lang_pred", "fingerprint", "n_tokens")
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(feats(0L)._2 == "en")
    assert(feats(4L)._2 == "de")
    assert(feats(0L)._3 == feats(3L)._3) // identical docs share fingerprints
    assert(feats(0L)._4 == 13L)
    // whitespace-insensitive fingerprint
    val messy = Seq((9L, "  the   quick brown fox jumps over the lazy dog and runs away fast ")).toDF("doc_id", "text")
    val fp = TextAnalysis.withTextFeatures(messy, "text").select("fingerprint").as[String].head()
    assert(fp == feats(0L)._3)
  }

  test("repetition features flag boilerplate, keep prose") {
    val rep = Seq(
      (0L, "buy now buy now buy now buy now buy now buy now"), // pure boilerplate
      (1L, "the quick brown fox jumps over the lazy dog today")) // no repeated n-grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.withRepetitionFeatures(rep, "text")
      .select("doc_id", "n_bigrams", "dup_bigram_ratio", "dup_trigram_ratio")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // doc 0: 11 bigrams, only 2 distinct ("buy now"/"now buy") → ratio 9/11
    assert(out(0)._2 == 11L && out(0)._3 > 0.8 && out(0)._4 > 0.7, out(0).toString)
    assert(out(1)._3 == 0.0 && out(1)._4 == 0.0, out(1).toString)
    val kept = TextAnalysis.repetitionFilter(rep, "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    // short docs (fewer tokens than the n-gram width) are kept, not crashed
    val short = Seq((9L, "one")).toDF("doc_id", "text")
    assert(TextAnalysis.repetitionFilter(short, "text").count() == 1L)
  }

  test("IVF ANN with full probing equals brute force; partial probing is a subset") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 3)
    val brute = graft.similarity.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = graft.similarity.Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == brute) // probing every cell IS brute force
    val partial = graft.similarity.Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(partial.nonEmpty && partial.length <= brute.size)
  }

  test("embedding near-dup finds planted high-cosine pairs") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => math.sin(i + 1))
    val near = base.map(_ * 1.01 + 0.001) // cosine ≈ 1
    val far = Array.tabulate(16)(i => math.cos(3 * i + 2))
    val df = Seq((0L, base), (1L, near), (2L, far))
      .toDF("vec_id", "embedding")
    val pairs = graft.dedup.Dedup
      .embeddingNearDups(df, "vec_id", "embedding", threshold = 0.95, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("multimodal resize + feature-extract stubs keep the pipeline shape") {
    import spark.implicits._
    val assets = graft.multimodal.Multimodal.asAssets(
      Seq((1L, "hello world this is a payload"), (2L, "x")).toDF("id", "payload"),
      "id", "payload")
    val resized = graft.multimodal.Multimodal.resizeStub(assets, 4, 2)
    val lens = resized.select(col("asset_id"), octet_length(col("content")))
      .as[(Long, Int)].collect().toMap
    assert(lens(1L) == 8 && lens(2L) == 1) // truncated to w*h, short stays short
    val emb = graft.multimodal.Multimodal.featureExtractStub(spark, assets, dim = 16)
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L).length == 16)
    val n = math.sqrt(vecs(1L).map(x => x * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-3) // normalized
    // deterministic: same payload → same embedding
    val again = graft.multimodal.Multimodal.featureExtractStub(spark, assets, 16)
      .as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L).toSeq == again(1L).toSeq)
  }

  test("multimodal decode stub preserves ids and byte lengths") {
    val decoded = Multimodal.decodeStub(spark, Multimodal.asAssets(docs, "doc_id", "text"))
    val row = decoded.filter(col("asset_id") === 0).head()
    assert(row.getAs[Int]("byte_len") == 62)
    assert(row.getAs[String]("header_hex") == "7468652071756963") // "the quic"
    val frames = Multimodal.sampleFramesStub(spark,
      Multimodal.asAssets(docs, "doc_id", "text"), stride = 16)
    assert(frames.filter(col("asset_id") === 0).count() == 3) // floor(62/16)=3
  }
}
