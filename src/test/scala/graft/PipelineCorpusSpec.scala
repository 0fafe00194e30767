package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.sources.PipelineCorpus

/** The scaled pipeline corpus (Bench's dedup/ANN scale-proof tier) at
  * miniature size: the planted-near-dup construction and the recall
  * measurement must hold before the 10x tier's numbers mean anything. */
class PipelineCorpusSpec extends GraftSpec {
  import spark.implicits._

  private val nDocs = 2000L
  private lazy val docs = PipelineCorpus.genDocuments(spark, nDocs).persist()

  test("document generation is deterministic and planted pairs are marked") {
    assert(PipelineCorpus.docText(123L) == PipelineCorpus.docText(123L))
    assert(docs.count() == nDocs)
    val planted = docs.filter(col("dup_of") >= 0)
    assert(planted.count() == nDocs / 10)
    // a mutated copy differs from its base but shares most of its text
    val pair = docs.filter(col("doc_id").isin(8L, 9L))
      .orderBy("doc_id").select("text").as[String].collect()
    assert(pair(0) != pair(1))
  }

  test("planted pairs land above the dedup threshold and minhash finds them") {
    val sh = docs.select(col("doc_id"), graft.functions.charShingleHashes(col("text"), 5).as("sh"))
    val plantedTrue = docs.filter(col("dup_of") >= 0)
      .select(col("dup_of").as("id_a"), col("doc_id").as("id_b"))
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("j", Dedup.jaccard(col("sh_a"), col("sh_b")))
    // the mutation rate must land the BULK of planted pairs above the 0.7
    // Jaccard threshold — otherwise the scale tier's recall denominator
    // collapses and the measurement is vacuous
    val total = plantedTrue.count()
    val above = plantedTrue.filter(col("j") > 0.7).select("id_a", "id_b").persist()
    val denom = above.count()
    assert(denom >= total * 4 / 10, s"only $denom/$total planted pairs above 0.7")
    val found = Dedup.minhashNearDups(docs, "doc_id", "text")
    val hit = above.join(found, Seq("id_a", "id_b"), "left_semi").count()
    val recall = hit.toDouble / denom
    assert(recall >= 0.95, s"planted recall $recall = $hit/$denom")
    above.unpersist()
  }

  test("embeddings cluster structure is real (ANN recall is measurable)") {
    val nVecs = 10000L
    val emb = PipelineCorpus.genEmbeddings(spark, nVecs).persist()
    assert(emb.count() == nVecs)
    assert(emb.select(size(col("embedding"))).distinct().as[Int].collect().toSeq == Seq(PipelineCorpus.Dim))
    // queries drawn from the corpus: exact top-1 neighbors should land in
    // the query's own generator cluster almost always — the structure IVF
    // k-means is supposed to recover
    val q = emb.filter(col("vec_id") % 200 === 0)
    val top1 = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 1)
    val joined = top1
      .join(emb.select(col("vec_id").as("query_id"), col("cluster").as("qc")), "query_id")
      .join(emb.select(col("vec_id").as("nn_id"), col("cluster").as("nc")), "nn_id")
    val same = joined.filter(col("qc") === col("nc")).count()
    val total = joined.count()
    assert(total > 0 && same.toDouble / total >= 0.9,
      s"top-1 neighbor in query's cluster only $same/$total")
    emb.unpersist()
  }

  test("corpus-derived ANN params: r5 anchors pinned, granularity tracks corpus") {
    // the 2M-vector anchor: these exact values measured recall@10 0.974
    // (LSH) and 1.0 (IVF) in round 5 — the derivation must reproduce them
    assert(Similarity.lshParamsFor(2000000L) == (10, 12))
    assert(Similarity.ivfParamsFor(2000000L) == (256, 16))
    // one decade up (the 20M scale-100 corpus): finer buckets, more tables
    assert(Similarity.lshParamsFor(20000000L) == (14, 16))
    assert(Similarity.ivfParamsFor(20000000L) == (1024, 32))
    // bucket population stays within ~2x of target across 4 decades: this
    // is the invariant that bounds per-query candidate work at any size
    for (n <- Seq(100000L, 1000000L, 10000000L, 100000000L)) {
      val (bits, tables) = Similarity.lshParamsFor(n)
      val pop = n.toDouble / (1L << bits)
      assert(pop <= 2000.0 && pop > 500.0, s"n=$n bucket pop $pop")
      assert(tables >= 8 && tables <= 24)
      val (nlist, nprobe) = Similarity.ivfParamsFor(n)
      assert(nlist >= 16 && nlist <= 4096 && nprobe >= 8 && nprobe <= 32)
      // nlist ~ sqrt(n)/4 within the power-of-two rounding
      assert(nlist <= math.sqrt(n.toDouble) / 2 && nlist >= math.sqrt(n.toDouble) / 16,
        s"n=$n nlist $nlist")
    }
    // monotone: a bigger corpus never gets a coarser index
    val sizes = Seq(10000L, 100000L, 1000000L, 10000000L, 100000000L)
    val lsh = sizes.map(Similarity.lshParamsFor(_))
    assert(lsh == lsh.sortBy(_._1))
    val ivf = sizes.map(Similarity.ivfParamsFor(_))
    assert(ivf == ivf.sortBy(_._1))
    // tiny corpora clamp to the floor instead of degenerate 1-bucket tables
    assert(Similarity.lshParamsFor(100L)._1 == 4)
    assert(Similarity.ivfParamsFor(100L)._1 == 16)
    // multi-probe regime: the r5-tuned ≤2M anchor stays single-bucket
    // (probes=0, behavior pinned unchanged); past 12 bits each table also
    // probes 4 Hamming-1 buckets to recover the one-bit misses that eroded
    // recall@10 to 0.961 at 20M/14 bits in r6 (target ≥ 0.97)
    assert(Similarity.lshProbesFor(2000000L) == 0)
    assert(Similarity.lshProbesFor(20000000L) == 4)
    val probes = sizes.map(Similarity.lshProbesFor(_))
    assert(probes == probes.sorted) // never fewer probes on a bigger corpus
  }

  test("PQ rerank and k-means fraction derive from corpus size") {
    // the measured 200k-vector anchor: rerank=candidates/32 ≈ 390 gave
    // recall@10 0.996 where the old constant 50 gave 0.15
    val (nl, np) = Similarity.ivfParamsFor(200000L)
    val r = Similarity.pqRerankFor(200000L, nl, np, 10)
    assert(r >= 300 && r <= 500, s"rerank at 200k: $r")
    // floor: never below 20k even when candidates are few
    assert(Similarity.pqRerankFor(2000L, 16, 12, 10) == 200)
    // cap bounds exact-rescore work at any corpus size
    assert(Similarity.pqRerankFor(1000000000L, 4096, 32, 10) == 250000)
    // density factor: nlist grows only as sqrt(n), so cell population —
    // and with it the ADC near-tie band — outgrows the flat 1/32 rule
    // (measured: 1/32 → recall 0.996 at 200k but 0.592 at 20M); the 20M
    // depth must widen by ~the cell-population ratio vs the 200k anchor
    val (nl20, np20) = Similarity.ivfParamsFor(20000000L)
    val r20 = Similarity.pqRerankFor(20000000L, nl20, np20, 10)
    assert(r20 > 100000, s"20M rerank $r20")
    // rerank never exceeds the candidate pool it ranks
    val cand20 = np20.toLong * 20000000L / nl20
    assert(r20 <= cand20)
    // monotone in corpus size at derived (nlist, nprobe)
    val rr = Seq(10000L, 100000L, 1000000L, 10000000L, 100000000L).map { n =>
      val (nl, np) = Similarity.ivfParamsFor(n)
      Similarity.pqRerankFor(n, nl, np, 10)
    }
    assert(rr == rr.sorted, s"rerank not monotone: $rr")
    // fit sample: 10% small, absolute ~200k cap at scale
    assert(Similarity.kmeansFractionFor(2000L) == 0.1)
    assert(Similarity.kmeansFractionFor(2000000L) == 0.1)
    assert(math.abs(Similarity.kmeansFractionFor(20000000L) - 0.01) < 1e-12)
  }
}
