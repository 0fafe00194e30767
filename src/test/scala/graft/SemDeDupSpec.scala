package graft

import org.apache.spark.sql.functions._

import graft.dedup.SemDeDup
import graft.functions.cosineSim
import graft.text.Decontaminate

/** Semantic dedup + benchmark decontamination contracts. */
class SemDeDupSpec extends GraftSpec {
  import spark.implicits._

  /** Two well-separated blobs around e1/e2 with deterministic per-id
    * noise; within-blob cosines are high, cross-blob ~0. */
  private def blobs(n: Int, noise: Double) = {
    def vec(id: Int): Array[Float] = {
      val dim = 8
      val base = Array.fill(dim)(0.0)
      base(if (id % 2 == 0) 0 else 1) = 1.0
      Array.tabulate(dim) { i =>
        val h = ((id * 1103515245L + i * 12345L) % 1000).toDouble / 1000.0 - 0.5
        (base(i) + noise * h).toFloat
      }
    }
    (0 until n).map(id => (id.toLong, vec(id))).toDF("vec_id", "embedding")
  }

  test("semanticPairs with cells covering the blobs equals exact all-pairs") {
    val emb = blobs(80, noise = 0.35).cache()
    val tau = 0.97
    val exact = {
      val a = emb.select(col("vec_id").as("id_a"),
        col("embedding").cast("array<double>").as("va"))
      val b = emb.select(col("vec_id").as("id_b"),
        col("embedding").cast("array<double>").as("vb"))
      a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cosine_sim", round(cosineSim(col("va"), col("vb")), 6))
        .filter(col("cosine_sim") >= tau)
        .select("id_a", "id_b", "cosine_sim")
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(exact.nonEmpty, "test corpus produced no exact pairs — thresholds broken")
    val found = SemDeDup.semanticPairs(emb, "vec_id", "embedding",
      tau = tau, nlist = 2)
      .as[(Long, Long, Double)].collect().toSet
    // k=2 cells recover the two blobs; every >= tau pair is within-blob
    assert(found == exact, s"within-cell pairs ${found.size} != exact ${exact.size}")
    emb.unpersist()
  }

  test("semanticDedup keeps the component minimum across a chained group") {
    // a~b and b~c clear tau, a~c does not: one GROUP via components
    val theta = math.acos(0.95)
    def rot(t: Double): Array[Float] =
      Array(math.cos(t).toFloat, math.sin(t).toFloat, 0f, 0f)
    val far = Array(0f, 0f, 1f, 0f)
    val emb = Seq(
      (10L, rot(0)), (11L, rot(theta)), (12L, rot(2 * theta)),
      (20L, far)).toDF("vec_id", "embedding")
    val pairs = SemDeDup.semanticPairs(emb, "vec_id", "embedding",
      tau = 0.9, nlist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L), (11L, 12L)), s"got $pairs")
    val kept = SemDeDup.semanticDedup(emb, "vec_id", "embedding",
      tau = 0.9, nlist = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L), s"kept $kept")
  }

  test("cells over maxClusterSize are skipped, not exploded") {
    val emb = blobs(60, noise = 0.05)
    // blob cells have ~30 members; cap below that -> zero pairs anywhere
    val found = SemDeDup.semanticPairs(emb, "vec_id", "embedding",
      tau = 0.9, nlist = 2, maxClusterSize = 10)
    assert(found.count() == 0)
  }

  test("LSH-bucketed semantic pairs recover every planted near-copy") {
    val base = blobs(1000, noise = 0.35)
    // plant a barely-perturbed copy of every 10th vector at id+10000:
    // cosine ~0.9999, far above tau, across every hyperplane with
    // overwhelming probability at 8 tables
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.003f) * (x - lit(0.1f))).as("embedding"))
    val emb = base.unionByName(copies).cache()
    val found = SemDeDup.semanticPairsLsh(emb, "vec_id", "embedding",
      tau = 0.99, targetBucket = 50L, tables = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 1000 by 10).map(i => (i.toLong, i + 10000L)).toSet
    val missed = planted -- found
    assert(missed.isEmpty, s"missed ${missed.size} planted pairs: ${missed.take(5)}")
    // soundness is by construction (exact cosine filter), but check anyway
    assert(found.forall { case (a, b) => a < b })
    emb.unpersist()
  }

  test("semantic decontamination flags exact and near benchmark copies only") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)),            // exact benchmark copy
      (1L, Seq(0.999f, 0.01f, 0f, 0f)),       // near copy, cos > 0.99
      (2L, Seq(0.7f, 0.7f, 0f, 0f)),          // cos ~0.707 — clean
      (3L, Seq(0f, 0f, 1f, 0f)))              // orthogonal — clean
      .toDF("doc_id", "v")
    val bench = Seq(Tuple1(Seq(1.0f, 0f, 0f, 0f))).toDF("bv")
    val out = Decontaminate.semanticFlag(corpus, "doc_id", "v", bench, "bv")
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))

    // empty benchmark: nothing flags, every doc still present with cos -1
    val none = Decontaminate.semanticFlag(corpus, "doc_id", "v",
      bench.limit(0), "bv")
    assert(none.count() == 4)
    assert(none.filter(col("contaminated")).count() == 0)
    assert(none.select(max(col("max_benchmark_cos"))).head().getDouble(0) == -1.0)
  }

  test("decontamination counts distinct shared n-grams and drops flagged docs") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains the full benchmark sentence -> all 5 of its 5-grams
      (100L, "intro words then the quick brown fox jumps over the lazy dog and more"),
      // shares exactly one 5-gram window
      (101L, "the quick brown fox jumps somewhere else entirely now"),
      (102L, "completely unrelated clean training document text here")
    ).toDF("doc_id", "text")
    val flagged = Decontaminate.flagContaminated(docs, "doc_id", "text",
      bench, "text", n = 5, minHits = 2)
      .select("doc_id", "n_hits", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(flagged.toSeq == Seq((100L, 5L, true), (101L, 1L, false),
      (102L, 0L, false)), s"got ${flagged.toSeq}")
    val survivors = Decontaminate.decontaminate(docs, "doc_id", "text",
      bench, "text", n = 5, minHits = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(101L, 102L))
    // the drop form restores the original schema
    assert(Decontaminate.decontaminate(docs, "doc_id", "text", bench, "text")
      .columns.toSeq == docs.columns.toSeq)
  }
}
