package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.cosineSim

/** Semantic deduplication over an embedding column — SemDeDup (Abbas et
  * al. 2023, arXiv:2303.09540): near-duplicate SEMANTICS (paraphrases,
  * templated rewrites, translations back and forth) that shares few
  * n-grams and so slips past MinHash/SimHash, caught by cosine proximity
  * in embedding space.
  *
  * The published recipe is exactly the scale shape implemented here:
  * k-means the embeddings into many clusters, compare pairs ONLY within a
  * cluster (semantic duplicates land in the same cell; cross-cluster
  * pairs are below threshold by construction of the quantizer), keep one
  * representative per duplicate group. The all-pairs alternative is
  * O(n²) and dead at 100 TB; within-cluster with `nlist ~ sqrt(n)` cells
  * (the [[graft.similarity.Similarity.ivfParamsFor]] rule) bounds pair
  * work per cell, and a per-cell population cap skips pathological cells
  * outright (same guard as the LSH bucket cap — a cell that big is a
  * degenerate mass, not a dedup candidate set).
  *
  * Reference behaviour target: the reference has no embedding-level
  * dedup; this extends the dedup family (exact → MinHash → SimHash →
  * semantic) the training-data tier requires.
  */
object SemDeDup {

  /** Within-cluster candidate pairs with cosine >= `tau`, as
    * (id_a, id_b, cosine_sim), id_a < id_b, scores rounded to `roundTo`.
    * The k-means fit samples `trainFraction` of the corpus (driver-held
    * codebook); assignment is one scan-stage pass; the pairwise stage is
    * an equi-join on the cell id — cells over `maxClusterSize` are
    * dropped BEFORE the join, so no task ever materializes a huge cell's
    * cross product. `nlist <= 0` derives the cell count from the corpus
    * size via the ivfParamsFor rule. */
  def semanticPairs(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, nlist: Int = 0, seed: Long = 42L, maxIter: Int = 5,
      trainFraction: Double = 0.1, maxClusterSize: Int = 10000,
      roundTo: Int = 6): DataFrame = {
    val cells = assignCells(emb, idCol, vecCol,
      if (nlist > 0) nlist
      else graft.similarity.Similarity.ivfParamsFor(
        math.max(emb.count(), 1L))._1,
      seed, maxIter, trainFraction)
    val ok = cells.groupBy("cell").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxClusterSize).select("cell")
    val capped = cells.join(ok, Seq("cell"), "left_semi")
    val a = capped.select(col("cell"), col("id").as("id_a"), col("cv").as("cv_a"))
    val b = capped.select(col("cell"), col("id").as("id_b"), col("cv").as("cv_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(cosineSim(col("cv_a"), col("cv_b")), roundTo))
      .filter(col("cosine_sim") >= tau)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** One row per kept embedding: [[semanticPairs]] resolved to duplicate
    * GROUPS by connected components (a chain a~b~c is one group even when
    * cos(a,c) < tau), keeping the minimum id of each group — the same
    * pairs → components → canonical pipeline as the MinHash path, so the
    * two dedup families compose. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, nlist: Int = 0, seed: Long = 42L, maxIter: Int = 5,
      trainFraction: Double = 0.1, maxClusterSize: Int = 10000): DataFrame = {
    val pairs = semanticPairs(emb, idCol, vecCol, tau, nlist, seed, maxIter,
      trainFraction, maxClusterSize)
    DupClusters.dedupKeepCanonical(emb, idCol, pairs, "id_a", "id_b")
  }

  /** The data-independent scale path: candidate pairs from HYPERPLANE
    * signature buckets (cosine LSH) instead of k-means cells. A k-means
    * fine enough for per-cell pairwise at 10^8+ vectors needs more
    * centroids than a distributed fit can deliver; hyperplane buckets
    * cost one codegen'd pass, and `tables` independent tables recover the
    * recall a single narrow bucket loses (a tau=0.95 pair agrees on a
    * random hyperplane with p ≈ 0.9, so 8 tables at pop-50 buckets catch
    * ~85% per table-union — raise `tables` for harder targets). Bucket
    * width derives from the corpus via
    * [[graft.similarity.Similarity.lshParamsFor]] with a dedup-sized
    * `targetBucket`; per-bucket population caps apply BEFORE the join.
    * Only (table, signature, id) rows shuffle for candidate generation;
    * vectors travel once per surviving candidate pair. */
  def semanticPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
      tau: Double, targetBucket: Long = 50L, tables: Int = 8,
      maxBucketSize: Int = 2000, roundTo: Int = 6): DataFrame = {
    val n = math.max(emb.count(), 1L)
    val (nBits, _) = graft.similarity.Similarity.lshParamsFor(n, targetBucket)
    val c = emb.select(col(idCol).as("id"), col(vecCol))
    val sigs = c.select(col("id"),
      posexplode(graft.functions.hyperplaneSignatures(col(vecCol), nBits, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")
    val ok = sigs.groupBy("tbl", "sig").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize).select("tbl", "sig")
    val capped = sigs.join(ok, Seq("tbl", "sig"), "left_semi")
    val cand = capped.select(col("tbl"), col("sig"), col("id").as("id_a"))
      .join(capped.select(col("tbl"), col("sig"), col("id").as("id_b")),
        Seq("tbl", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val va = emb.select(col(idCol).as("id_a"), col(vecCol).cast("array<double>").as("cv_a"))
    val vb = emb.select(col(idCol).as("id_b"), col(vecCol).cast("array<double>").as("cv_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine_sim", round(cosineSim(col("cv_a"), col("cv_b")), roundTo))
      .filter(col("cosine_sim") >= tau)
      .select("id_a", "id_b", "cosine_sim")
  }

  /** K-means cell assignment: (cell, id, cv). Exposed for callers that
    * persist the clustered layout (the SemDeDup paper's one-pass-per-
    * epoch reuse) — bucket by cell exactly as
    * [[graft.similarity.Similarity.buildIvfIndex]] does. */
  def assignCells(emb: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L, maxIter: Int = 5,
      trainFraction: Double = 0.1): DataFrame = {
    import graft.similarity.Similarity
    val c = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("cv"))
    val centers = Similarity.fitCenters(c, nlist, seed, maxIter, trainFraction)
    c.withColumn("cell", Similarity.nearestCell(centers)(col("cv")))
      .select("cell", "id", "cv")
  }
}
