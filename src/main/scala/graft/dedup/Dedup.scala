package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Document deduplication suite for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * All stages are declarative DataFrame transforms (no UDFs, no driver
  * loops), so the same code runs on 5k docs locally and 100 TB on a
  * cluster. Scale anatomy of the LSH path:
  *
  *   scan → shingle → signature            (no shuffle, computed in scan stage)
  *   → explode bands → shuffle on (band, hash)   (the ONLY wide exchange;
  *                                          bucket sizes are ~uniform because
  *                                          band hashes are 64-bit)
  *   → per-bucket pair generation → distinct pairs
  *   → verify join (2 shuffles on doc id to fetch shingle sets)
  *
  * A hot bucket (thousands of identical docs) would quadratically blow up
  * pair generation — `maxBucketSize` caps it, mirroring the skip-huge-
  * cluster guard production dedup pipelines use.
  */
object Dedup {

  /** Exact dedup by content fingerprint (hash-groupBy): keeps the row with
    * the smallest `idCol` per normalized-text group. One shuffle on the
    * 16-hex-char fingerprint — at 100 TB this is the cheapest possible
    * exact dedup (fingerprint computed in the scan, map-side combine on). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", fingerprint64(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))

  /** MinHash signatures banded for LSH: one row per (doc, band) with the
    * band's hash — the join key for candidate generation. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    df.select(col(idCol).as("id"), charShingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.
    * Returns distinct (id_a < id_b) pairs with both shingle sets attached
    * (so verification needs no extra join). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 150, bands: Int = 50,
      maxBucketSize: Int = 1000): DataFrame = {
    val banded = minhashBands(df, idCol, textCol, shingleN, numHashes, bands)
    val capped = banded
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy("band", "band_hash")))
      .filter(col("bucket_n") <= maxBucketSize)
    val a = capped.select(col("band"), col("band_hash"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band"), col("band_hash"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact Jaccard similarity of two (distinct-element) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Near-duplicate pairs: LSH candidates verified with exact Jaccard >
    * `threshold`. With r = numHashes/bands rows per band, a pair at
    * similarity j is missed with probability (1 - j^r)^bands — the defaults
    * (r=3, b=50) put that below 1e-9 at j = 0.7. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingleN: Int = 3,
      numHashes: Int = 150, bands: Int = 50): DataFrame =
    minhashCandidates(df, idCol, textCol, shingleN, numHashes, bands)
      .withColumn("jaccard_sim", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard_sim") > threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard_sim"), 6).as("jaccard_sim"))

  /** SimHash near-dup pairs: 64-bit fingerprints, banded into four 16-bit
    * pieces (pigeonhole: any pair within Hamming distance 3 shares at least
    * one exact 16-bit band), verified by exact Hamming ≤ maxHamming. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      simhash64(tokens(lower(col(textCol)))).as("fp"))
    val banded = fp.select(col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("fp"), b * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "piece")
    val a = banded.select(col("band"), col("piece"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("piece"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "piece"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-dup pairs: hyperplane-LSH bucketing (exact signature
    * match on nBits random hyperplane signs) then exact cosine verify.
    * Approximate-recall by construction; raise nBits for precision,
    * lower for recall. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 16): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), nBits))
    val a = sig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, "sig")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
