package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that
  * share word n-grams with an evaluation/benchmark set — the published
  * hygiene step every serious pretraining pipeline runs (GPT-3 appendix
  * C's 13-gram collision rule; The Pile and Dolma ship the same idea).
  *
  * Scale shape, which is the whole point at 100 TB: the benchmark side is
  * tiny (eval suites are thousands of documents), so its distinct n-gram
  * set BROADCASTS; the corpus side computes its n-grams in the scan
  * stage and probes the broadcast hash relation — no corpus shuffle for
  * the match. The per-document hit count then group-bys on the document
  * id, where every n-gram row of a document sits in the partition that
  * scanned it, so map-side partial aggregation collapses to ~one row per
  * document before the (only) shuffle.
  */
object Decontaminate {

  /** Distinct word `n`-grams of a text column, whitespace-normalized and
    * lowercased — plain strings, not hashes, so an external engine
    * reproduces the set byte-for-byte. Documents shorter than `n` tokens
    * yield no n-grams (nothing meaningful to collide on). */
  def wordNgrams(c: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size $n")
    val toks = split(lower(trim(regexp_replace(c, "\\s+", " "))), " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Per-document contamination counts: `docs` with `n_hits` = number of
    * distinct `n`-grams shared with ANY benchmark document and
    * `contaminated` = n_hits >= minHits. The benchmark n-gram set is
    * deduplicated then broadcast; corpus n-grams never shuffle. */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame = {
    val benchGrams = benchmark
      .select(explode(wordNgrams(col(benchTextCol), n)).as("__gram"))
      .distinct()
    val hits = docs
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
    docs.join(hits, Seq(idCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }

  /** The drop form: training docs with fewer than `minHits` colliding
    * n-grams survive. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      minHits: Int = 1): DataFrame =
    flagContaminated(docs, idCol, textCol, benchmark, benchTextCol, n, minHits)
      .filter(!col("contaminated"))
      .drop("n_hits", "contaminated")

  /** SEMANTIC decontamination: flag corpus documents whose embedding is
    * near-identical to any benchmark embedding — catches paraphrased or
    * reformatted eval leakage the n-gram rule misses (the rephrased-GSM8K
    * failure mode). Exact by construction: eval sets are small, so the
    * benchmark side is broadcast whole and every corpus row scores its
    * true max cosine in one scan pass — no LSH, no recall risk, and the
    * only shuffle is the map-side-combined (id → max) collapse. At 100 TB
    * corpus cost is rows × |benchmark| multiply-adds, embarrassingly
    * parallel; shrink the constant with [[graft.similarity.Similarity
    * .randomProject]] on both sides when the benchmark is large. */
  def semanticFlag(emb: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, benchVecCol: String,
      threshold: Double = 0.99): DataFrame = {
    val c = emb.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
    val b = benchmark
      .select(col(benchVecCol).cast("array<double>").as("__bv"))
    val scored = c.crossJoin(broadcast(b))
      .withColumn("__cos", graft.functions.cosineSim(col("__v"), col("__bv")))
      .groupBy(idCol).agg(max(col("__cos")).as("max_benchmark_cos"))
    emb.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("max_benchmark_cos"), lit(-1.0)).as("max_benchmark_cos"),
        (coalesce(col("max_benchmark_cos"), lit(-1.0)) >= threshold)
          .as("contaminated"))
  }
}
