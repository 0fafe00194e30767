package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model with stupid backoff (Brants et al.,
  * EMNLP'07 — the large-scale web-LM scoring scheme) for CCNet-style
  * perplexity filtering (Wenzek et al., LREC'20): score every document by
  * its mean per-token log-probability under a reference corpus's n-gram
  * statistics, then keep/bucket by score. The reference pipeline's
  * quality-filter triad is heuristics → classifier → LM perplexity; this
  * is the third leg (TextAnalysis has the first, QualityClassifier the
  * second).
  *
  * Scale shape: training is ONE shuffle over corpus n-grams collapsing to
  * vocabulary-bound count tables (map-side partial aggregation does the
  * heavy lifting; `minBigramCount` prunes the long tail, which is what
  * keeps a 100 TB corpus's bigram table broadcastable — pruned pairs are
  * exactly what backoff is for). Scoring joins the exploded token stream
  * against the BROADCAST count tables — the per-token lookups never
  * shuffle — and collapses back to one row per document with partial
  * aggregation, so the only wide exchange is on doc id.
  */
object NgramLm {

  /** (unigrams (w, c), bigrams (w1, w2, c), total token count). Count
    * tables are vocabulary-bound DataFrames, small enough to broadcast. */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, total: Long)

  /** Whitespace tokens of normalized text — same normalization as the
    * dedup/fingerprint family so models transfer across operators. */
  private[graft] def tokens(text: Column): Column =
    split(lower(trim(regexp_replace(text, "\\s+", " "))), " ")

  /** Adjacent-pair structs of a token array; empty for < 2 tokens (guard
    * required: Spark's sequence(2, 1) auto-steps DOWNWARD). */
  private def bigramPairs(tk: Column): Column =
    when(size(tk) >= 2,
      transform(sequence(lit(2), size(tk)), i =>
        struct(element_at(tk, i - 1).as("w1"), element_at(tk, i).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Train on a reference corpus: unigram + bigram counts, bigrams pruned
    * below `minBigramCount` (scored later via backoff). */
  def train(df: DataFrame, textCol: String,
      minBigramCount: Long = 1L): Model = {
    val tk = df.select(tokens(col(textCol)).as("tk"))
    val uni = tk.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = tk
      .select(explode(bigramPairs(col("tk"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minBigramCount)
    val total = uni.agg(sum("c")).head().getLong(0)
    Model(uni, bi, total)
  }

  /** Score each document: (input columns) + n_scored (bigram positions) +
    * avg_logp (mean log10 stupid-backoff probability, rounded to 6).
    *
    * S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if the bigram is in
    * the (pruned) table; else alpha * c(w_i) / N; else alpha * 0.5 / N
    * for out-of-vocabulary tokens. Higher (less negative) = more like the
    * reference corpus; CCNet's head/middle/tail buckets are quantiles of
    * this score. Documents with < 2 tokens score null. */
  def score(df: DataFrame, idCol: String, textCol: String, model: Model,
      alpha: Double = 0.4): DataFrame = {
    val pairs = df
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(bigramPairs(col("tk"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = pairs
      .join(broadcast(model.bigrams.withColumnRenamed("c", "c_bi")),
        Seq("w1", "w2"), "left")
      .join(broadcast(model.unigrams
        .select(col("w").as("w1"), col("c").as("c_prev"))), Seq("w1"), "left")
      .join(broadcast(model.unigrams
        .select(col("w").as("w2"), col("c").as("c_w"))), Seq("w2"), "left")
      .withColumn("logp",
        when(col("c_bi").isNotNull,
          log10(col("c_bi").cast("double") / col("c_prev")))
          .otherwise(lit(math.log10(alpha)) +
            log10(coalesce(col("c_w").cast("double"), lit(0.5)) /
              lit(model.total.toDouble))))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_scored"), round(avg("logp"), 6).as("avg_logp"))
  }
}
