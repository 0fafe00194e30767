package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Sampling

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
  * pick raw-corpus documents whose n-gram distribution looks like a
  * TARGET corpus. Each raw document gets an importance log-weight
  *
  * {{{
  *   log w(d) = log p_target(d) − log p_raw(d)
  *            = n_scored · (avg_logp_target − avg_logp_raw)
  * }}}
  *
  * under the two stupid-backoff bigram LMs ([[NgramLm]] — the same
  * engine as the CCNet-style perplexity filter), and the selection is
  * Gumbel top-k over the log-weights: adding an independent Gumbel noise
  * g = −ln(−ln(u)) to each log-weight and taking the k largest keys is
  * exactly weighted sampling WITHOUT replacement with w = exp(log w) —
  * but entirely in log space, so ratio weights spanning hundreds of
  * orders of magnitude never overflow a double. The uniform u is the
  * deterministic md5 hash-uniform shared with the sampling family, so
  * the draw is partition-independent, restartable, and engine-portable.
  *
  * Scale shape: two LM trainings (one shuffle each, vocabulary-bound
  * output), two broadcast-join scoring passes over the raw corpus (the
  * only wide exchange is on doc id), then a global top-k that compiles
  * to TakeOrderedAndProject — per-partition heaps, no full sort.
  * Documents with < 2 tokens have no bigram evidence and are excluded
  * (inner join of the two score passes).
  */
object Dsir {

  private val Ln10 = math.log(10.0) // NgramLm scores are log10

  /** Top-`n` raw documents by Gumbel-noised importance log-weight.
    * Output: (idCol, n_scored, log_w, gumbel_key), key/log_w rounded to 6
    * for engine-portable ordering, ties by id. */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int, minBigramCount: Long = 2L,
      alpha: Double = 0.4): DataFrame = {
    val mt = NgramLm.train(target, textCol, minBigramCount)
    val mr = NgramLm.train(raw, textCol, minBigramCount)
    val st = NgramLm.score(raw, idCol, textCol, mt, alpha)
      .select(col(idCol), col("n_scored"), col("avg_logp").as("logp_t"))
    val sr = NgramLm.score(raw, idCol, textCol, mr, alpha)
      .select(col(idCol), col("avg_logp").as("logp_r"))
    val keyed = st.join(sr, Seq(idCol))
      .withColumn("log_w",
        round(col("n_scored") * (col("logp_t") - col("logp_r")), 6))
      .withColumn("gumbel_key",
        round(col("log_w") * Ln10 -
          log(-log(Sampling.hashUniform(col(idCol)))), 6))
    keyed
      .select(col(idCol), col("n_scored"), col("log_w"), col("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }
}
