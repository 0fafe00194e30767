package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Text analysis for training-data curation: language ID, quality scoring,
  * token counting, and document fingerprinting — all built from codegen'd
  * Catalyst expressions (graft.functions), so the whole feature set is
  * computed in the scan stage of a 100 TB read with zero shuffles. */
object TextAnalysis {

  /** Append the standard text-feature columns to `df`. */
  def withTextFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_tokens_bpe", tokenCountBpe(t))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("mean_token_len", round(meanTokenLen(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint64(t))
  }

  /** Quality filter: the keep/drop decision a curation pipeline applies
    * after scoring (kept as a separate step so the score itself stays
    * inspectable). */
  def qualityFilter(df: DataFrame, textCol: String, minQuality: Double): DataFrame =
    withTextFeatures(df, textCol).filter(col("quality") >= minQuality)
}
