package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the fastText-style linear
  * classifier over hashed word n-grams that production pretraining
  * pipelines use for quality filtering (the CCNet / GPT-3 appendix-A
  * "quality classifier" shape), next to the rule-based
  * [[TextAnalysis.withTextFeatures]] heuristics.
  *
  * Features are the hashing trick: word unigrams + bigrams bucketed by a
  * PORTABLE md5-prefix hash into `dims` buckets, term frequency
  * normalized by gram count. Scoring is fully declarative — tokenize,
  * gram, bucket, weight-lookup and sigmoid all run as codegen'd array
  * expressions in the scan stage, zero shuffles, so scoring 100 TB is a
  * single pass with the weight vector as a broadcast literal.
  *
  * Training uses Spark ML's LogisticRegression over the same features
  * (assembled sparse per document); the spec pins the declarative scorer
  * to the trained model's own probability output, so the scan-stage
  * scorer and the training-time model can never drift apart.
  */
object QualityClassifier {

  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Word unigrams ++ bigrams ("a b") of the lowercased text. */
  def ngrams(c: Column): Column = {
    val t = toks(c)
    val n1 = greatest(size(t) - 1, lit(0))
    concat(t, zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
      (a, b) => concat_ws(" ", a, b)))
  }

  /** Engine-portable feature bucket in [0, dims): the first 6 hex chars
    * of md5 as an integer, mod dims — DuckDB spells the identical value
    * ('0x' || substr(md5(g),1,6))::BIGINT % dims. */
  def bucket(term: Column, dims: Int): Column =
    conv(substring(md5(term), 1, 6), 16, 10).cast("long") % dims

  /** Mean per-gram weight: sum(w[bucket(g)]) / n_grams, or 0 for empty
    * text. `weights` rides the plan as a literal array (a few KB). */
  private def meanWeight(text: Column, weights: Array[Double]): Column = {
    val wl = array(weights.map(lit): _*)
    val g = ngrams(text)
    when(size(g) > 0,
      aggregate(g, lit(0.0),
        (acc, t) => acc + element_at(wl, (bucket(t, weights.length) + 1).cast("int")))
        / size(g))
      .otherwise(lit(0.0))
  }

  /** Sigmoid quality score in (0,1): 1/(1+exp(-(bias + meanWeight))).
    * Evaluates through the native graft.plans.QualityScore expression —
    * one tight loop per document instead of an interpreted lambda + md5
    * expression tree per gram (~300 grams/doc; the difference is minutes
    * vs hours on a 10M-doc corpus). Feature semantics are identical;
    * [[scoreColDeclarative]] keeps the pure-SQL formulation and the spec
    * pins the two bit-for-bit. */
  def scoreCol(text: Column, weights: Array[Double], bias: Double): Column =
    org.apache.spark.sql.graftbridge.column(
      graft.plans.QualityScore(
        org.apache.spark.sql.graftbridge.expression(text),
        weights.toIndexedSeq, bias))

  /** The declarative twin of [[scoreCol]] (the DuckDB oracle's closed
    * form, spelled in Spark SQL expressions). */
  def scoreColDeclarative(text: Column, weights: Array[Double], bias: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-(lit(bias) + meanWeight(text, weights))))

  /** Score every document: input columns + quality_score. */
  def score(df: DataFrame, textCol: String, weights: Array[Double],
      bias: Double): DataFrame =
    df.withColumn("quality_score", scoreCol(col(textCol), weights, bias))

  /** JVM twin of [[bucket]] for training-side feature assembly. */
  private[graft] def jvmBucket(term: String, dims: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = md.take(3).map(b => f"$b%02x").mkString // first 6 hex chars
    (java.lang.Long.parseLong(hex, 16) % dims).toInt
  }

  private[graft] def jvmNgrams(text: String): Array[String] = {
    val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    t ++ t.iterator.zip(t.iterator.drop(1)).map { case (a, b) => s"$a $b" }
  }

  /** Train a logistic quality model on (textCol, labelCol ∈ {0,1}):
    * returns (weights over `dims` hashed-gram buckets, bias) directly
    * consumable by [[score]]. Features are mean-normalized counts per
    * bucket — identical to the declarative scorer's meanWeight, so the
    * fitted model's probability and [[score]]'s output agree exactly
    * (pinned in the spec). */
  def train(df: DataFrame, textCol: String, labelCol: String,
      dims: Int = 4096, maxIter: Int = 50,
      regParam: Double = 0.0): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val spark = df.sparkSession
    import spark.implicits._
    val d = dims
    val data = df.select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .as[(String, Double)]
      .map { case (text, label) =>
        val grams = jvmNgrams(text)
        val tf = new scala.collection.mutable.HashMap[Int, Double]()
        grams.foreach { g =>
          val b = jvmBucket(g, d)
          tf(b) = tf.getOrElse(b, 0.0) + 1.0
        }
        val n = math.max(grams.length, 1).toDouble
        val idx = tf.keys.toArray.sorted
        (label, Vectors.sparse(d, idx, idx.map(tf(_) / n)))
      }
      .toDF("label", "features")
    val model = new LogisticRegression().setMaxIter(maxIter)
      .setRegParam(regParam).fit(data)
    (model.coefficients.toArray, model.intercept)
  }
}
