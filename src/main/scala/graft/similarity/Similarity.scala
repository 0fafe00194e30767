package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, per the usual scale playbook:
  *  - `bruteForceTopK`: exact. Broadcast the (small) query set against the
  *    corpus — one scan, no corpus shuffle, a per-partition top-k heap via
  *    window row_number, then a k-sized merge. Right answer up to ~10^4
  *    queries × any corpus size.
  *  - `lshTopK`: sub-linear scale path. Random-hyperplane signatures bucket
  *    the corpus (IVF-style coarse quantization with Hamming probing would
  *    be the next refinement); only same-bucket candidates are scored.
  *    Recall < 1 by construction — the price of not scanning 100 TB per
  *    query.
  *
  * Vectors are cast float→double before arithmetic so scores are
  * reproducible across engines (and against the DuckDB oracle).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector (cosine). Excludes
    * self-matches on id equality. Scores rounded to `roundTo` decimals
    * before ranking so ordering is reproducible; ties broken by corpus id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", round(cosineSim(col("qv"), col("cv")), roundTo))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nn_id"), col("sim"))
  }

  /** Multi-table hyperplane signatures: one row per (table, vector) with
    * the table's `nBits`-bit signature; table t uses hyperplanes seeded
    * from t*nBits onward, so tables are independent. All tables' bits are
    * computed in ONE native codegen'd pass over the vector
    * (graft.plans.HyperplaneSignatures). */
  private def signatures(df: DataFrame, idName: String, vecName: String,
      nBits: Int, tables: Int): DataFrame =
    df.select(col(idName), col(vecName),
      posexplode(hyperplaneSignatures(col(vecName), nBits, tables)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "sig")

  /** Approximate top-k via standard multi-table LSH: `tables` independent
    * `nBits`-bit signature tables; a corpus vector is a candidate if it
    * collides with the query in ANY table. Recall rises with `tables`,
    * cost with candidates-per-query (≈ tables × corpus / 2^nBits). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 6,
      tables: Int = 8): DataFrame = {
    val c = signatures(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).cast("array<double>").as("cv")),
      "nn_id", "cv", nBits, tables)
    val q = signatures(
      queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv")),
      "query_id", "qv", nBits, tables)
    val scored = c.join(broadcast(q), Seq("tbl", "sig"))
      .filter(col("nn_id") =!= col("query_id"))
      .dropDuplicates("query_id", "nn_id")
      .withColumn("sim", round(cosineSim(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("nn_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("nn_id"), col("sim"))
  }
}
