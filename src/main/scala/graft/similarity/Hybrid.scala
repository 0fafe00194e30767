package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine the ranked output of several
  * retrievers (BM25 lexical, embedding-cosine semantic, …) into one
  * ranking per query with reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009):
  *
  * {{{
  *   rrf(q, d) = Σ_i  w_i / (rrfK + rank_i(q, d))
  * }}}
  *
  * summed over the retrievers in whose top-k list `d` appears. RRF needs
  * no score calibration between retrievers — only ranks — which is why it
  * is the standard first fusion in hybrid search.
  *
  * Scale anatomy: fusion consumes CANDIDATE LISTS, never corpora. Each
  * input is a per-query top-k (|queries| × k rows — the bounded output of
  * [[graft.text.Bm25.topK]] / [[Similarity.bruteForceTopK]] / the ANN
  * tiers), so the union + per-(query, doc) sum is a single tiny shuffle
  * that is independent of corpus size; the 100 TB cost lives entirely in
  * the upstream retrievers. Final ranking reuses the bounded partial+final
  * top-k aggregator ([[Similarity.rankTopK]]), and scores round before
  * ranking with doc-id tie-breaks, so the fused order is deterministic and
  * engine-portable.
  */
object Hybrid {

  /** Fuse ranked lists into a per-query top-k.
    *
    * Each input must have columns `(query_id, rnk, doc_id)` with `rnk`
    * 1-based (extra columns are ignored). `weights`, when given, must
    * align with `lists` (default: all 1.0). Output:
    * `(query_id, rnk, doc_id, rrf_score)`. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60,
      weights: Seq[Double] = Nil, roundTo: Int = 6): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val w = if (weights.isEmpty) Seq.fill(lists.size)(1.0) else weights
    require(w.size == lists.size, s"${w.size} weights for ${lists.size} lists")
    val contribs = lists.zip(w).map { case (df, wi) =>
      df.select(col("query_id"), col("doc_id"),
        (lit(wi) / (lit(rrfK) + col("rnk").cast("double"))).as("contrib"))
    }
    val scored = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib"), roundTo).as("sim"))
      .select(col("query_id"), col("doc_id").as("nn_id"), col("sim"))
    Similarity.rankTopK(scored, k)
      .withColumnRenamed("nn_id", "doc_id")
      .withColumnRenamed("sim", "rrf_score")
  }
}
