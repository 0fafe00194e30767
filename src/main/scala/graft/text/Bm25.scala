package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** BM25 keyword retrieval over a document corpus — the lexical half of
  * similarity search (the embedding half lives in
  * [[graft.similarity.Similarity]]). Used in training-data pipelines for
  * targeted selection ("find documents about X"), quality probes, and as
  * the sparse side of hybrid retrieval.
  *
  * Scoring is the standard Okapi/Lucene formulation:
  * {{{
  *   score(q, d) = Σ_{t ∈ q}  idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
  * }}}
  *
  * Scale anatomy — the plan is the inverted-index PROBE shape, not the
  * index build:
  *   - corpus stats (N, avgdl): one tiny aggregate, broadcast;
  *   - query terms: deduped and BROADCAST — per-term tf is computed in
  *     the scan stage as array arithmetic over each document's tokens
  *     (`size(filter(tokens, t = term))`), so full documents never
  *     shuffle and non-matching (doc, term) rows die in the scan;
  *   - df(t): one narrow aggregate over the matched (term, doc) rows —
  *     at most |query vocabulary| output rows, map-side combined;
  *   - ranking: the bounded partial+final top-k aggregator
  *     ([[Similarity.rankTopK]]), never a per-query global sort.
  * Scores are rounded before ranking and ties break by doc id, so the
  * top-k is deterministic and engine-portable.
  */
object Bm25 {

  /** Whitespace tokenization shared with the rest of the text suite. */
  private[graft] def tokens(c: Column): Column =
    split(lower(trim(regexp_replace(c, "\\s+", " "))), " ")

  /** Top-k BM25 hits per query.
    *
    * `queries`: (queryIdCol, queryTextCol) — a SMALL table (≤ ~10^4 rows;
    * it is broadcast). Output: (query_id, rnk, doc_id, score). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      roundTo: Int = 6): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("tk"))
      .withColumn("dl", size(col("tk")).cast("double"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(tokens(col(queryTextCol)))).as("term"))
    // per (doc, query-term) tf in the scan stage; zero-tf rows never
    // survive to the exchange
    val matched = toks.crossJoin(broadcast(qterms))
      .withColumn("tf",
        size(filter(col("tk"), t => t === col("term"))).cast("double"))
      .filter(col("tf") > 0)
      .select("doc_id", "dl", "query_id", "term", "tf")
    // document frequency per distinct term (a term shared by two queries
    // counts each matching doc once)
    val dfreq = matched.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1) *
          col("tf") * (k1 + 1) /
          (col("tf") + (col("dl") / col("avgdl") * (b * k1) + lit(k1 * (1 - b)))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib"), roundTo).as("sim"))
      .select(col("query_id"), col("doc_id").as("nn_id"), col("sim"))
    Similarity.rankTopK(scored, k)
      .withColumnRenamed("nn_id", "doc_id")
      .withColumnRenamed("sim", "score")
  }
}
