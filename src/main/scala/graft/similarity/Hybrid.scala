package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

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

  /** Maximal-marginal-relevance diversified re-ranking (Carbonell &
    * Goldstein, SIGIR 1998): greedily pick, per query,
    *
    * {{{
    *   argmax_d  λ · rel(d)  −  (1 − λ) · max_{s ∈ selected} cos(d, s)
    * }}}
    *
    * so each pick trades relevance against redundancy with what is
    * already selected — the standard de-duplication of a retrieval page
    * or RAG context window.
    *
    * Input columns: `(query_id, doc_id, rel, vec)` with integral ids,
    * `rel` double (pre-rounded by the upstream retriever) and `vec` the
    * document embedding. Output: `(query_id, rnk, doc_id, mmr_score)`.
    *
    * MMR is inherently sequential per query, so each query's greedy loop
    * runs inside one `flatMapGroups` group — the documented legitimate
    * case: the group is a CANDIDATE LIST (bounded k·retrievers rows by
    * construction, never a corpus), so per-group state is O(candidates)
    * and the stage parallelizes across queries. Pairwise cosines round to
    * `simRoundTo` and step scores to `roundTo` before each argmax (ties
    * by doc id), making the greedy trajectory deterministic and
    * engine-portable; the cosine accumulation order matches
    * [[graft.plans.CosineSim]] (and DuckDB's `list_cosine_similarity`). */
  def mmrRerank(candidates: DataFrame, k: Int, lambda: Double = 0.7,
      simRoundTo: Int = 4, roundTo: Int = 6): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // exact decimal complement so the oracle's literal (1-λ) matches:
    // 1 - 0.7 in binary is 0.30000000000000004, BigDecimal gives 0.3
    val mu = (BigDecimal(1) - BigDecimal(lambda)).toDouble
    def rnd(v: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    candidates
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("rel").cast("double"), col("vec").cast("array<double>"))
      .as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Double])]) =>
        val cs = it.toArray
        val n = cs.length
        val norm = cs.map(c => math.sqrt(c._4.foldLeft(0.0)((a, x) => a + x * x)))
        def cos(i: Int, j: Int): Double = {
          val a = cs(i)._4; val b = cs(j)._4
          val m = math.min(a.length, b.length)
          var dot = 0.0; var t = 0
          while (t < m) { dot += a(t) * b(t); t += 1 }
          val denom = norm(i) * norm(j)
          rnd(if (denom == 0.0) 0.0 else dot / denom, simRoundTo)
        }
        val picked = new Array[Boolean](n)
        val maxSim = new Array[Double](n) // 0 contribution before first pick
        val out = new ArrayBuffer[(Long, Int, Long, Double)](math.min(k, n))
        var step = 1
        while (step <= math.min(k, n)) {
          var best = -1; var bestScore = 0.0
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val sc = rnd(
                lambda * cs(i)._3 - (if (step == 1) 0.0 else mu * maxSim(i)),
                roundTo)
              if (best < 0 || sc > bestScore ||
                  (sc == bestScore && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = sc
              }
            }
            i += 1
          }
          picked(best) = true
          out += ((qid, step, cs(best)._2, bestScore))
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val s = cos(j, best)
              if (step == 1 || s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "rnk", "doc_id", "mmr_score")
  }
}
