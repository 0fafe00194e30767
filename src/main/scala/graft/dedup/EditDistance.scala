package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join for short string keys (names, titles,
  * codes) — the "fuzzy join" production entity-resolution pipelines need
  * and Spark has no operator for.
  *
  * Reference analog: the join/dedup transform family (e.g.
  * sdks/java/extensions/join-library) gives exact-key joins only; fuzzy
  * matching in Beam pipelines is user code inside a ParDo after a
  * GroupByKey on a blocking key. This operator supplies the blocking key:
  * FastSS deletion neighborhoods (Bocek et al., "Fast Similarity Search in
  * Large Dictionaries", 2007).
  *
  * Candidate generation: every string emits all variants reachable by
  * deleting at most `tau` characters (including itself). If
  * levenshtein(a, b) ≤ tau then a and b share at least one variant — the
  * FastSS completeness guarantee — so grouping on the variant finds every
  * true pair. The converse does not hold (sharing a variant only bounds
  * the distance by 2·tau), so survivors are verified with an exact
  * `levenshtein` before anything is emitted.
  *
  * Scale anatomy (the reason this is not an all-pairs join):
  *   scan → generate ≤ C(|s|, ≤tau) variants per string   (no shuffle)
  *   → ONE exchange on the variant string (rows are (variant, id, s) —
  *     narrow, and for keys of length L at tau=2 at most 1+L+L(L-1)/2
  *     rows per key, e.g. ≤ 466 for L=30)
  *   → per-variant-bucket pairing, capped at `maxBucketSize` (a degenerate
  *     bucket — thousands of rows sharing a variant — would blow up
  *     quadratically; the cap mirrors the hot-bucket guard in
  *     [[Dedup.minhashCandidatePairs]])
  *   → distinct pairs → exact levenshtein verify (scan-stage, codegen'd).
  *
  * Intended for SHORT keys (≤ ~50 chars): the neighborhood is quadratic in
  * key length at tau=2. For long strings use MinHash/SimHash
  * ([[Dedup.minhashNearDups]]) — character edit distance is the wrong
  * similarity at document length anyway.
  */
object EditDistance {

  /** All strings reachable from `s` by deleting at most `tau` characters
    * (tau ∈ {1, 2}), as an array column — computed in the scan stage with
    * higher-order array functions, no UDF.
    *
    * Delete-one at position i is substring(1..i) ++ substring(i+2..);
    * delete-two composes it for i < j. Duplicates (equal variants from
    * different positions — "aab" minus either 'a') collapse via
    * array_distinct before the explode, so bucket membership is unique
    * per (string, variant). */
  def deletionVariants(s: Column, tau: Int): Column = {
    require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")
    val n = length(s)
    // delete the (i+1)-th char (i is 0-based): prefix of i chars + suffix
    // from i+2 on. Column positions need Column.substr, not substring().
    def delAt(src: Column, i: Column): Column =
      concat(src.substr(lit(1), i), src.substr(i + 2, length(src)))
    val d0 = array(s)
    // guards: sequence(1, 0) DESCENDS in Spark, so empty/short strings
    // must short-circuit to an empty variant list, not enumerate [1, 0]
    val d1 = when(n >= 1, transform(sequence(lit(1), n), i => delAt(s, i - 1)))
      .otherwise(array().cast("array<string>"))
    val d2 =
      if (tau < 2) array().cast("array<string>")
      else coalesce(when(n >= 2, flatten(transform(sequence(lit(2), n), j =>
        // delete j-th (1-based) first, then any position strictly before
        // it in the shortened string — i < j covers each unordered pair once
        transform(sequence(lit(1), j - 1), i => delAt(delAt(s, j - 1), i - 1))))),
        array().cast("array<string>"))
    array_distinct(concat(d0, d1, d2))
  }

  /** Self-join: all distinct pairs (id_a < id_b) whose `strCol` values are
    * within edit distance `tau`, with the exact distance attached.
    * Output: (id_a, id_b, str_a, str_b, dist). */
  def edJoin(df: DataFrame, idCol: String, strCol: String, tau: Int,
      maxBucketSize: Int = 1000): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("v", explode(deletionVariants(col("s"), tau)))
    // one aggregate per variant bucket; the size cap and the pairwise
    // expansion both read the collected list, so the variant pipeline
    // runs once (a self-join formulation would execute it per side)
    val pairs = rows.groupBy("v")
      .agg(collect_list(struct(col("id"), col("s"))).as("members"))
      .filter(size(col("members")).between(2, maxBucketSize))
      .select(explode(expr(
        """filter(
          |  flatten(transform(members, a ->
          |    transform(members, b -> struct(a.id as id_a, b.id as id_b,
          |                                   a.s as str_a, b.s as str_b)))),
          |  p -> p.id_a < p.id_b)""".stripMargin)).as("p"))
      .select(col("p.*"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= tau)
  }

  /** Probe join: for each row of `queries`, all rows of `corpus` whose key
    * is within `tau` edits. Both sides explode their neighborhoods and
    * meet on the variant — per-bucket work is query-side × corpus-side
    * membership (cross-side only), never corpus². Output:
    * (query_id, corpus_id, query_s, corpus_s, dist). */
  def edJoinAgainst(corpus: DataFrame, queries: DataFrame, idCol: String,
      strCol: String, tau: Int, maxBucketSize: Int = 1000): DataFrame = {
    def side(df: DataFrame, idName: String, sName: String) =
      df.select(col(idCol).as(idName), col(strCol).as(sName))
        .withColumn("v", explode(deletionVariants(col(sName), tau)))
    val c = side(corpus, "corpus_id", "corpus_s")
      // cap the corpus side per variant BEFORE the join (hot-bucket guard)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("v").orderBy("corpus_id")))
      .filter(col("rn") <= maxBucketSize).drop("rn")
    val q = side(queries, "query_id", "query_s")
    q.join(c, Seq("v"))
      .select("query_id", "corpus_id", "query_s", "corpus_s").distinct()
      .withColumn("dist", levenshtein(col("query_s"), col("corpus_s")))
      .filter(col("dist") <= tau)
  }
}
