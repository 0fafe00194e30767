package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, trained distributed — the real version
  * of the n_tokens_bpe heuristic in [[TextAnalysis]].
  *
  * Training follows Sennrich et al. 2016 ("Neural Machine Translation of
  * Rare Words with Subword Units", public): BPE operates on the corpus'
  * WORD-FREQUENCY table, not raw text — so the only corpus-sized pass is
  * the initial word count (one shuffle on the word). At 100 TB that
  * dictionary is ~10^7 rows regardless of corpus size, and every merge
  * iteration is two narrow aggregations over it:
  *
  *   words(word, freq, syms) → explode adjacent pairs → groupBy pair,
  *   sum(freq) → argmax → apply the merge to syms
  *
  * The per-iteration argmax is a 2-row driver fetch (the merge decision),
  * not a data collect; symbol sequences are re-derived lazily with
  * localCheckpoint every few rounds (the connected-components lesson:
  * iterative plans must truncate lineage). Ties break lexicographically
  * so training is deterministic — same corpus, same vocab, any cluster.
  *
  * Encoding broadcasts the merge-rank table and applies the standard
  * lowest-rank-first merge loop per word (the public GPT-2/HF algorithm),
  * inside one mapPartitions pass — scan-stage, no shuffle.
  */
object Bpe {

  /** A trained tokenizer: merge list in training order. */
  final case class Model(merges: IndexedSeq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word (no whitespace) to subword tokens. */
    def encodeWord(word: String): Vector[String] = {
      if (word.isEmpty) return Vector.empty
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue; var bi = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; bi = i }
          i += 1
        }
        if (bi < 0) done = true
        else syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
      }
      syms
    }

    /** Tokenize whitespace-split lowercased text. */
    def encode(text: String): Vector[String] =
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .toVector.flatMap(encodeWord)
  }

  /** Train `numMerges` merges over `textCol` of `df`. The word-frequency
    * table is computed once (the only full-corpus shuffle) and cached;
    * each round mutates only the symbol sequences of words containing a
    * merged pair.
    *
    * Merges are taken in BATCHES of up to `batchSize` per driver
    * round-trip (classic batched BPE — a 32k-merge production vocab is
    * ~10^5 sequential Spark jobs otherwise, hours of scheduler latency
    * independent of data size), with a selection rule that keeps the
    * result EXACTLY equal to one-merge-at-a-time training:
    *
    *  1. Sort candidates by (count desc, pair lex) — sequential's order.
    *  2. Take the longest no-skip prefix of mutually symbol-disjoint
    *     pairs, stopping at the first candidate sharing a symbol with a
    *     taken pair (the "stopper").
    *  3. Keep only taken pairs whose count is STRICTLY greater than the
    *     stopper's count (the first pair is always kept — it is
    *     sequential's next merge by construction).
    *
    * Why this is exact: applying a merge only (a) decreases counts of
    * pairs sharing a symbol with it and (b) creates new pairs adjacent to
    * the merged token, each supported by a pre-existing pair that also
    * shares a symbol with it (every occurrence of (x, ab) was an
    * occurrence of (x, a)). The no-skip prefix guarantees every pair
    * ranked above the stopper is already taken, so any pair whose count
    * can change — and any new pair's supporting count — ranks at or below
    * the stopper. Kept pairs outrank the stopper strictly, so each is
    * still the global (count, lex) argmax when sequential training would
    * reach it. Disjointness makes the batch application order-free. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      batchSize: Int = 100, localDictMax: Long = 2000000L): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        // char-level start symbols; Spark's split(limit=-1) keeps the
        // trailing empty match of the zero-width pattern — drop it
        array_remove(split(col("w"), "(?!^)"), "").as("syms"))
      .as[(String, Long, Seq[String])]
      .localCheckpoint(true)

    // The dictionary is vocabulary-bound (~10^7 rows at 100 TB), so it
    // usually FITS on the driver even when the corpus never could — and
    // the merge loop is then pure local compute instead of one Spark job
    // pair per batch round (the scheduler overhead, not the data, is
    // what dominates distributed rounds on a small dict: symbol
    // disjointness caps real batches far below batchSize early on, so a
    // 2k-merge train is ~100+ rounds). This is the standard
    // word-dict-in-memory trainer; the distributed batched loop below
    // remains the >localDictMax fallback, and the spec pins both paths
    // merge-for-merge equal.
    if (words.count() <= localDictMax)
      return trainLocal(words.collect(), numMerges)

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - m)
      val fetch = 2 * want + 8
      // pair frequencies, weighted by word frequency
      val top = words.flatMap { case (_, f, syms) =>
        syms.iterator.zip(syms.iterator.drop(1)).map(p => (p, f))
      }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (n, a, b) }
        // deterministic: max count, then lexicographic (a, b)
        .orderBy(col("_1").desc, col("_2"), col("_3"))
        .limit(fetch).collect()
      // no-skip disjoint prefix (rule 2)
      val used = scala.collection.mutable.Set.empty[String]
      val taken = Vector.newBuilder[(Long, String, String)]
      var nTaken = 0
      var stopper: Option[Long] = None
      var i = 0
      while (stopper.isEmpty && i < top.length && nTaken < want) {
        val (c, a, b) = top(i)
        if (used(a) || used(b)) stopper = Some(c)
        else { taken += ((c, a, b)); used += a; used += b; nTaken += 1 }
        i += 1
      }
      // unexamined candidates (want hit, or a full fetch ran out) bound
      // the stopper at the next candidate's / last fetched count
      if (stopper.isEmpty && i < top.length) stopper = Some(top(i)._1)
      else if (stopper.isEmpty && top.length == fetch) stopper = Some(top.last._1)
      val batch = taken.result().zipWithIndex
        .filter { case ((c, _, _), idx) =>
          c >= 2 && (idx == 0 || stopper.forall(c > _))
        }
        .map { case ((_, a, b), _) => (a, b) }
      if (batch.isEmpty || top.isEmpty || top.head._1 < 2) exhausted = true
      else {
        merges ++= batch
        words = words.map { case (w, f, syms) =>
          (w, f, batch.foldLeft(syms)((s, p) => applyMerge(s, p._1, p._2)))
        }.localCheckpoint(true)
        m += batch.length
      }
    }
    Model(merges.result())
  }

  /** Driver-local sequential trainer over a collected word dict —
    * EXACTLY the one-merge-at-a-time definition (max count, lex
    * tie-break, stop below count 2), with the classic incremental
    * bookkeeping: a (pair → count) multiset, a (pair → words containing
    * it) index so a merge touches only affected words, and an ordered
    * view for O(log n) argmax. */
  private def trainLocal(dict: Array[(String, Long, Seq[String])],
      numMerges: Int): Model = {
    import scala.collection.mutable
    val freqs = dict.map(_._2)
    val syms = dict.map(_._3.toVector)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // ordered view: highest count first, then lexicographic pair
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering[Long].reverse, Ordering[String], Ordering[String])
    val queue = mutable.TreeSet.empty[(Long, String, String)]
    def bump(p: (String, String), delta: Long, wi: Int, add: Boolean): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) queue.remove((old, p._1, p._2))
      val nu = old + delta
      if (nu != 0L) { counts(p) = nu; queue.add((nu, p._1, p._2)) }
      else counts.remove(p)
      val set = where.getOrElseUpdate(p, mutable.Set.empty[Int])
      if (add) set += wi
    }
    def pairsOf(v: Vector[String]): Iterator[(String, String)] =
      v.iterator.zip(v.iterator.drop(1))
    var wi = 0
    while (wi < syms.length) {
      pairsOf(syms(wi)).foreach(p => bump(p, freqs(wi), wi, add = true))
      wi += 1
    }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      queue.headOption match {
        case Some((c, a, b)) if c >= 2 =>
          merges += ((a, b))
          val touched = where.getOrElse((a, b), mutable.Set.empty[Int]).toArray
          // Net deltas batched per pair for the whole merge, then applied
          // to the ordered queue once per DISTINCT pair: the touched set
          // can span ~10% of the dictionary (hex-ish corpora) and paying
          // two TreeSet operations per pair OCCURRENCE made the queue the
          // trainer's dominant cost (~62 bumps/word vs ~10^2 distinct
          // changed pairs/merge).
          val delta = mutable.HashMap.empty[(String, String), Long]
          touched.foreach { i =>
            val old = syms(i)
            val nu = applyMerge(old, a, b).toVector
            if (nu != old) {
              pairsOf(old).foreach(p =>
                delta.update(p, delta.getOrElse(p, 0L) - freqs(i)))
              syms(i) = nu
              pairsOf(nu).foreach { p =>
                delta.update(p, delta.getOrElse(p, 0L) + freqs(i))
                where.getOrElseUpdate(p, mutable.Set.empty[Int]) += i
              }
            }
          }
          delta.foreach { case (p, d) =>
            if (d != 0L) {
              val old = counts.getOrElse(p, 0L)
              if (old != 0L) queue.remove((old, p._1, p._2))
              val nu = old + d
              if (nu != 0L) { counts(p) = nu; queue.add((nu, p._1, p._2)) }
              else counts.remove(p)
            }
          }
          // the merged pair's surviving index entries are stale by now
          where.remove((a, b))
          m += 1
        case _ => done = true
      }
    }
    Model(merges.result())
  }

  private def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize a corpus with a trained model: one broadcast of the merge
    * ranks, one scan-stage pass; emits (idCol, tokens, n_tokens). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val mdl = bc.value
        // Word-level memo: encodeWord is a quadratic merge loop, and word
        // occurrences are Zipfian — at 10M docs the same few hundred
        // thousand distinct words are encoded billions of times. The cache
        // is per-partition (no cross-task state), bounded, and flushed
        // wholesale when full: computeIfAbsent on a plain HashMap keeps
        // the hit path allocation-free, and encode semantics are untouched
        // (encodeWord is pure).
        val cap = 1 << 17
        val cache = new java.util.HashMap[String, Vector[String]](cap * 2)
        val fn = new java.util.function.Function[String, Vector[String]] {
          def apply(w: String): Vector[String] = mdl.encodeWord(w)
        }
        it.map { case (id, text) =>
          val words = text.trim.toLowerCase.split("\\s+")
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < words.length) {
            val w = words(i)
            if (w.nonEmpty) {
              if (cache.size >= cap) cache.clear()
              b ++= cache.computeIfAbsent(w, fn)
            }
            i += 1
          }
          val toks = b.result()
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Persist a trained model as a (rank, left, right) parquet table —
    * train once, reuse across the nightly jobs that tokenize with it
    * (the merge list IS the model; ranks rebuild from row order). */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]; merge order restores from the
    * rank column, so `load(save(m)) == m` exactly (spec-pinned). */
  def load(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    Model(spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)]
      .collect().sortBy(_._1).toIndexedSeq.map { case (_, a, b) => (a, b) })
  }
}
