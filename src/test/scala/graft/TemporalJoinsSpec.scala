package graft

import org.apache.spark.sql.functions._
import graft.api.TemporalJoins
import graft.text.{NgramLm, TextAnalysis}
import graft.dedup.DupClusters

/** As-of/range joins and the round-6 text operators (chunking, NFC,
  * n-gram LM scoring, leakage-safe split) on hand-built inputs where the
  * expected answers are computed by eye. */
class TemporalJoinsSpec extends GraftSpec {
  import spark.implicits._

  // numeric ts (the operators accept TIMESTAMP or numeric — cast("double"))
  private lazy val quotes = Seq( // (key, ts, px)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 5.0))
    .toDF("sym", "qts", "px")
  private lazy val trades = Seq( // (key, ts, id)
    ("a", 5L, 1), ("a", 10L, 2), ("a", 25L, 3), ("a", 99L, 4),
    ("b", 14L, 5), ("c", 50L, 6))
    .toDF("sym", "tts", "trade_id")

  test("asof backward takes the latest prior-or-equal right row per key") {
    val out = TemporalJoins.asof(trades, quotes, "sym", "tts", "qts",
      Seq("px"), direction = "backward")
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty)        // ts 5: no quote yet
    assert(out(2).contains(1.0))  // ts 10: equal-ts quote matches (inclusive)
    assert(out(3).contains(2.0))  // ts 25: quote@20, not 30
    assert(out(4).contains(3.0))  // ts 99: last quote carries forward
    assert(out(5).isEmpty)        // b@14 precedes b's only quote@15
    assert(out(6).isEmpty)        // key with no right rows at all
  }

  test("asof forward takes the earliest following row; tolerance nulls far matches") {
    val out = TemporalJoins.asof(trades, quotes, "sym", "tts", "qts",
      Seq("px"), direction = "forward")
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toMap
    assert(out(1).contains(1.0)) // ts 5 -> quote@10
    assert(out(2).contains(1.0)) // equal ts inclusive
    assert(out(3).contains(3.0)) // ts 25 -> quote@30
    assert(out(4).isEmpty)       // nothing after 99
    assert(out(5).contains(5.0)) // b@14 -> b quote@15
    val tol = TemporalJoins.asof(trades, quotes, "sym", "tts", "qts",
      Seq("px"), direction = "forward", toleranceSec = Some(3.0))
      .select("trade_id", "px").as[(Int, Option[Double])].collect().toMap
    assert(tol(1).isEmpty)       // gap 5 > tolerance 3
    assert(tol(5).contains(5.0)) // gap 1 <= 3
  }

  test("asof matches a right row whose payload VALUE is null") {
    val r = Seq(("a", 10L, Option.empty[Double])).toDF("sym", "qts", "px")
    val l = Seq(("a", 20L, 1)).toDF("sym", "tts", "trade_id")
    val out = TemporalJoins.asof(l, r, "sym", "tts", "qts", Seq("px"))
      .select("asof_ts").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(10.0))) // matched (asof_ts set) despite null px
  }

  test("range join emits each qualifying pair once, with half-open bounds") {
    val points = Seq(("a", 10L, 1), ("a", 20L, 2), ("a", 29L, 3),
      ("a", 30L, 4), ("b", 10L, 5))
      .toDF("k", "pt", "pid")
    // interval [10, 30) spanning several 7-wide cells
    val ivals = Seq(("a", 10L, 30L, 100)).toDF("k", "lo", "hi", "iid")
    val out = TemporalJoins.rangeJoin(points, ivals, "k", "pt", "lo", "hi",
      bucketSec = 7L)
      .select("pid", "iid").as[(Int, Int)].collect().toSeq
    assert(out.sorted == Seq((1, 100), (2, 100), (3, 100))) // 30 excluded, b never joins
    val incl = TemporalJoins.rangeJoin(points, ivals, "k", "pt", "lo", "hi",
      bucketSec = 7L, hiInclusive = true)
      .select("pid").as[Int].collect().toSeq
    assert(incl.sorted == Seq(1, 2, 3, 4))
  }

  test("chunkWithOverlap tiles every character with the exact overlap") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text") // len 10
    val out = TextAnalysis.chunkWithOverlap(df, "text", size = 4, overlap = 2)
      .select("chunk_id", "chunk").as[(Int, String)].collect().toSeq.sortBy(_._1)
    // stride 2: ceil(max(10-2,1)/2) = 4 chunks
    assert(out == Seq((0, "abcd"), (1, "cdef"), (2, "efgh"), (3, "ghij")))
    val short = TextAnalysis.chunkWithOverlap(Seq((1L, "ab")).toDF("id", "text"),
      "text", size = 4, overlap = 2)
      .select("chunk").as[String].collect().toSeq
    assert(short == Seq("ab")) // single short chunk, no phantom rows
  }

  test("normalizeUnicode composes combining sequences and collapses whitespace") {
    val df = Seq((1L, "café   x")).toDF("id", "text")
    val out = TextAnalysis.normalizeUnicode(df, "text")
      .select("text_nfc").as[String].head()
    assert(out == "café x")
    assert(out.length == 6)
  }

  test("ngram LM: bigram max-likelihood with stupid backoff to unigrams") {
    // corpus: "a b", "a b", "a c" -> c(a)=3 c(b)=2 c(c)=1 N=6
    // bigrams (minCount 2): only (a,b)x2 survives; (a,c) backs off
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(docs, "text", minBigramCount = 2L)
    assert(model.total == 6L)
    val out = NgramLm.score(docs, "doc_id", "text", model)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    val pAB = math.log10(2.0 / 3.0)               // seen bigram: c(ab)/c(a)
    val pAC = math.log10(0.4) + math.log10(1.0 / 6.0) // backoff: a*c(c)/N
    assert(math.abs(out(0L) - pAB) < 1e-6)
    assert(math.abs(out(2L) - pAC) < 1e-6)
  }

  test("leakage-safe split puts connected near-dups on the same side") {
    val docs = (0L to 99L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 0-1-2 must move together; 50-51 too
    val pairs = Seq((0L, 1L), (1L, 2L), (50L, 51L)).toDF("id_a", "id_b")
    val out = DupClusters.leakageSafeSplit(docs, "doc_id", pairs,
      "id_a", "id_b", trainFrac = 0.5)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(Seq(0L, 1L, 2L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(0L, 1L, 2L).map(byId(_)._2).distinct == Seq(0L))
    assert(Seq(50L, 51L).map(byId(_)._3).distinct.size == 1)
    assert(out.length == 100)
    val trainN = out.count(_._3 == "train")
    assert(trainN > 20 && trainN < 80) // ~half, hash-balanced
  }
}
