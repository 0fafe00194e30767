package graft

import org.apache.spark.sql.functions._
import graft.text.{Bm25, TextAnalysis}
import graft.pack.Packing

/** BM25 retrieval, markup stripping, and token-budget shard assignment on
  * hand-built inputs with by-eye expected answers. */
class RetrievalShardSpec extends GraftSpec {
  import spark.implicits._

  // --- BM25 ---

  private lazy val docs = Seq(
    (1L, "apple banana apple"),        // dl 3, tf(apple)=2
    (2L, "apple cherry"),              // dl 2
    (3L, "banana banana banana kiwi"), // dl 4
    (4L, "durian melon fig"),          // no query term
    (5L, "apple")).toDF("doc_id", "text")

  test("bm25 ranks exact math: rarer terms and denser docs score higher") {
    val q = Seq((0L, "apple"), (1L, "banana kiwi")).toDF("qid", "qt")
    val got = Bm25.topK(docs, "doc_id", "text", q, "qid", "qt", k = 10)
      .select("query_id", "rnk", "doc_id", "score")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toList).toMap

    // recompute by hand: N=5, avgdl = (3+2+4+3+1)/5 = 2.6
    val N = 5.0; val avgdl = 2.6; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log((N - df + 0.5) / (df + 0.5) + 1)
    def w(tf: Double, dl: Double, df: Double) =
      BigDecimal(idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // query 0 "apple": df=3; docs 1 (tf2,dl3), 2 (tf1,dl2), 5 (tf1,dl1)
    val q0 = Map(1L -> w(2, 3, 3), 2L -> w(1, 2, 3), 5L -> w(1, 1, 3))
    assert(got(0L).toMap == q0)
    assert(got(0L).map(_._1) ==
      q0.toList.sortBy { case (id, s) => (-s, id) }.map(_._1))
    // query 1 "banana kiwi": banana df=2, kiwi df=1; doc 3 matches both
    val q1 = Map(1L -> w(1, 3, 2), 3L -> (w(3, 4, 2) + w(1, 4, 1)))
    assert(got(1L).map(_._1).toSet == q1.keySet)
    val d3 = got(1L).toMap.apply(3L)
    assert(math.abs(d3 - q1(3L)) < 2e-6) // two rounded contribs vs one rounded sum
    assert(got(1L).head._1 == 3L) // both-terms doc on top
  }

  test("bm25 k caps per-query results and ties break by doc id") {
    val q = Seq((0L, "apple")).toDF("qid", "qt")
    val top2 = Bm25.topK(docs, "doc_id", "text", q, "qid", "qt", k = 2)
    assert(top2.count() == 2)
    // identical docs score identically -> id ascending order
    val clones = Seq((10L, "pear"), (11L, "pear"), (12L, "pear"))
      .toDF("doc_id", "text")
    val tied = Bm25.topK(clones, "doc_id", "text",
      Seq((0L, "pear")).toDF("qid", "qt"), "qid", "qt", k = 3)
      .select("doc_id").as[Long].collect().toList
    assert(tied == List(10L, 11L, 12L))
  }

  // --- markup strip ---

  test("stripMarkup drops script/style/comments, spaces tags, decodes entities last") {
    val in = Seq(
      ("<html><script>var a = 1 < 2;</script><style>p{}</style>" +
        "<body><h1>Title</h1><!-- secret --><p>Hello</p>world</body></html>",
        "Title Hello world"),
      ("a</p><p>b", "a b"),                      // tag becomes a word boundary
      ("x &amp;lt; y &nbsp; &quot;z&#39;", "x &lt; y \"z'"), // amp decoded LAST
      ("<SCRIPT>upper</SCRIPT>ok <Style x=1>s</stylE >ok2", "ok ok2"), // case-insensitive
      ("no markup at all", "no markup at all"),
      ("  spaced   <b>out</b>  ", "spaced out"))
      .toDF("text", "expect")
    val out = TextAnalysis.stripMarkup(in, "text")
      .select("text_plain", "expect").as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got == want, s"got '$got'") }
  }

  // --- dataset profile ---

  test("profile counts nulls and distincts per column, native-typed min/max") {
    val in = Seq((1L, Some(2.5), "b"), (2L, None, "a"), (3L, Some(10.0), "a"))
      .toDF("id", "x", "s")
    val got = graft.api.Profile.describe(in, Seq("id", "x", "s"),
      exactDistinct = true)
      .orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect().toList
    assert(got == List(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 0L, 2L, "a", "b"),
      // numeric min/max (2.5 < 10.0), not string order ("10.0" < "2.5")
      ("x", 3L, 1L, 2L, "2.5", "10.0")))
  }

  // --- URL parsing + per-domain cap ---

  test("withUrlParts extracts host/path/query and the two-label domain") {
    val in = Seq(
      "https://a.b.example.com/x/y?id=7",
      "http://example.com/",
      "https://localhost/p",
      "https://cdn.site.co/f.js").toDF("url")
    val got = graft.text.Urls.withUrlParts(in, "url")
      .select("url_host", "url_path", "url_query", "url_domain")
      .as[(String, String, Option[String], String)].collect().toList
    assert(got(0) == (("a.b.example.com", "/x/y", Some("id=7"), "example.com")))
    assert(got(1) == (("example.com", "/", None, "example.com")))
    assert(got(2) == (("localhost", "/p", None, "localhost")))
    assert(got(3) == (("cdn.site.co", "/f.js", None, "site.co")))
  }

  test("capPerDomain keeps at most n per domain, deterministically") {
    val docs = (0L until 90L)
      .map(i => (i, s"https://w.dom${i % 3}.com/p/$i")).toDF("doc_id", "url")
    val capped = graft.text.Urls.capPerDomain(docs, "url", "doc_id", n = 5)
    val perDom = capped.groupBy("url_domain").count()
      .as[(String, Long)].collect().toMap
    assert(perDom.values.toSet == Set(5L) && perDom.size == 3)
    // rerun yields the identical kept set (no RNG state)
    val again = graft.text.Urls.capPerDomain(docs, "url", "doc_id", n = 5)
    assert(capped.select("doc_id").as[Long].collect().sorted.toList ==
      again.select("doc_id").as[Long].collect().sorted.toList)
  }

  test("threshold per-key cap is the window per-key cap, wide rows unshuffled") {
    import graft.api.Sampling
    // hot key (60 rows), exactly-at-cap key (5), under-cap key (2), and a
    // null key group — every branch of the threshold join
    val rows = (0L until 60L).map(i => (i, Option("hot"))) ++
      (100L until 105L).map(i => (i, Option("atcap"))) ++
      Seq((200L, Option("cold")), (201L, Option("cold")),
        (300L, None: Option[String]), (301L, None), (302L, None),
        (303L, None), (304L, None), (305L, None), (306L, None))
    val df = rows.toDF("id", "k").withColumn("wide",
      concat(lit("x" * 64), col("id").cast("string")))
    val byWindow = Sampling.fixedSizePerKey(df, 5, col("k"), col("id"))
      .select("id").as[Long].collect().sorted.toList
    val byThr = Sampling.fixedSizePerKeyByThreshold(df, 5, col("k"), col("id"))
    assert(byThr.columns.toList == List("id", "k", "wide")) // helpers dropped
    assert(byThr.select("id").as[Long].collect().sorted.toList == byWindow)
    // the wide column reaches no exchange: every Exchange subtree in the
    // physical plan carries only the narrow projection (unwrap the AQE
    // root — its collect does not descend into the input plan)
    val plan = byThr.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan // post-EnsureRequirements, pre-execution
      case p => p
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.child.output.map(_.name).contains("wide"),
        s"wide rows must not shuffle: ${e.child.output.map(_.name)}") }
  }

  // --- token-budget shards ---

  private lazy val corpus = (0L until 400L)
    .map(i => (i, 1L + i % 7)).toDF("doc_id", "ntok")

  test("shard assignment is the exclusive-prefix cut of the md5 order") {
    val got = Packing.shardByTokenBudget(corpus, "doc_id", "ntok", budget = 50L)
      .select("doc_id", "ntok", "shard")
      .as[(Long, Long, Long)].collect()
    // independent reference: a straight driver-side scan in hash order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"shard:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val inOrder = (0L until 400L).map(i => (h(i), i, 1L + i % 7)).sorted
    var cum = 0L
    val expect = inOrder.map { case (_, id, t) =>
      val s = cum / 50L; cum += t; (id, t, s)
    }.map { case (id, t, sh) => id -> ((t, sh)) }.toMap
    assert(got.length == 400)
    got.foreach { case (id, t, sh) =>
      assert((t, sh) == expect(id), s"doc $id") }
  }

  test("shards are contiguous in hash order with bounded token totals") {
    val out = Packing.shardByTokenBudget(corpus, "doc_id", "ntok", budget = 50L)
    val totals = out.groupBy("shard").agg(sum("ntok").as("tot"), max("ntok").as("mx"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val last = totals.map(_._1).max
    totals.foreach { case (sh, tot, mx) =>
      assert(tot <= 50L + mx - 1, s"shard $sh overfull: $tot")
      if (sh != last) assert(tot >= 50L - (mx - 1), s"shard $sh underfull: $tot")
    }
    // shard ids form a gapless 0..last range
    assert(totals.map(_._1).toList == (0L to last).toList)
    // bucketing granularity does not change the layout
    val fine = Packing.shardByTokenBudget(corpus, "doc_id", "ntok",
      budget = 50L, bucketHexChars = 3)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val coarse = out.select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(fine == coarse)
  }

  // --- reciprocal-rank fusion ---

  private def rrf6(terms: Double*): Double =
    BigDecimal(terms.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rrfFuse matches the hand-computed RRF sum and order") {
    val lex = Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L))
      .toDF("query_id", "rnk", "doc_id")
    val sem = Seq((0L, 1, 3L), (0L, 2, 1L))
      .toDF("query_id", "rnk", "doc_id")
    val got = graft.similarity.Hybrid.rrfFuse(Seq(lex, sem), k = 10)
      .select("query_id", "rnk", "doc_id", "rrf_score")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toList
    // doc1: 1/61 + 1/62; doc3: 1/63 + 1/61; doc2: 1/62 only
    val exp = List(
      (0L, 1, 1L, rrf6(1.0 / 61, 1.0 / 62)),
      (0L, 2, 3L, rrf6(1.0 / 63, 1.0 / 61)),
      (0L, 3, 2L, rrf6(1.0 / 62)))
    assert(got == exp)
  }

  test("rrfFuse weights shift the fused order") {
    val lex = Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L))
      .toDF("query_id", "rnk", "doc_id")
    val sem = Seq((0L, 1, 3L), (0L, 2, 1L))
      .toDF("query_id", "rnk", "doc_id")
    // doubling the semantic weight flips doc3 (sem rank 1) above doc1:
    // doc3 = 1/63 + 2/61 = .048660 > doc1 = 1/61 + 2/62 = .048651
    val got = graft.similarity.Hybrid
      .rrfFuse(Seq(lex, sem), k = 2, weights = Seq(1.0, 2.0))
      .select("rnk", "doc_id").as[(Int, Long)].collect().sortBy(_._1).toList
    assert(got == List((1, 3L), (2, 1L)))
  }

  test("mmrRerank demotes a redundant near-duplicate below a diverse doc") {
    // doc2 is nearly collinear with doc1 (cos≈1) but almost as relevant;
    // doc3 is orthogonal. Pure relevance would rank 1,2,3,4 — MMR must
    // pull the diverse doc3 up to step 2 and push the redundant doc2 down.
    val cand = Seq(
      (0L, 1L, 0.9, Seq(1.0, 0.0)),
      (0L, 2L, 0.89, Seq(1.0, 0.001)),
      (0L, 3L, 0.5, Seq(0.0, 1.0)),
      (0L, 4L, 0.4, Seq(1.0, 1.0)))
      .toDF("query_id", "doc_id", "rel", "vec")
    val got = graft.similarity.Hybrid.mmrRerank(cand, k = 4, lambda = 0.7)
      .select("query_id", "rnk", "doc_id", "mmr_score")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toList
    // hand-replay: cos(2,1) rounds to 1.0, cos(3,1)=0, cos(2,3)≈0.001,
    // cos(4,1)=cos(4,3)=.7071, cos(4,2)=.7078 (all at 4 decimals)
    val exp = List(
      (0L, 1, 1L, rrf6(0.7 * 0.9)),
      (0L, 2, 3L, rrf6(0.7 * 0.5)),
      (0L, 3, 2L, rrf6(0.7 * 0.89 - 0.3 * 1.0)),
      (0L, 4, 4L, rrf6(0.7 * 0.4 - 0.3 * 0.7078)))
    assert(got == exp)
  }

  // --- DSIR importance resampling ---

  test("dsir log-weights favor target-like docs; selection is deterministic") {
    val target = (100L until 120L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "beta gamma delta alpha"),
      (4L, "zeta eta theta iota"), (5L, "zeta eta theta iota"),
      (6L, "theta iota zeta eta")).toDF("doc_id", "text")
    val out = graft.text.Dsir.resample(raw, target, "doc_id", "text", n = 6)
      .select("doc_id", "log_w").as[(Long, Double)].collect().toMap
    assert(out.size == 6)
    val targetLike = Seq(1L, 2L, 3L).map(out)
    val offTarget = Seq(4L, 5L, 6L).map(out)
    // every target-like doc outweighs every off-target doc
    assert(targetLike.min > offTarget.max, s"$out")
    // the Gumbel draw is a hash, not RNG state: identical on re-run
    val again = graft.text.Dsir.resample(raw, target, "doc_id", "text", n = 3)
      .select("doc_id", "gumbel_key").as[(Long, Double)].collect().toList
    val third = graft.text.Dsir.resample(raw, target, "doc_id", "text", n = 3)
      .select("doc_id", "gumbel_key").as[(Long, Double)].collect().toList
    assert(again == third && again.size == 3)
  }

  test("native repetition kernel is bit-equal to the declarative formula") {
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val edges = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "\t"), (9004L, "one"),
      (9005L, "a a a a a"), (9006L, "a b a b a b"), (9007L, "x y z x y z x y"),
      (9008L, "  leading and trailing  "), (9009L, "tab\tseparated\ttokens\t"),
      (9010L, "Mixed CASE mixed case MIXED case"),
      (9011L, "a\nb\r\ncd\fe"), (9012L, "ünïcode tökens ünïcode tökens"))
      .toDF("doc_id", "text")
    val in = real.unionByName(edges)
    val native = TextAnalysis.withRepetitionFeatures(in, "text")
      .select("doc_id", "n_bigrams", "dup_bigram_ratio", "dup_trigram_ratio")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    val decl = TextAnalysis.withRepetitionFeaturesDeclarative(in, "text")
      .select("doc_id", "n_bigrams", "dup_bigram_ratio", "dup_trigram_ratio")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    assert(native == decl)
  }

  test("writeShards lays out one directory per shard and loses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val sharded = Packing.shardByTokenBudget(corpus, "doc_id", "ntok", budget = 100L)
    Packing.writeShards(sharded, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    assert(back.select("doc_id").distinct().count() == 400)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.nonEmpty && dirs.length ==
      sharded.select("shard").distinct().count())
  }
}
