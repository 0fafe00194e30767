package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DupClusters}
import graft.multimodal.Multimodal
import graft.pack.Packing
import graft.similarity.Similarity
import graft.text.TextAnalysis

class TrainingDataSpec extends GraftSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (1L, "the quick brown fox jumps over the lazy dog and runs away quickly"), // near-dup of 0
    (2L, "completely different content about database query optimization engines"),
    (3L, "the quick brown fox jumps over the lazy dog and runs away fast"), // exact dup of 0
    (4L, "der hund und die katze sind das beste team und der freund")) // German markers
    .toDF("doc_id", "text")

  test("exact dedup groups identical normalized docs") {
    val out = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = out.filter(col("n_dups") === 2).select("kept_id").as[Long].collect()
    assert(dupGroup.toSeq == Seq(0L)) // 0 and 3 collapse, min id kept
    assert(out.count() == 4)
  }

  test("bloom-prefiltered exact incremental dedup equals the plain anti-join") {
    val corpus = (0L until 300L).map(i => (i, s"corpus doc number $i body"))
      .toDF("doc_id", "text")
    // increment: 40 fresh docs + 25 exact dups of corpus docs (new ids) +
    // one whitespace-variant dup (normalization must still catch it)
    val incr = ((1000L until 1040L).map(i => (i, s"incr doc number $i body")) ++
      (0L until 25L).map(i => (2000L + i, s"corpus doc number $i body")) :+
      (3000L, "  corpus   doc number 30\tbody ")).toDF("doc_id", "text")
    val expected = incr.join(
      corpus.select(lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t")),
      lower(trim(regexp_replace(incr("text"), "\\s+", " "))) === col("t"),
      "left_anti").select("doc_id").as[Long].collect().toSet
    assert(expected.size == 40) // all dups (incl. the whitespace variant) drop
    // default fpp, and fpp=0.9 (floods the confirm path with false
    // positives) — the result must be EXACT either way
    for (fpp <- Seq(0.01, 0.9)) {
      val got = Dedup.exactAgainstBloom(incr, corpus, "doc_id", "text",
        fpp = fpp).select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"fpp=$fpp")
    }
    // schema passes through unchanged (no helper columns leak)
    assert(Dedup.exactAgainstBloom(incr, corpus, "doc_id", "text")
      .columns.toSeq == Seq("doc_id", "text"))
  }

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5,
      numHashes = 60, bands = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dups are trivially near-dups
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L }) // the outlier pairs with nothing
  }

  test("connected components resolve transitive duplicate chains") {
    // two components: a 4-chain {1,2,3,4} and a pair {10,11}; edge order
    // and direction deliberately scrambled
    val edges = Seq((2L, 1L), (3L, 4L), (2L, 3L), (11L, 10L))
      .toDF("id_a", "id_b")
    val labels = DupClusters.connectedComponents(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components converge on a long chain (log-round fixpoint)") {
    // a 64-node path — diameter 63; large-star/small-star must converge
    // well inside the 50-round cap where naive propagation would need 63
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DupClusters.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(labels.length == 64 && labels.forall(_._2 == 0L))
  }

  test("canonical dedup keeps one doc per cluster plus all unpaired docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5,
      numHashes = 60, bands = 20).select("id_a", "id_b")
    val kept = DupClusters.dedupKeepCanonical(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    // {0,1,3} form one cluster (0 kept); 2 and 4 are unpaired
    assert(kept == Set(0L, 2L, 4L))
  }

  test("incremental dedup surfaces only cross-side pairs") {
    val newSide = docs.filter($"doc_id".isin(1L, 2L)) // 1 is a near-dup of 0
    val corpus = docs.filter(!$"doc_id".isin(1L, 2L))
    val pairs = Dedup.minhashNearDupsAgainst(newSide, corpus, "doc_id", "text",
      threshold = 0.5, numHashes = 60, bands = 20)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 0L), (1L, 3L))) // 1 matches 0 and its exact dup 3
  }

  test("appending to a band index equals rebuilding it from the union") {
    // the index-maintenance law: fold docs {3,4} into an index over {0,2},
    // probe with doc 1 (near-dup of 0 and of 3) — appended and rebuilt
    // indexes must answer identically
    val corpus = docs.filter($"doc_id".isin(0L, 2L))
    val late = docs.filter($"doc_id".isin(3L, 4L))
    val probe = docs.filter($"doc_id" === 1L)
    val appended = Dedup.appendToBandIndex(
      Dedup.buildBandIndex(corpus, "doc_id", "text", numHashes = 60, bands = 20),
      late, "doc_id", "text")
    val rebuilt = Dedup.buildBandIndex(corpus.unionByName(late), "doc_id", "text",
      numHashes = 60, bands = 20)
    def pairs(ix: Dedup.BandIndex) =
      Dedup.minhashNearDupsAgainstIndex(probe, ix, "doc_id", "text", threshold = 0.5)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    val a = pairs(appended)
    assert(a == pairs(rebuilt))
    assert(a == Set((1L, 0L), (1L, 3L)))
  }

  test("band index and bpe model survive a save/load round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-persist").toFile
    try {
      // band index: loaded index answers identically to the in-memory one
      val corpus = docs.filter($"doc_id".isin(0L, 2L, 3L, 4L))
      val probe = docs.filter($"doc_id" === 1L)
      val built = Dedup.buildBandIndex(corpus, "doc_id", "text",
        numHashes = 60, bands = 20)
      Dedup.saveBandIndex(built, s"${dir.getAbsolutePath}/bindex")
      val loaded = Dedup.loadBandIndex(spark, s"${dir.getAbsolutePath}/bindex")
      assert((loaded.shingleN, loaded.numHashes, loaded.nBands) ==
        (built.shingleN, built.numHashes, built.nBands))
      def pairs(ix: Dedup.BandIndex) =
        Dedup.minhashNearDupsAgainstIndex(probe, ix, "doc_id", "text",
          threshold = 0.5)
          .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(pairs(loaded) == pairs(built) && pairs(loaded).nonEmpty)

      // bpe model: merge list round-trips exactly, so tokenization does too
      import graft.text.Bpe
      val model = Bpe.train(docs, "text", numMerges = 40)
      Bpe.save(spark, model, s"${dir.getAbsolutePath}/bpe")
      val reloaded = Bpe.load(spark, s"${dir.getAbsolutePath}/bpe")
      assert(reloaded == model)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("bpe training reproduces the canonical merge order; encoding is lossless") {
    import graft.text.Bpe
    // Sennrich et al.'s worked example: low×5 lower×2 newest×6 widest×3
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val model = Bpe.train(corpus, "text", numMerges = 4)
    // es (9, beats st on the lexicographic tie), est (9), lo (7), low (7)
    assert(model.merges == Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(model.encodeWord("lowest") == Vector("low", "est"))
    assert(model.encodeWord("newest") == Vector("n", "e", "w", "est"))
    // unseen characters degrade to singles, reconstruction always holds
    val toks = model.encode("Lowest LOWER zq")
    assert(toks.mkString == "lowestlowerzq")
  }

  test("batched bpe training equals one-merge-at-a-time training exactly") {
    import graft.text.Bpe
    // the equivalence claim behind batchSize: the no-skip disjoint prefix
    // + strictly-above-stopper rule must reproduce sequential training
    // merge-for-merge on a real corpus, not just the Sennrich example
    // (localDictMax = 0 forces the distributed path for both)
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val sequential = Bpe.train(real, "text", numMerges = 60, batchSize = 1,
      localDictMax = 0L)
    val batched = Bpe.train(real, "text", numMerges = 60, batchSize = 100,
      localDictMax = 0L)
    assert(sequential.merges.size == 60)
    assert(batched.merges == sequential.merges)
  }

  test("driver-local bpe training equals the distributed path merge-for-merge") {
    import graft.text.Bpe
    // the dict-fits-on-driver fast path (the default for vocabulary-bound
    // dicts) must be indistinguishable from distributed training — same
    // merges, same order, same early exhaustion behavior
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val local = Bpe.train(real, "text", numMerges = 60) // dict ≪ localDictMax
    val dist = Bpe.train(real, "text", numMerges = 60, localDictMax = 0L)
    assert(local.merges.size == 60 && local.merges == dist.merges)
    // canonical Sennrich example through the local path
    val corpus = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    assert(Bpe.train(corpus, "text", numMerges = 4).merges ==
      Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("bpe tokenize is a broadcast scan pass with exact token counts") {
    import graft.text.Bpe
    val df = Seq((1L, "low low lowest"), (2L, "widest")).toDF("doc_id", "text")
    val model = Bpe.train(df, "text", numMerges = 4)
    val out = Bpe.tokenize(df, "doc_id", "text", model)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out(1L) == model.encode("low low lowest").length.toLong)
    assert(out(2L) == model.encode("widest").length.toLong)
  }

  test("zorder clustering shrinks per-partition bounding boxes in both dims") {
    import graft.api.Layout
    // 64x64 grid in x-major id order: id-range partitioning gives tight x
    // but FULL-width y ranges; z-order must be compact in both
    val grid = spark.range(4096)
      .select(col("id"), (col("id") / 64).cast("long").as("x"),
        (col("id") % 64).as("y"))
    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"))
        .agg(avg("xr"), avg("yr")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (_, naiveY) = avgRanges(grid.repartitionByRange(16, col("id")))
    assert(naiveY == 63.0) // id order: every partition spans all of y
    val (zx, zy) = avgRanges(Layout.zorder(grid, "x", "y", numFiles = 16, bits = 6))
    assert(zx < 40 && zy < 40, s"z-order boxes not compact: x=$zx y=$zy")
    // curve math sanity: (x=3, y=5): 0b11 interleaved with 0b101 = 0b100111
    val z = grid.sparkSession.range(1)
      .select(Layout.zValue(lit(3), lit(5), 3).as("z")).head().getLong(0)
    assert(z == 0x27L)
  }

  test("pii redaction scrubs and counts every planted identifier") {
    val df = Seq((1L,
      "reach me at bob.smith+x@corp.io or 192.168.0.1 call 555-123-4567 ssn 123-45-6789 end"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.redactPii(TextAnalysis.withPiiCounts(df, "text"), "text")
      .select("text_redacted", "n_email", "n_ipv4", "n_ssn", "n_phone").head()
    assert(row.getString(0) ==
      "reach me at <EMAIL> or <IP> call <PHONE> ssn <SSN> end")
    assert((1 to 4).map(row.getLong) == Seq(1L, 1L, 1L, 1L))
  }

  private lazy val packDocs = Seq(
    (1L, 4L), (2L, 5L), (3L, 7L), (4L, 3L), (5L, 10L), (6L, 2L))
    .toDF("doc_id", "tok")

  test("concat-and-chunk packing tiles sequences exactly") {
    val out = Packing.concatAndChunk(packDocs, "doc_id", "tok", budget = 10L, streams = 1)
      .select("doc_id", "seq_id", "doc_from", "seq_from", "piece_len")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, 0L, 4L), (2L, 0L, 0L, 4L, 5L),
      (3L, 0L, 0L, 9L, 1L), (3L, 1L, 1L, 0L, 6L),
      (4L, 1L, 0L, 6L, 3L),
      (5L, 1L, 0L, 9L, 1L), (5L, 2L, 1L, 0L, 9L),
      (6L, 2L, 0L, 9L, 1L), (6L, 3L, 1L, 0L, 1L)))
    // invariant: every token lands exactly once
    val covered = Packing.concatAndChunk(packDocs, "doc_id", "tok", 10L, 1)
      .groupBy("doc_id").agg(sum("piece_len").as("n"))
      .join(packDocs, "doc_id").filter(col("n") =!= col("tok")).count()
    assert(covered == 0)
  }

  test("greedy packing never splits a doc and respects the budget") {
    val out = Packing.greedyPack(packDocs, "doc_id", "tok", budget = 10L, streams = 1)
      .select("doc_id", "seq_no", "offset")
      .as[(Long, Long, Long)].collect().toSet
    // 4+5 fill seq0; 7+3 exactly fill seq1; the 10-tok doc takes seq2; 2 opens seq3
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 4L), (3L, 1L, 0L),
      (4L, 1L, 7L), (5L, 2L, 0L), (6L, 3L, 0L)))
  }

  test("greedy packing keeps streams independent and deterministic") {
    val out = Packing.greedyPack(packDocs, "doc_id", "tok", budget = 10L, streams = 2)
      .select("doc_id", "stream", "seq_no", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    // stream 0: ids 2(5),4(3),6(2) → all fit seq0 at offsets 0,5,8
    // stream 1: ids 1(4),3(7),5(10) → 4 | 7 | 10 across three sequences
    assert(out == Set((2L, 0L, 0L, 0L), (4L, 0L, 0L, 5L), (6L, 0L, 0L, 8L),
      (1L, 1L, 0L, 0L), (3L, 1L, 1L, 0L), (5L, 1L, 2L, 0L)))
  }

  test("weighted mix: rate-1 keeps all, rate-0 keeps none, rates concentrate") {
    val df = (0L until 400L).map { i =>
      (i, Seq("all", "half", "none", "rest")((i % 4).toInt))
    }.toDF("doc_id", "source")
    val kept = graft.api.Sampling.weightedMix(df, "source", "doc_id",
      Map("all" -> 1.0, "half" -> 0.5, "none" -> 0.0), defaultRate = 0.1)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("all") == 100L)
    assert(!kept.contains("none"))
    assert(kept("half") > 30L && kept("half") < 70L)
    assert(kept.getOrElse("rest", 0L) < 30L)
  }

  test("weighted mix: a rate just below 1 keeps ~all rows, not 6%") {
    // regression: 1-2^-17 <= rate < 1 rounded to 65536, formatted as the
    // 5-char "10000", which sorts BELOW most 4-hex prefixes and silently
    // inverted the filter
    assert(graft.api.Sampling.rateThreshold(0.999999) == "g")
    assert(graft.api.Sampling.rateThreshold(1.0) == "g")
    assert(graft.api.Sampling.rateThreshold(0.5) == "8000")
    assert(graft.api.Sampling.rateThreshold(0.0) == "0000")
    val df = (0L until 400L).map(i => (i, "s")).toDF("doc_id", "source")
    val n = graft.api.Sampling.weightedMix(df, "source", "doc_id",
      Map("s" -> 0.999999), defaultRate = 0.0).count()
    assert(n == 400L, s"kept $n of 400")
  }

  test("simhash puts exact dups at hamming 0") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((0L, 3L)) == 0L)
  }

  test("simhash banding is complete: banded pairs ≡ brute-force at the bound") {
    // regression: a fixed 4-band split misses distance-4..8 pairs whose
    // differing bits touch all four bands; maxHamming+1 bands (pigeonhole)
    // must reproduce the exact all-pairs answer
    import graft.functions._
    for (h <- Seq(3, 5, 8)) {
      val banded = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = h)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val fp = docs.select(col("doc_id"), simhash64(lower(col("text"))).as("fp"))
      val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("hamming", hamming64(col("a.fp"), col("b.fp")))
        .filter(col("hamming") <= h)
        .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
      assert(banded == brute, s"maxHamming=$h: banded ${banded.size} vs brute ${brute.size}")
    }
  }

  test("brute-force cosine topk ranks the closest vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", k = 2)
      .select("rnk", "nn_id").as[(Int, Long)].collect().toMap
    assert(top(1) == 1L && top(2) == 2L)

    // string/uuid corpus ids rank identically and keep their type
    val svecs = vecs.withColumn("vec_id", concat(lit("doc-"), col("vec_id")))
    val stop = Similarity.bruteForceTopK(svecs, svecs.filter(col("vec_id") === "doc-0"),
      "vec_id", "embedding", k = 2)
      .select("rnk", "nn_id").as[(Int, String)].collect().toMap
    assert(stop(1) == "doc-1" && stop(2) == "doc-2")

    // other id types fail fast instead of silently nulling candidates
    val bad = vecs.withColumn("vec_id", col("vec_id").cast("timestamp"))
    intercept[IllegalArgumentException](
      Similarity.bruteForceTopK(bad, bad.limit(1), "vec_id", "embedding", k = 2))
  }

  test("text features: language markers and fingerprint invariance") {
    val feats = TextAnalysis.withTextFeatures(docs, "text")
      .select("doc_id", "lang_pred", "fingerprint", "n_tokens")
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(feats(0L)._2 == "en")
    assert(feats(4L)._2 == "de")
    assert(feats(0L)._3 == feats(3L)._3) // identical docs share fingerprints
    assert(feats(0L)._4 == 13L)
    // whitespace-insensitive fingerprint
    val messy = Seq((9L, "  the   quick brown fox jumps over the lazy dog and runs away fast ")).toDF("doc_id", "text")
    val fp = TextAnalysis.withTextFeatures(messy, "text").select("fingerprint").as[String].head()
    assert(fp == feats(0L)._3)
  }

  test("repetition features flag boilerplate, keep prose") {
    val rep = Seq(
      (0L, "buy now buy now buy now buy now buy now buy now"), // pure boilerplate
      (1L, "the quick brown fox jumps over the lazy dog today")) // no repeated n-grams
      .toDF("doc_id", "text")
    val out = TextAnalysis.withRepetitionFeatures(rep, "text")
      .select("doc_id", "n_bigrams", "dup_bigram_ratio", "dup_trigram_ratio")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    // doc 0: 11 bigrams, only 2 distinct ("buy now"/"now buy") → ratio 9/11
    assert(out(0)._2 == 11L && out(0)._3 > 0.8 && out(0)._4 > 0.7, out(0).toString)
    assert(out(1)._3 == 0.0 && out(1)._4 == 0.0, out(1).toString)
    val kept = TextAnalysis.repetitionFilter(rep, "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
    // short docs (fewer tokens than the n-gram width) are kept, not crashed
    val short = Seq((9L, "one")).toDF("doc_id", "text")
    assert(TextAnalysis.repetitionFilter(short, "text").count() == 1L)
  }

  test("int8 quantization round-trips within cosine 1e-3; zero vectors safe") {
    val rnd = new scala.util.Random(3)
    val vecs = ((0L until 50L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian()).toSeq)) :+
      (99L, Seq.fill(64)(0.0))).toDF("vec_id", "v")
    val q = Similarity.quantizeInt8(vecs, "v")
      .withColumn("deq", Similarity.dequantizeInt8("qvec", "qscale"))
    val rows = q.select("vec_id", "v", "qvec", "qscale", "deq")
      .as[(Long, Seq[Double], Seq[Byte], Double, Seq[Double])].collect()
    for ((id, v, codes, scale, deq) <- rows) {
      assert(codes.forall(c => c >= -127 && c <= 127), s"vec $id code range")
      if (id == 99L) {
        assert(scale == 0.0 && codes.forall(_ == 0) && deq.forall(_ == 0.0))
      } else {
        assert(codes.exists(c => math.abs(c) == 127), s"vec $id uses full range")
        val dot = v.zip(deq).map { case (a, b) => a * b }.sum
        val cos = dot / (math.sqrt(v.map(x => x * x).sum) *
          math.sqrt(deq.map(x => x * x).sum))
        assert(cos > 0.999, s"vec $id cosine $cos")
        // per-component error is bounded by half a quantization step
        v.zip(deq).foreach { case (a, b) =>
          assert(math.abs(a - b) <= scale / 2 + 1e-12, s"vec $id component") }
      }
    }
  }

  test("multi-probe LSH recovers neighbors plain LSH misses, never loses any") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 400L).map(i =>
      (i, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq)).toDF("vec_id", "v")
    val queries = vecs.filter(col("vec_id") < 8)
    def hits(probes: Int) = Similarity.lshTopK(vecs, queries, "vec_id", "v",
      k = 10, nBits = 6, tables = 2, probes = probes)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val plain = hits(0)
    val multi = hits(6)
    // the probed buckets are a superset of the plain buckets, so every
    // plain candidate survives ranking unless displaced by a BETTER
    // neighbor — recall vs brute force can only improve
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "v", k = 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    assert((plain intersect exact).size <= (multi intersect exact).size)
    // at 2 tables × 6 bits on gaussian data, Hamming-1 probing must
    // actually widen the candidate pool (not be a no-op)
    assert(multi.size >= plain.size)
    assert(multi != plain, "multi-probe changed nothing — probe fan-out broken")
  }

  test("IVF ANN with full probing equals brute force; partial probing is a subset") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 3)
    val brute = graft.similarity.Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = graft.similarity.Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full == brute) // probing every cell IS brute force
    val partial = graft.similarity.Similarity
      .ivfTopK(emb, queries, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
    assert(partial.nonEmpty && partial.length <= brute.size)
  }

  test("embedding near-dup finds planted high-cosine pairs") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => math.sin(i + 1))
    val near = base.map(_ * 1.01 + 0.001) // cosine ≈ 1
    val far = Array.tabulate(16)(i => math.cos(3 * i + 2))
    val df = Seq((0L, base), (1L, near), (2L, far))
      .toDF("vec_id", "embedding")
    val pairs = graft.dedup.Dedup
      .embeddingNearDups(df, "vec_id", "embedding", threshold = 0.95, nBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("ppm codec: encode/decode round-trip, header comments, resize") {
    import graft.multimodal.Ppm
    val rgb = Array.tabulate(2 * 2 * 3)(i => (i * 17).toByte)
    val (w, h, back) = Ppm.decode(Ppm.encode(2, 2, rgb))
    assert((w, h) == (2, 2) && back.toSeq == rgb.toSeq)
    // spec allows # comments in the header
    val commented = "P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++ rgb
    assert(Ppm.decode(commented)._3.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](Ppm.decode("P5\n1 1\n255\n ".getBytes))
    // 2x2 -> 1x1 nearest-neighbor keeps the top-left pixel
    assert(Ppm.resize(2, 2, rgb, 1, 1).toSeq == rgb.take(3).toSeq)
  }

  test("ppm decode computes true pixel statistics from real bytes") {
    import graft.multimodal.{Multimodal, Ppm}
    // constant-color 3x2 image: means must be exact
    val rgb = Array.fill(3 * 2)(Array[Byte](10, 20, 30)).flatten
    val assets = Seq((7L, Ppm.encode(3, 2, rgb))).toDF("asset_id", "content")
    val row = Multimodal.decodePpm(spark, assets).head()
    assert(row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert((row.getDouble(4), row.getDouble(5), row.getDouble(6)) == (10.0, 20.0, 30.0))
  }

  test("wav codec: round-trip, chunk skipping, stereo decimation") {
    import graft.multimodal.Wav
    val mono = Array.tabulate(10)(i => (i * 1000 - 5000).toShort)
    val (r, c, back) = Wav.decode(Wav.encode(16000, 1, mono))
    assert((r, c) == (16000, 1) && back.toSeq == mono.toSeq)
    // unknown chunks between fmt and data are skipped per the RIFF spec
    val enc = Wav.encode(8000, 1, mono)
    val extra = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(2).putShort(7).array()
    val withChunk = enc.slice(0, 36) ++ extra ++ enc.slice(36, enc.length)
    // patch RIFF size (+10)
    java.nio.ByteBuffer.wrap(withChunk, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(36 + 10 + 20)
    assert(Wav.decode(withChunk)._3.toSeq == mono.toSeq)
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ enc.drop(4)))
    // stereo decimation keeps frames together
    val stereo = Array[Short](1, -1, 2, -2, 3, -3, 4, -4)
    assert(Wav.decimate(stereo, 2, 2).toSeq == Seq[Short](1, -1, 3, -3))
  }

  test("y4m codec: round-trip, header params skipped, frame sampling") {
    import graft.multimodal.Y4m
    val frames = Vector.tabulate(5)(f => Array.tabulate(4 * 2)(p => (f * 10 + p).toByte))
    val v = Y4m.Video(4, 2, 30, 1, mono = true, frames)
    val back = Y4m.decode(Y4m.encode(v))
    assert(back.width == 4 && back.height == 2 && back.fpsNum == 30)
    assert(back.frames.size == 5 && back.frames(3).toSeq == frames(3).toSeq)
    // C420 frame size is w*h*3/2
    val c420 = Y4m.Video(4, 2, 24, 1, mono = false,
      Vector(Array.fill(4 * 2 * 3 / 2)(9.toByte)))
    assert(Y4m.decode(Y4m.encode(c420)).frames.head.length == 12)
    // unknown header params (X...) are skipped
    val hacked = ("YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono Xsome=thing\n" +
      "FRAME\n").getBytes("US-ASCII") ++ frames(0)
    assert(Y4m.decode(hacked).frames.size == 1)
    intercept[IllegalArgumentException](Y4m.decode("JUNK\n".getBytes))
    // stride-2 sampling keeps frames 0, 2, 4
    assert(Y4m.sampleFrames(v, 2).frames.map(_.head.toInt) == Vector(0, 20, 40))
  }

  test("multimodal feature-extract stub keeps the model-plumbing shape") {
    import spark.implicits._
    val assets = graft.multimodal.Multimodal.asAssets(
      Seq((1L, "hello world this is a payload"), (2L, "x")).toDF("id", "payload"),
      "id", "payload")
    val emb = graft.multimodal.Multimodal.featureExtractStub(spark, assets, dim = 16)
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L).length == 16)
    val n = math.sqrt(vecs(1L).map(x => x * x.toDouble).sum)
    assert(math.abs(n - 1.0) < 1e-3) // normalized
    // deterministic: same payload → same embedding
    val again = graft.multimodal.Multimodal.featureExtractStub(spark, assets, 16)
      .as[(Long, Array[Float])].collect().toMap
    assert(vecs(1L).toSeq == again(1L).toSeq)
  }

  test("ppm inspect reads dimensions from the actual header bytes") {
    import spark.implicits._
    val assets = Multimodal.generatePpmAssets(spark,
      Seq(0L, 7L).toDF("doc_id"), "doc_id")
    val out = Multimodal.inspectPpm(spark, assets).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    // id 0: 8x6 image — header "P6\n8 6\n255\n" (11 bytes) + 144 raster
    assert(out(0L).getAs[Int]("byte_len") == 11 + 8 * 6 * 3)
    assert(out(0L).getAs[Int]("width") == 8 && out(0L).getAs[Int]("height") == 6)
    assert(out(0L).getAs[String]("header_hex") == "50360a3820360a32") // "P6\n8 6\n2"
    // id 7: 10x9 — two-digit width must come from the PARSED header
    assert(out(7L).getAs[Int]("width") == 10 && out(7L).getAs[Int]("height") == 9)
    assert(out(7L).getAs[Int]("channels") == 3)
    // corrupt magic is rejected, not faked around
    val bad = Seq((1L, "JUNKJUNKJUNK".getBytes("US-ASCII"))).toDF("asset_id", "content")
    intercept[org.apache.spark.SparkException](
      Multimodal.inspectPpm(spark, bad).collect())
  }

  test("y4m frame byte offsets index the real raster positions") {
    import spark.implicits._
    import graft.multimodal.Y4m
    val assets = Multimodal.generateY4mAssets(spark, Seq(0L).toDF("doc_id"), "doc_id")
    // id 0: w=8 mono, 5 frames; header is 36 bytes, frame block 6+48
    val offs = Multimodal.frameByteOffsets(spark, assets, stride = 3)
      .orderBy("frame_idx").collect()
      .map(r => (r.getAs[Long]("frame_idx"), r.getAs[Long]("byte_offset")))
    assert(offs.toSeq == Seq((0L, 42L), (3L, 42L + 3 * (6 + 48))))
    // the offsets point at the REAL rasters: bytes at offset == decoded frame
    val bytes = assets.select("content").as[Array[Byte]].head()
    val v = Y4m.decode(bytes)
    val all = Y4m.frameOffsets(bytes)
    assert(all.size == v.frames.size)
    all.zipWithIndex.foreach { case (off, i) =>
      assert(bytes.slice(off.toInt, off.toInt + 48).toSeq == v.frames(i).toSeq)
    }
  }
}
