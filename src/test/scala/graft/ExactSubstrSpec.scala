package graft

import org.apache.spark.sql.functions._
import graft.dedup.ExactSubstr
import graft.similarity.Similarity

class ExactSubstrSpec extends GraftSpec {
  import spark.implicits._

  // 0/1 share a verbatim 46-char passage embedded in different text;
  // 2 repeats a 40-char line twice WITHIN itself; 3 is clean.
  private val shared = "alpha beta gamma delta epsilon zeta eta theta" // 45 chars
  private val selfRep = "this exact line repeats twice in one doc" // 40 chars
  private lazy val docs = Seq(
    (0L, s"unique preamble zero || $shared || unique tail zero"),
    (1L, s"totally different head one .. $shared .. other tail"),
    (2L, s"$selfRep and then $selfRep"),
    (3L, "completely original text with no repeated passages at all anywhere"))
    .toDF("doc_id", "text")

  test("duplicateSpans finds cross-doc and within-doc repeats, skips clean docs") {
    val spans = ExactSubstr.duplicateSpans(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = spans.groupBy(_._1)
    assert(byDoc.contains(0L) && byDoc.contains(1L), s"cross-doc pair missed: ${spans.toSeq}")
    assert(byDoc.contains(2L), s"within-doc repeat missed: ${spans.toSeq}")
    assert(!byDoc.contains(3L), s"clean doc flagged: ${spans.toSeq}")
    // doc 0's span must cover the shared passage exactly where it sits
    val t0 = docs.filter($"doc_id" === 0).select("text").as[String].head()
    val (s0, e0) = (byDoc(0L).map(_._2).min, byDoc(0L).map(_._3).max)
    val covered = t0.substring(s0.toInt - 1, e0.toInt)
    assert(covered.contains(shared), s"span [$s0,$e0] covers '$covered'")
  }

  test("spans are maximal: overlapping duplicated grams merge into one span per region") {
    val spans = ExactSubstr.duplicateSpans(docs, "doc_id", "text", minLen = 40)
    // the shared passage in doc 0 is one contiguous region → exactly 1 span
    assert(spans.filter($"doc_id" === 0).count() == 1)
    // doc 2's repeated 40-char line marks positions 1 and 51 only (grams
    // crossing the ' and then ' junction occur once); the 50-char gap
    // exceeds minLen, so the two copies stay two separate exact spans
    val s2 = spans.filter($"doc_id" === 2)
      .select("span_start", "span_end").as[(Long, Long)].collect().toSet
    assert(s2 == Set((1L, 40L), (51L, 90L)), s"doc 2 spans: $s2")
  }

  test("scrub removes exactly the spanned characters and preserves clean docs") {
    val spans = ExactSubstr.duplicateSpans(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val covered = spans.groupBy(_._1).view.mapValues(_.map(s => s._3 - s._2 + 1).sum).toMap
    val out = ExactSubstr.scrubDuplicateSpans(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val orig = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    orig.foreach { case (id, t) =>
      assert(out(id).length == t.length - covered.getOrElse(id, 0L),
        s"doc $id: scrubbed len ${out(id).length} vs orig ${t.length} minus ${covered.getOrElse(id, 0L)}")
    }
    assert(out(3L) == orig(3L)) // untouched
    assert(!out(0L).contains(shared) && !out(1L).contains(shared))
  }

  test("winnowed anchors catch every duplicated span of length >= minLen + w - 1") {
    // guarantee: dup length >= L + w - 1 = 40 + 10 - 1 = 49; the shared
    // 45-char passage sits inside a 49+-char duplicated region (the
    // surrounding ' || '/' .. ' differ, so pad the plant to be safe)
    val longShared = shared + " iota kappa lambda" // 63 chars duplicated
    val d2 = Seq(
      (10L, s"head A $longShared tail A"),
      (11L, s"other head B $longShared closing B"),
      (12L, "no duplication in this document whatsoever truly original"))
      .toDF("doc_id", "text")
    val cand = ExactSubstr.winnowedCandidates(d2, "doc_id", "text", minLen = 40, w = 10)
    val pairs = cand.select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)), s"guaranteed anchor match missed: $pairs")
    assert(!pairs.exists { case (a, b) => a == 12L || b == 12L })
  }

  test("bucket pair expansion equals the self-join formulation (incl. cap and within-doc pairs)") {
    // randomized docs with planted shared passages + within-doc repeats;
    // the single-shuffle per-bucket expansion must emit exactly the pair
    // set of the reference two-sided join at every (minLen, w, cap)
    val rnd = new scala.util.Random(17)
    def words(n: Int) = Seq.fill(n)(f"w${rnd.nextInt(40)}%02d").mkString(" ")
    val passage = "the planted shared passage that recurs across documents verbatim"
    val docs = (0L until 30L).map { i =>
      val t = i % 3 match {
        case 0 => s"${words(8)} $passage ${words(8)}"
        case 1 => s"${words(5)} $passage ${words(3)} $passage ${words(4)}" // within-doc repeat
        case _ => words(20)
      }
      (i, t)
    }.toDF("doc_id", "text")
    for ((minLen, w, cap) <- Seq((40, 10, 1000), (30, 5, 1000), (40, 10, 3))) {
      val got = ExactSubstr.winnowedCandidates(docs, "doc_id", "text",
        minLen, w, cap).select("id_a", "pos_a", "id_b", "pos_b", "h")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // reference: the original two-sided join over capped buckets
      val anchors = docs.select(col("doc_id").as("id"),
          explode(graft.functions.winnowedAnchors(col("text"), minLen, w)).as("a"))
        .select(col("id"), col("a.i").as("i"), col("a.h").as("h"))
      val ok = anchors.groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n").between(2, cap)).select("h")
      val kept = anchors.join(ok, Seq("h"), "left_semi")
      val want = kept.select(col("h"), col("id").as("id_a"), col("i").as("pos_a"))
        .join(kept.select(col("h"), col("id").as("id_b"), col("i").as("pos_b")), Seq("h"))
        .filter(col("id_a") < col("id_b") ||
          (col("id_a") === col("id_b") && col("pos_a") < col("pos_b")))
        .select("id_a", "pos_a", "id_b", "pos_b", "h")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"minLen=$minLen w=$w cap=$cap: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(got.nonEmpty, s"degenerate test at minLen=$minLen w=$w cap=$cap")
      // the scratch-disk pass split partitions the result by gram: the
      // union of the passes IS the single-pass pair set, each pass is a
      // strict subset, and the passes are disjoint
      val parts = (0 until 3).map { p =>
        ExactSubstr.winnowedCandidates(docs, "doc_id", "text", minLen, w,
          cap, hashSplit = 3, hashPart = p)
          .select("id_a", "pos_a", "id_b", "pos_b", "h")
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      }
      assert(parts.reduce(_ ++ _) == want,
        s"3-pass union != single pass at minLen=$minLen w=$w cap=$cap")
      assert(parts.forall(_.size < want.size), "a pass unexpectedly saw every gram")
      assert(parts.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty },
        "passes overlap")
    }
  }

  test("sorted-run walk equals the bounded-collect aggregate on adversarial anchors") {
    // direct pin of walkSortedAnchors (the r11 one-sort grouping) against
    // the bounded_collect_pairs aggregate it replaced, on anchor shapes the
    // winnow kernel itself can never produce: duplicate (id, i) entries
    // (must never self-pair, but each copy pairs with the others), null
    // ids (ride the run, never collected), and runs at exactly cap-1, cap
    // and cap+1 entries (the saturation boundary)
    val cap = 4
    val anchors = Seq[(Option[Long], Long, Long)](
      (Some(1L), 10L, 100L), (Some(2L), 20L, 100L),            // size 2
      (Some(3L), 30L, 200L), (Some(3L), 30L, 200L),
      (Some(4L), 40L, 200L),                                   // dup entry
      (None, 1L, 300L), (Some(5L), 50L, 300L), (Some(6L), 60L, 300L), // null id
      (Some(7L), 1L, 400L), (Some(7L), 2L, 400L), (Some(7L), 3L, 400L),
      (Some(7L), 4L, 400L),                                    // == cap
      (Some(8L), 1L, 500L), (Some(8L), 2L, 500L), (Some(8L), 3L, 500L), // == cap-1
      (Some(9L), 1L, 600L), (Some(9L), 2L, 600L), (Some(9L), 3L, 600L),
      (Some(9L), 4L, 600L), (Some(9L), 5L, 600L),              // cap+1
      (Some(10L), 70L, 700L))                                  // singleton
      .toDF("id", "i", "h")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "pos_a", "id_b", "pos_b", "h")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val walk = norm(ExactSubstr.walkSortedAnchors(anchors, cap - 1))
    val agg = norm(anchors
      .groupBy("h").agg(graft.functions.boundedCollectPairs(
        col("id"), col("i"), cap).as("xs"))
      .filter(size(col("xs")).between(2, cap - 1))
      .select(col("h"), explode(flatten(transform(col("xs"), x =>
        transform(
          filter(col("xs"), y => y.getField("id") > x.getField("id") ||
            (y.getField("id") === x.getField("id") &&
             y.getField("i") > x.getField("i"))),
          y => struct(
            x.getField("id").as("id_a"), x.getField("i").as("pos_a"),
            y.getField("id").as("id_b"), y.getField("i").as("pos_b")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.pos_a").as("pos_a"),
        col("p.id_b").as("id_b"), col("p.pos_b").as("pos_b"), col("h")))
    assert(walk == agg, s"walk=${walk.take(5)}... agg=${agg.take(5)}...")
    // spot invariants: the dup entry never self-pairs but pairs twice with
    // its neighbor; the null-id run pairs only its two non-null entries;
    // the cap and cap+1 runs are dropped, cap-1 survives complete
    assert(walk.count(p => p._5 == 200L) == 2)
    assert(!walk.exists(p => p._5 == 200L && p._1 == p._3 && p._2 == p._4))
    assert(walk.count(p => p._5 == 300L) == 1)
    assert(!walk.exists(p => p._5 == 400L || p._5 == 600L || p._5 == 700L))
    assert(walk.count(p => p._5 == 500L) == 3)
  }

  test("native winnowed anchors equal the declarative formulation") {
    // the interpreted reference: per-position xxhash64 of the minLen-gram
    // + array_min over the w-window ending at each position — the exact
    // formulation the native WinnowedAnchors expression replaced
    import org.apache.spark.sql.functions._
    val minLen = 8
    val w = 4
    val docs = Seq(
      "abcdefghijklmnopqrstuvwxyz abcdefghijklmnop",
      "aaaaaaaaaaaaaaaaaaaa",            // all-equal hashes: every tie kept
      "short",                           // < minLen: no anchors
      "exactly8",                        // == minLen: one gram
      "café au lait crème brûlée et café au lait", // multibyte
      "")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val hs = when(length(col("t")) >= minLen,
      transform(sequence(lit(1), length(col("t")) - (minLen - 1)),
        i => xxhash64(col("t").substr(i, lit(minLen)))))
      .otherwise(array().cast("array<bigint>"))
    val reference = docs.withColumn("__hs", hs)
      .filter(size(col("__hs")) > 0)
      .select(col("id"), explode(filter(
        transform(sequence(lit(1), size(col("__hs"))), i =>
          struct(i.cast("long").as("i"), element_at(col("__hs"), i).as("h"),
            array_min(slice(col("__hs"), greatest(lit(1), i - (w - 1)),
              i - greatest(lit(1), i - (w - 1)) + 1)).as("m"))),
        s => s.getField("h") === s.getField("m"))).as("a"))
      .select(col("id"), col("a.i"), col("a.h"))
      .as[(Long, Long, Long)].collect().toSet
    val native = docs.select(col("id"),
        explode(graft.functions.winnowedAnchors(col("t"), minLen, w)).as("a"))
      .select(col("id"), col("a.i"), col("a.h"))
      .as[(Long, Long, Long)].collect().toSet
    assert(native == reference)
    assert(native.nonEmpty && native.exists(_._1 == 1L)) // ties all kept
    assert(!native.exists(r => r._1 == 2L || r._1 == 5L)) // short/empty
  }

  test("ivf-pq with exact rerank matches brute force on clustered vectors") {
    // 3 tight clusters in 16-d; every query's true top-3 is its own cluster
    val rng = new scala.util.Random(7)
    val vecs = (0 until 120).map { i =>
      val c = i % 3
      val base = Array.tabulate(16)(d => if (d % 3 == c) 1.0 else 0.05)
      (i.toLong, base.map(x => (x + rng.nextGaussian() * 0.02).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
    // rerank must cover a full 40-member cluster: the tight clusters
    // quantize to IDENTICAL codes, so ADC ties the whole cluster and the
    // shortlist below ~40 is an arbitrary tied subset
    val pq = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 4, m = 4, ksub = 8, rerank = 60)
    val e = exact.select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val p = pq.select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    assert((e intersect p).size >= 8, s"recall too low: exact=$e pq=$p")
  }

  test("pq codes compress: encode emits m small codes plus the stored norm") {
    val rng = new scala.util.Random(3)
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(vecs, "embedding", m = 4, ksub = 8,
      trainFraction = 1.0)
    assert(books.length == 4 && books.forall(_.length == 8) &&
      books.forall(_.forall(_.length == 4)))
    val enc = Similarity.pqEncode(vecs, "vec_id", "embedding", books).collect()
    assert(enc.length == 64)
    enc.foreach { r =>
      // codes are an m-byte binary since r11 (one unsigned byte per sub-space)
      val codes = r.getAs[Array[Byte]](1)
      assert(codes.length == 4 && codes.forall(c => (c & 0xff) >= 0 && (c & 0xff) < 8))
      assert(r.getDouble(2) > 0.0)
    }
  }
}
