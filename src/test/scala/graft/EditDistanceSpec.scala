package graft

import org.apache.spark.sql.functions._
import graft.dedup.EditDistance

/** FastSS deletion-neighborhood edit-distance join: neighborhood
  * enumeration, completeness vs the brute-force all-pairs answer
  * (including the short-string edges that break naive blocking), the
  * hot-bucket cap, and the probe-join variant. */
class EditDistanceSpec extends GraftSpec {
  import spark.implicits._

  private def variants(s: String, tau: Int): Set[String] =
    Seq(s).toDF("s")
      .select(EditDistance.deletionVariants(col("s"), tau).as("v"))
      .as[Seq[String]].head().toSet

  test("deletion neighborhood enumerates every <=tau-deletion variant once") {
    assert(variants("abc", 1) == Set("abc", "bc", "ac", "ab"))
    assert(variants("abc", 2) == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    // duplicate characters collapse ("aab" minus either 'a' is "ab")
    assert(variants("aab", 1) == Set("aab", "ab", "aa"))
    // short strings reach the empty string, never a descending sequence
    assert(variants("a", 1) == Set("a", ""))
    assert(variants("a", 2) == Set("a", ""))
    assert(variants("ab", 2) == Set("ab", "a", "b", ""))
    assert(variants("", 1) == Set(""))
    assert(variants("", 2) == Set(""))
  }

  private lazy val words = Seq(
    // clusters at distance 1-2, incl. the length-skew edges: "ab" vs
    // "abcd" is ED 2 and only pairs through ab's OWN 0-deletion variant
    // meeting abcd's 2-deletion variant
    "ab", "abcd", "abc", "", "a",
    "spark", "spork", "sparks", "shark",
    "table", "tale", "tables", "cable",
    "window", "widow", "windows",
    "aaaa", "aaab", "baaa", "unrelated").zipWithIndex
    .toDF("s", "id").select(col("id").cast("long").as("id"), col("s"))

  private def brute(tau: Int): Set[(Long, Long, Int)] = {
    val a = words.select(col("id").as("id_a"), col("s").as("str_a"))
    val b = words.select(col("id").as("id_b"), col("s").as("str_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= tau)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
  }

  test("edJoin equals the brute-force all-pairs answer at tau=1 and tau=2") {
    for (tau <- Seq(1, 2)) {
      val got = EditDistance.edJoin(words, "id", "s", tau)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
      assert(got == brute(tau), s"tau=$tau")
      assert(got.nonEmpty)
    }
  }

  test("hot-bucket cap drops oversized variant buckets instead of exploding") {
    // 12 copies of the same string share every variant; cap 10 skips those
    // buckets entirely, so no pairs among the clones survive
    val clones = (0L until 12L).map(i => (i, "dup")).toDF("id", "s")
    val out = EditDistance.edJoin(clones, "id", "s", tau = 1, maxBucketSize = 10)
    assert(out.count() == 0)
    // with a cap that fits, all 66 clone pairs emerge at distance 0
    val full = EditDistance.edJoin(clones, "id", "s", tau = 1, maxBucketSize = 100)
    assert(full.count() == 66)
  }

  test("edJoinAgainst finds each query's in-range corpus rows only") {
    val queries = Seq((100L, "spark"), (101L, "tble"), (102L, "zzzz"))
      .toDF("id", "s")
    val got = EditDistance.edJoinAgainst(words, queries, "id", "s", tau = 2)
      .select("query_id", "corpus_s", "dist")
      .as[(Long, String, Int)].collect().toSet
    val corpus = words.select(col("id").as("cid"), col("s").as("cs"))
    val expect = queries.select(col("id").as("qid"), col("s").as("qs"))
      .crossJoin(corpus)
      .withColumn("dist", levenshtein(col("qs"), col("cs")))
      .filter(col("dist") <= 2)
      .select("qid", "cs", "dist").as[(Long, String, Int)].collect().toSet
    assert(got == expect)
    assert(got.exists(_._1 == 100L) && got.exists(_._1 == 101L))
    assert(!got.exists(_._1 == 102L)) // nothing within 2 of "zzzz"
  }

  test("randomized: blocked join equals brute force on 200 clustered strings") {
    // seeded random corpus built AS clusters of edits around base words, so
    // true pairs exist at every distance; equality with the brute-force
    // answer proves FastSS completeness beyond the hand-picked cases
    val rnd = new scala.util.Random(4242L)
    val alpha = "abcde" // small alphabet maximizes collisions and ties
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      if (s.isEmpty) word(1)
      else rnd.nextInt(3) match {
        case 0 => // substitute
          val i = rnd.nextInt(s.length)
          s.updated(i, alpha(rnd.nextInt(alpha.length)))
        case 1 => // delete
          val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
        case _ => // insert
          val i = rnd.nextInt(s.length + 1)
          s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
      }
    }
    val strings = (0 until 50).flatMap { _ =>
      val base = word(2 + rnd.nextInt(8))
      Seq(base, edit(base), edit(edit(base)), edit(edit(edit(base))))
    }.distinct
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    for (tau <- Seq(1, 2)) {
      val got = EditDistance.edJoin(df, "id", "s", tau, maxBucketSize = 10000)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
      val a = df.select(col("id").as("id_a"), col("s").as("sa"))
      val b = df.select(col("id").as("id_b"), col("s").as("sb"))
      val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("sa"), col("sb")))
        .filter(col("dist") <= tau)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"tau=$tau: missing=${(want -- got).take(5)} " +
        s"extra=${(got -- want).take(5)}")
      assert(want.nonEmpty)
    }
  }

  test("part-name gate shape: blocked join equals all-pairs on real data") {
    val names = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name")).distinct()
      .withColumn("id", col("p_name"))
    val got = EditDistance.edJoin(names, "id", "p_name", tau = 2)
      .select("str_a", "str_b").as[(String, String)].collect().toSet
    val n1 = names.select(col("p_name").as("na"))
    val n2 = names.select(col("p_name").as("nb"))
    val expect = n1.crossJoin(n2)
      .filter(col("na") < col("nb") && levenshtein(col("na"), col("nb")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty) // the corpus genuinely contains near-miss names
  }
}
