package graft

import org.apache.spark.sql.{Encoders, Observation}
import org.apache.spark.sql.functions._
import graft.api.{Combine, Metrics, Sampling}
import graft.cep.Pattern
import graft.cep.Pattern.{One, Opt, Plus, Star, Sym}

/** Unit tests for wave-2 operators: CEP matcher semantics, deterministic
  * sampling, CombineFn adapter laws, observe-based metrics. */
class ExtendedOpsSpec extends GraftSpec {
  import spark.implicits._

  // ---- CEP backtracking matcher (pure function) ----

  private def syms(s: String): IndexedSeq[Char] = s.toIndexedSeq

  test("cep: A B matches adjacent pairs, skip past last row") {
    val pat = IndexedSeq(Sym[Char]("a", _ == 'a'), Sym[Char]("b", _ == 'b'))
    val ms = Pattern.matchAll(syms("abxabab"), pat)
    assert(ms.map(_.events.mkString) == Seq("ab", "ab", "ab"))
  }

  test("cep: A+ B is greedy and non-overlapping") {
    val pat = IndexedSeq(Sym[Char]("a", _ == 'a', Plus), Sym[Char]("b", _ == 'b'))
    val ms = Pattern.matchAll(syms("aaabxaab bb".filterNot(_ == ' ')), pat)
    assert(ms.map(_.events.mkString) == Seq("aaab", "aab"))
    assert(ms.head.measures("a").mkString == "aaa")
  }

  test("cep: A* C allows empty prefix; C? optional suffix") {
    val pat = IndexedSeq(Sym[Char]("a", _ == 'a', Star), Sym[Char]("c", _ == 'c'))
    assert(Pattern.matchAll(syms("cac"), pat).map(_.events.mkString) == Seq("c", "ac"))
    val pat2 = IndexedSeq(Sym[Char]("b", _ == 'b'), Sym[Char]("c", _ == 'c', Opt))
    assert(Pattern.matchAll(syms("bcb"), pat2).map(_.events.mkString) == Seq("bc", "b"))
  }

  test("cep: backtracking lets a greedy star yield to a required suffix") {
    // X* then X: star must give one back
    val pat = IndexedSeq(Sym[Char]("s", _ == 'x', Star), Sym[Char]("t", _ == 'x'))
    val ms = Pattern.matchAll(syms("xxx"), pat)
    assert(ms.map(_.events.mkString) == Seq("xxx"))
    assert(ms.head.measures("t").mkString == "x")
  }

  test("cep: prev-aware predicates see the physical previous event") {
    // strictly-decreasing runs: 9 8 7 | 9 5 → runs (8,7) and (5)
    val pat = IndexedSeq(Sym.withPrev[Int]("d",
      (prev, cur) => prev.exists(cur < _), Plus))
    val ms = Pattern.matchAll(IndexedSeq(9, 8, 7, 9, 5), pat)
    assert(ms.map(_.events) == Seq(IndexedSeq(8, 7), IndexedSeq(5)))
  }

  test("cep: SKIP TO NEXT ROW yields overlapping matches; unconsumed = in no match") {
    val pat = IndexedSeq(Sym[Char]("a", _ != 'x'), Sym[Char]("b", _ != 'x'))
    // "abcx": windows ab, bc overlap on b; x and the c stranded before it
    // join no pair-with-next
    val (ms, un) = Pattern.matchScan(syms("abcx"), pat, Pattern.ToNextRow)
    assert(ms.map(_.events.mkString) == Seq("ab", "bc"))
    assert(un == Seq(3)) // only x is in no match
    val (ms2, _) = Pattern.matchScan(syms("abcx"), pat, Pattern.PastLastRow)
    assert(ms2.map(_.events.mkString) == Seq("ab")) // c has no partner left
  }

  test("cep: SKIP TO LAST resumes at the last row of the named symbol") {
    // V-shapes over prices; the recovery peak starts the next V (W-shape)
    val strt = Sym.withPrev[Int]("s", (_, _) => true)
    val down = Sym.withPrev[Int]("d", (p, c) => p.exists(c < _), Plus)
    val up = Sym.withPrev[Int]("u", (p, c) => p.exists(c > _), Plus)
    val prices = IndexedSeq(5, 3, 1, 4, 2, 6)
    val toLast = Pattern.matchScan(prices, IndexedSeq(strt, down, up),
      Pattern.ToLastSym("u"))._1
    // V1 = 5 3 1 4 (peak 4), V2 shares the 4: 4 2 6
    assert(toLast.map(_.events) == Seq(IndexedSeq(5, 3, 1, 4), IndexedSeq(4, 2, 6)))
    // PAST LAST ROW loses the 4→2 drop's context: second match is 2? no —
    // STRT=2, DOWN+ needs a drop after 2 (none: 6 rises) → only one match
    val past = Pattern.matchAll(prices, IndexedSeq(strt, down, up))
    assert(past.map(_.events) == Seq(IndexedSeq(5, 3, 1, 4)))
    // TO FIRST of a symbol at the match start must error (infinite loop)
    intercept[IllegalArgumentException] {
      Pattern.matchScan(prices, IndexedSeq(strt, down, up), Pattern.ToFirstSym("s"))
    }
    // symbol absent from the match (Star matched empty) must error
    val optUp = Sym.withPrev[Int]("u", (p, c) => p.exists(c > _), Star)
    intercept[IllegalArgumentException] {
      Pattern.matchScan(IndexedSeq(5, 3, 1), IndexedSeq(strt, down, optUp),
        Pattern.ToLastSym("u"))
    }
  }

  test("cep: reluctant quantifiers take the shortest repetition that matches") {
    // spike (>=9) ... dip (<=1): reluctant filler pairs each spike with the
    // FIRST following dip; greedy runs to the LAST dip and eats the rest
    def pat(filler: Pattern.Quant) = IndexedSeq(
      Sym[Int]("a", _ >= 9), Sym[Int]("b", _ => true, filler), Sym[Int]("c", _ <= 1))
    val vals = IndexedSeq(9, 5, 1, 9, 0)
    val reluctant = Pattern.matchAll(vals, pat(Pattern.StarReluctant))
    assert(reluctant.map(_.events) == Seq(IndexedSeq(9, 5, 1), IndexedSeq(9, 0)))
    val greedy = Pattern.matchAll(vals, pat(Pattern.Star))
    assert(greedy.map(_.events) == Seq(IndexedSeq(9, 5, 1, 9, 0))) // one match, all consumed
    // +? requires at least one filler row; ?? prefers zero
    val plusR = Pattern.matchAll(vals, pat(Pattern.PlusReluctant))
    assert(plusR.map(_.events) == Seq(IndexedSeq(9, 5, 1))) // 9,0 adjacent: no filler
    val optR = Pattern.matchAll(IndexedSeq(9, 9, 1), pat(Pattern.OptReluctant))
    // first 9 pairs via one optional filler (9); reluctant tries zero first
    assert(optR.map(_.events) == Seq(IndexedSeq(9, 9, 1)))
  }

  test("cep: distributed matchPattern groups by key and orders by time") {
    val evs = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), // key 1: ab
      (2L, 1L, "b"), (2L, 2L, "a"), (2L, 3L, "b")) // key 2: bab → one ab at t2
      .toDF("k", "t", "sym").as[(Long, Long, String)]
    val pat = Seq(
      Sym[(Long, Long, String)]("a", _._3 == "a"),
      Sym[(Long, Long, String)]("b", _._3 == "b"))
    val out = Pattern.matchPattern(evs, (e: (Long, Long, String)) => e._1,
      (e: (Long, Long, String)) => e._2, pat) { (k, m) => (k, m.events.head._2) }(
      Encoders.scalaLong, implicitly[Ordering[Long]], Encoders.product[(Long, Long)])
    assert(out.collect().sorted.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  // ---- Sampling ----

  test("sampling: fixedSizeGlobally is deterministic and exact-size") {
    val df = spark.range(1000).toDF("id")
    val s1 = Sampling.fixedSizeGlobally(df, 50, col("id")).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.fixedSizeGlobally(df.repartition(7), 50, col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 50 && s1 == s2) // partitioning-independent
  }

  test("sampling: fixedSizePerKey caps every key") {
    val df = spark.range(300).select((col("id") % 3).as("k"), col("id"))
    val out = Sampling.fixedSizePerKey(df, 7, col("k"), col("id"))
    val sizes = out.groupBy("k").count().collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq(7L, 7L, 7L))
  }

  // ---- CombineFn adapter ----

  test("combineFn: reduce/merge agree with a single-pass fold (combiner lifting law)") {
    val agg = Combine.combineFn[Long, (Long, Long), Double](
      () => (0L, 0L), (a, x) => (a._1 + x, a._2 + 1),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      a => a._1.toDouble / a._2)(
      Encoders.product[(Long, Long)], Encoders.scalaDouble)
    // partition the input arbitrarily; merged accumulators must equal the
    // sequential fold (associativity ≙ CombineFnTester contract)
    val xs = (1L to 100L).toSeq
    val seqAcc = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(37)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(seqAcc == merged && agg.finish(merged) == 50.5)
  }

  test("combineFn: registered UDAF runs in spark.sql with partial aggregation") {
    val agg = Combine.combineFn[Double, (Double, Long), Double](
      () => (0.0, 0L), (a, x) => (a._1 + x, a._2 + 1),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      a => if (a._2 == 0) 0.0 else a._1 / a._2)(
      Encoders.product[(Double, Long)], Encoders.scalaDouble)
    Combine.register(spark, "my_mean", agg)
    spark.range(10).select(col("id").cast("double").as("x"))
      .createOrReplaceTempView("xs")
    val r = spark.sql("SELECT my_mean(x) AS m FROM xs").as[Double].head()
    assert(r == 4.5)
  }

  // ---- Metrics ----

  test("metrics: observe computes counters and distributions in-job") {
    val cnt = new Observation("cnt")
    val dist = new Observation("dist")
    val df = Metrics.distribution(
      Metrics.counter(spark.range(100).toDF("id"), cnt, col("id") % 2 === 0),
      dist, col("id"))
    df.write.format("noop").mode("overwrite").save()
    assert(cnt.get("count") == 50L)
    assert(dist.get("min") == 0L && dist.get("max") == 99L && dist.get("sum") == 4950L)
  }
}
