package graft

import org.apache.spark.sql.Encoders
import graft.api.Combine

/** Property-based CombineFn laws (≙ the reference's CombineFnTester,
  * testing/CombineFnTester.java: any partitioning of the input into
  * shards, reduced independently and merged in any grouping order, must
  * equal the sequential fold). These laws are exactly what makes
  * partial+final aggregation (combiner lifting) correct on a cluster.
  * Seeded random cases (200 per law) keep runs deterministic. */
class CombineLawsSpec extends GraftSpec {

  private val sumCount = Combine.combineFn[Double, (Double, Long), (Double, Long)](
    () => (0.0, 0L),
    (a, x) => (a._1 + x, a._2 + 1),
    (a, b) => (a._1 + b._1, a._2 + b._2),
    identity)(
    Encoders.product[(Double, Long)], Encoders.product[(Double, Long)])

  private val minMax = Combine.combineFn[Long, (Long, Long), (Long, Long)](
    () => (Long.MaxValue, Long.MinValue),
    (a, x) => (math.min(a._1, x), math.max(a._2, x)),
    (a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)),
    identity)(
    Encoders.product[(Long, Long)], Encoders.product[(Long, Long)])

  private def cases[A](seed: Long)(f: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(seed)
    (1 to 200).map(_ => f(rnd))
  }

  test("sharded reduce + merge equals sequential fold for any partitioning") {
    cases(42L) { rnd =>
      val xs = List.fill(rnd.nextInt(50))(rnd.nextInt(2001) - 1000.0)
      val nShards = 1 + rnd.nextInt(7)
      val seq = xs.foldLeft(sumCount.zero)(sumCount.reduce)
      val merged = xs.grouped(math.max(1, math.ceil(xs.size.toDouble / nShards).toInt))
        .map(_.foldLeft(sumCount.zero)(sumCount.reduce))
        .foldLeft(sumCount.zero)(sumCount.merge)
      assert(merged._2 == seq._2) // counts exact
      assert(math.abs(merged._1 - seq._1) <= 1e-6 * (1 + math.abs(seq._1)))
    }
  }

  test("merge is commutative and associative (min/max accumulator)") {
    cases(7L) { rnd =>
      def acc() = List.fill(rnd.nextInt(20))(rnd.nextLong() % 1000)
        .foldLeft(minMax.zero)(minMax.reduce)
      val (a, b, c) = (acc(), acc(), acc())
      assert(minMax.merge(a, b) == minMax.merge(b, a))
      assert(minMax.merge(minMax.merge(a, b), c) == minMax.merge(a, minMax.merge(b, c)))
    }
  }

  test("zero is the merge identity") {
    cases(13L) { rnd =>
      val acc = List.fill(rnd.nextInt(20))(rnd.nextLong() % 1000)
        .foldLeft(minMax.zero)(minMax.reduce)
      assert(minMax.merge(acc, minMax.zero) == acc)
      assert(minMax.merge(minMax.zero, acc) == acc)
    }
  }

  test("misra-gries guarantee survives any sharding and merge order") {
    // MG is NOT equal-to-sequential under resharding (the summary is
    // path-dependent); the LAW is the deterministic error contract:
    // size ≤ k, never overcount, undercount ≤ n/(k+1) for EVERY key —
    // which is what makes the partial+final aggregation plan sound.
    val k = 8
    val agg = new graft.api.FreqItemsAgg(k)
    cases(99L) { rnd =>
      val xs = List.fill(50 + rnd.nextInt(300))(
        if (rnd.nextInt(10) < 4) "H" + rnd.nextInt(3) // planted heavies
        else "t" + rnd.nextInt(120)) // long tail
      val n = xs.size
      val partials = xs.grouped(1 + rnd.nextInt(40))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(merged.size <= k)
      merged.foreach { case (key, est) => assert(est <= exact(key)) }
      exact.foreach { case (key, c) =>
        assert(c - merged.getOrElse(key, 0L) <= n.toDouble / (k + 1), key)
      }
    }
  }
}
