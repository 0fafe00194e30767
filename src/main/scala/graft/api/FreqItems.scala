package graft.api

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch: find every heavy hitter of a
  * 100 TB key stream with `k` counters of state per group — no candidate
  * list up front (the existing count-min gate, q49, answers point
  * lookups; this finds the heavy SET).
  *
  * Guarantees (deterministic, not probabilistic — Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * with n total items,
  *   - estimates never overcount: `est(x) ≤ true(x)`;
  *   - undercount is bounded: `true(x) − est(x) ≤ n/(k+1)`;
  *   - hence every x with `true(x) > n/(k+1)` is IN the summary.
  * Both the insert decrement (k+1 counters lose 1 together) and the
  * merge truncation (subtract the (k+1)-th largest, ≤ n₂/(k+1) more)
  * preserve the bound, so the partial+final ObjectHashAggregate plan —
  * each map task shipping one ≤k-entry map — inherits it unchanged.
  * That per-task O(k) state is the whole point at scale: exact heavy
  * hitters need a full groupBy over every distinct key; this needs one
  * map smaller than a cache line multiple.
  *
  * Curation use: over-represented boilerplate detection — sketch
  * normalized lines/sentences and inspect anything above the threshold.
  */
class FreqItemsAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None => // classic MG step: k+1 counters (incl. x's 1) drop by 1
        b.iterator.map { case (key, c) => key -> (c - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else { // subtract the (k+1)-th largest count, keep the positive rest
      val kth = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.iterator.map { case (key, c) => key -> (c - kth) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object FreqItems {
  /** Aggregate column: the ≤k-entry item→estimate map for a string key
    * column. Use inside `agg(...)`, globally or per group. */
  def sketch(keyCol: Column, k: Int): Column = {
    val fn = udaf(new FreqItemsAgg(k))
    fn(keyCol)
  }
}
