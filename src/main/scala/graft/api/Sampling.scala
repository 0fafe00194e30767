package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators (reference transforms/Sample.java: any /
  * fixedSizeGlobally / fixedSizePerKey — reservoir-based CombineFns).
  *
  * Two families:
  *  - `bernoulli`: Spark's native `df.sample` — cheap, size only
  *    approximate, seed-reproducible per partitioning.
  *  - hash-ranked fixed-size: rank rows by a *content* hash and take the
  *    top n. Same uniform-without-replacement contract as the reference's
  *    reservoir, but fully deterministic (independent of partitioning,
  *    re-runnable, engine-portable) — which is what a 100 TB training-data
  *    pipeline actually wants from a sample. Global top-n compiles to
  *    TakeOrderedAndProject (per-partition heaps + driver merge of n·P
  *    rows, no full sort); per-key uses a window row_number over the
  *    key-partitioned shuffle.
  */
object Sampling {

  /** Sample.any-ish: approximate fraction, seeded. */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Deterministic rank for a row: md5 of the key rendered as text.
    * md5 (not xxhash64) keeps the sample reproducible across engines. */
  private def hashRank(key: Column): Column = md5(key.cast("string"))

  /** Sample.fixedSizeGlobally(n), deterministic. */
  def fixedSizeGlobally(df: DataFrame, n: Int, key: Column): DataFrame =
    df.orderBy(hashRank(key)).limit(n)

  /** Sample.fixedSizePerKey(n), deterministic. */
  def fixedSizePerKey(df: DataFrame, n: Int, keyCol: Column, idCol: Column): DataFrame =
    df.withColumn("__rank",
        row_number().over(Window.partitionBy(keyCol).orderBy(hashRank(idCol))))
      .filter(col("__rank") <= n)
      .drop("__rank")

  /** [[fixedSizePerKey]] for wide rows at 100 TB: the same keep-set when
    * `idCol` is non-null and distinct per key (md5 ties between duplicate
    * ids are the only possible divergence), but the wide rows NEVER
    * shuffle. The window formulation ships every full row — multi-KB text
    * and all — through a key-partitioned exchange and sorts it inside
    * WindowExec; here the per-key nth-smallest id-hash (the keep/drop
    * boundary) is computed on a narrow (key, hash) projection, and only
    * keys that actually REACH the cap emit a threshold row, so the join
    * side is one row per hot key (broadcast under AQE in any realistic
    * cap setting — under-cap keys take the null branch and keep
    * everything) and the keep decision is a scan-stage string compare.
    * Null-safe key equality keeps the null-key group capped exactly like
    * the window path.
    *
    * `broadcastThresholds` defaults true — the hint matters because the
    * pre-AQE plan would otherwise sort-merge and the wide side's shuffle
    * map work is already spent by the time AQE notices the threshold
    * stage is tiny. Pass false only when the over-cap key count itself is
    * too large to broadcast (then the narrow threshold table shuffles,
    * still never the wide rows' width×depth). */
  def fixedSizePerKeyByThreshold(df: DataFrame, n: Int, keyCol: Column,
      idCol: Column, broadcastThresholds: Boolean = true): DataFrame = {
    val thr = df.select(keyCol.as("__k"), hashRank(idCol).as("__h"))
      .withColumn("__r",
        row_number().over(Window.partitionBy("__k").orderBy("__h")))
      .filter(col("__r") === n)
      .select(col("__k"), col("__h").as("__thr"))
    val right = if (broadcastThresholds) broadcast(thr) else thr
    df.join(right, keyCol <=> col("__k"), "left")
      .filter(col("__thr").isNull || hashRank(idCol) <= col("__thr"))
      .drop("__k", "__thr")
  }

  /** Deterministic uniform in (0,1) for a key: 13 hex digits (52 bits —
    * exactly a double mantissa) of md5, +0.5 so 0 and 1 are excluded.
    * Portable: an independent engine reproduces it from the same md5. */
  private[graft] def hashUniform(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 13), 16, 10)
      .cast("double") + 0.5) / lit(4503599627370496.0) // 2^52

  /** Weight-proportional sampling WITHOUT replacement, n per key —
    * Efraimidis–Spirakis A-ES: each row draws an exponential rank
    * `-ln(u)/w` (u a deterministic hash-uniform of its id) and the n
    * SMALLEST ranks per key win; P(row first) = w/Σw exactly. Same 100 TB
    * contract as [[fixedSizePerKey]]: deterministic, partition-independent,
    * restartable; one shuffle on the key for the row_number window. Rank
    * ties (FP-impossible in practice) break by id for full determinism. */
  def weightedFixedSizePerKey(df: DataFrame, n: Int, keyCol: Column,
      idCol: Column, weightCol: Column): DataFrame = {
    val rank = -log(hashUniform(idCol)) / weightCol.cast("double")
    df.withColumn("__wrank",
        row_number().over(Window.partitionBy(keyCol).orderBy(rank, idCol)))
      .filter(col("__wrank") <= n)
      .drop("__wrank")
  }

  /** The 4-hex-char keep threshold for a rate: a row survives when the
    * md5 prefix of its id sorts strictly below it. "g" > every hex char,
    * so rate ≥ 1 keeps all; "0000" (rate ≤ 0) keeps none. */
  def rateThreshold(rate: Double): String = {
    val bucket = math.max((rate * 65536).round.toInt, 0)
    // Rates just below 1 round to 65536, which would format as the 5-char
    // "10000" and sort BELOW most 4-char prefixes — keep-all instead.
    if (rate >= 1.0 || bucket >= 65536) "g"
    else f"$bucket%04x"
  }

  /** Training-mix construction: deterministic per-key weighted sampling
    * ("keep 100% of wiki, 30% of web, 10% of the rest"). A row is kept iff
    * `md5(id)[0..4) < threshold(rate(key))` — a pure scan-stage filter:
    * no shuffle, no RNG state, independent of partitioning, identical
    * across runs and engines (md5 is portable), and exactly restartable —
    * the reproducibility contract a 100 TB corpus-mix job needs. Rate
    * precision is 1/65536; sampled fractions concentrate tightly around
    * the rate (Chernoff) at any real corpus size. */
  def weightedMix(df: DataFrame, keyCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val thr = rates.foldRight(lit(rateThreshold(defaultRate)): Column) {
      case ((k, r), els) => when(col(keyCol) === k, lit(rateThreshold(r))).otherwise(els)
    }
    df.filter(substring(hashRank(col(idCol)), 1, 4) < thr)
  }

  /** Temperature-derived per-source keep rates for [[weightedMix]] —
    * the standard multilingual/source rebalancing rule (mBERT, XLM-R,
    * mT5 all published it): sampling probability ∝ count^alpha, so the
    * keep RATE per source is ∝ count^(alpha-1), normalized so the
    * largest implied rate is 1.0 (pure downsampling — no source is
    * upsampled, which a rate filter cannot do anyway). alpha = 1
    * reproduces the natural distribution (all rates 1); alpha = 0 gives
    * every source the same expected row count (rate ∝ 1/count).
    * Counts are whatever one groupBy produced; the math is driver-side
    * on |sources| numbers. */
  def temperatureRates(counts: Map[String, Long],
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha outside [0, 1]")
    val pos = counts.filter(_._2 > 0L)
    if (pos.isEmpty) return Map.empty
    val raw = pos.map { case (k, n) => k -> math.pow(n.toDouble, alpha - 1.0) }
    val mx = raw.values.max
    raw.map { case (k, r) => k -> r / mx }
  }
}
