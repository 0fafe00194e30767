package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, NumericType}

/** T-Digest: a mergeable quantile sketch (Dunning & Ertl, "Computing
  * Extremely Accurate Quantiles Using t-Digests", arXiv:1902.04023; the
  * merging-digest variant with the k1 scale function).
  *
  * Reference analog: the sketching extension family
  * (sdks/java/extensions/sketching/src/main/java/org/apache/beam/sdk/
  * extensions/sketching/TDigestQuantiles.java) — a per-key mergeable
  * summary whose accuracy concentrates at the tails. Spark ships
  * percentile_approx (KLL-style) but no t-digest; this fills that row
  * with the same TypedImperativeAggregate machinery percentile_approx
  * uses: an object buffer per group, serialized ONLY at the partial/final
  * shuffle boundary, so map-side combining works and a 100 TB aggregation
  * moves `O(groups × compression)` bytes, not data.
  *
  * Accuracy: relative quantile error is bounded by ~`O(q(1-q)/δ)` — at
  * δ=200 mid-quantiles land within ~0.1% and tail quantiles tighter
  * still (the k1 scale function devotes centroid budget to the tails).
  */
final class TDigest(val compression: Double) extends Serializable {

  private var means = new Array[Double](32)
  private var weights = new Array[Double](32)
  private var n = 0
  private var total = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  // unmerged tail: new points accumulate here and fold in on compress()
  private val bufCap = math.max(64, (4 * compression).toInt)
  private var bufM = new Array[Double](bufCap)
  private var bufW = new Array[Double](bufCap)
  private var nBuf = 0

  def isEmpty: Boolean = n == 0 && nBuf == 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN || w <= 0) return
    if (nBuf == bufCap) compress()
    bufM(nBuf) = x; bufW(nBuf) = w; nBuf += 1
    if (x < min) min = x
    if (x > max) max = x
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.n) { add(other.means(i), other.weights(i)); i += 1 }
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
  }

  /** k1 scale: δ/(2π)·asin(2q−1). Steep at q→0/1, so clusters there stay
    * tiny (singletons at the extreme tails) — the tail-accuracy property. */
  private def kOf(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  // greedy merging accumulates a directional bias; alternating the sweep
  // direction between compressions cancels it (same fix as Dunning's
  // MergingDigest.merge 'reverse' alternation)
  private var flip = false

  /** Fold the unmerged tail into the centroid list: sort all clusters by
    * mean, then one greedy pass merging neighbors while the merged cluster
    * spans less than one k-unit. O((n+buf) log(n+buf)). */
  def compress(): Unit = {
    if (nBuf == 0) return
    flip = !flip
    val sign = if (flip) -1.0 else 1.0
    val m = n + nBuf
    val all = new Array[(Double, Double)](m)
    var i = 0
    while (i < n) { all(i) = (sign * means(i), weights(i)); i += 1 }
    i = 0
    while (i < nBuf) { all(n + i) = (sign * bufM(i), bufW(i)); i += 1 }
    java.util.Arrays.sort(all, Ordering.by((p: (Double, Double)) => p._1))
    val tot = all.iterator.map(_._2).sum

    val om = new Array[Double](m)
    val ow = new Array[Double](m)
    var out = 0
    var curM = all(0)._1
    var curW = all(0)._2
    var done = 0.0 // weight fully to the left of the current cluster
    var kLeft = kOf(0.0)
    i = 1
    while (i < m) {
      val (xm, xw) = all(i)
      val qRight = (done + curW + xw) / tot
      if (kOf(qRight) - kLeft <= 1.0) {
        // weighted-mean merge into the current cluster
        curM += (xm - curM) * xw / (curW + xw)
        curW += xw
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        done += curW
        kLeft = kOf(done / tot)
        curM = xm; curW = xw
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1

    if (flip) {
      // undo the negation: reverse and restore signs so means ascend
      var a = 0
      while (a < out) { om(a) = -om(a); a += 1 }
      var lo = 0; var hi = out - 1
      while (lo < hi) {
        val tm = om(lo); om(lo) = om(hi); om(hi) = tm
        val tw = ow(lo); ow(lo) = ow(hi); ow(hi) = tw
        lo += 1; hi -= 1
      }
    }
    means = om; weights = ow; n = out; total = tot; nBuf = 0
  }

  /** Quantile estimate: linear interpolation between centroid centers,
    * anchored at the exact min/max for the extreme tails. */
  def quantile(q: Double): Double = {
    compress()
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val target = math.min(1.0, math.max(0.0, q)) * total
    // centroid i's mass is centered at cum_i - w_i/2
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target < center) {
        if (i == 0) {
          // below the first center: interpolate from the true minimum
          val c0 = weights(0) / 2
          return if (c0 <= 0) means(0) else min + (target / c0) * (means(0) - min)
        }
        val prevCenter = cum - weights(i - 1) / 2
        val f = (target - prevCenter) / (center - prevCenter)
        return means(i - 1) + f * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    // above the last center: interpolate toward the true maximum
    val lastCenter = total - weights(n - 1) / 2
    val span = total - lastCenter
    if (span <= 0) max
    else means(n - 1) + ((target - lastCenter) / span) * (max - means(n - 1))
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 * 3 + 4 + 16 * n)
    bb.putDouble(compression).putDouble(min).putDouble(max).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(means(i)); i += 1 }
    i = 0
    while (i < n) { bb.putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getDouble)
    d.min = bb.getDouble
    d.max = bb.getDouble
    val n = bb.getInt
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { ws(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { d.add(ms(i), ws(i)); i += 1 }
    d
  }

  /** Quantile of a serialized digest (shared by the scalar expression). */
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    deserialize(bytes).quantile(q)
}

/** `tdigest_sketch(numeric[, δ])` aggregate → serialized digest (binary).
  * Partial aggregation applies (map-side digests merge at the exchange),
  * same contract as percentile_approx / hll_sketch_agg. */
case class TDigestSketchAgg(
    child: Expression,
    compression: Double = 200.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  require(compression >= 10, "t-digest compression must be >= 10")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tdigest_sketch requires a numeric argument, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  // numeric widening once at plan time, not per row
  @transient private lazy val asDouble: Expression =
    if (child.dataType == DoubleType) child
    else org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = asDouble.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TDigest, other: TDigest): TDigest = { buf.merge(other); buf }

  override def eval(buf: TDigest): Any = if (buf.isEmpty) null else buf.serialize()

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TDigestSketchAgg =
    copy(child = newChild)
}

/** `tdigest_merge(binary)` aggregate — re-aggregates serialized digests
  * (rollup across shards/time, the mergeable-sketch law). */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge requires a binary (serialized digest) argument, got ${other.catalogString}")
  }

  // an empty merge must still know its compression; use the default until
  // the first real digest arrives (merge adopts its centroids as-is)
  override def createAggregationBuffer(): TDigest = new TDigest(200.0)

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.merge(TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: TDigest, other: TDigest): TDigest = { buf.merge(other); buf }
  override def eval(buf: TDigest): Any = if (buf.isEmpty) null else buf.serialize()
  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_merge"

  override def withNewMutableAggBufferOffset(offset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

/** `tdigest_quantile(sketch, q)` scalar — quantile estimate from a
  * serialized digest. Interpreted eval is fine here: it runs once per
  * GROUP (digests are post-aggregation), not once per row. */
case class TDigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantile(binary, double) got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, q: Any): Any =
    TDigest.quantileOf(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_quantile"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
}
