package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable (id, pos) long-pair buffer HARD-CAPPED at `cap` pairs — the
  * aggregation state of [[BoundedCollectPairsAgg]]. Entries past the cap
  * are silently dropped: the caller detects saturation as `size == cap`
  * and discards the whole group, so WHICH entries survive a saturated
  * buffer never matters. */
final class LongPairsBuffer(val cap: Int) {
  private[plans] var arr: Array[Long] = new Array[Long](math.min(cap * 2, 16))
  private[plans] var n: Int = 0 // longs used (2 per pair)

  private def ensure(need: Int): Unit =
    if (need > arr.length) {
      val next = new Array[Long](math.min(cap * 2, math.max(arr.length * 2, need)))
      System.arraycopy(arr, 0, next, 0, n)
      arr = next
    }

  def add(id: Long, pos: Long): Unit =
    if (n < cap * 2) { ensure(n + 2); arr(n) = id; arr(n + 1) = pos; n += 2 }

  def mergeFrom(other: LongPairsBuffer): Unit = {
    val take = math.min(other.n, cap * 2 - n)
    if (take > 0) { ensure(n + take); System.arraycopy(other.arr, 0, arr, n, take); n += take }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(arr(i)); i += 1 }
    bb.array()
  }
}

object LongPairsBuffer {
  def deserialize(bytes: Array[Byte], cap: Int): LongPairsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new LongPairsBuffer(cap)
    b.arr = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) { b.arr(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }
}

/** `bounded_collect_pairs(id, pos, cap)` — collect_list(struct(id, pos))
  * with a HARD per-group buffer cap, for group-then-filter pipelines that
  * discard over-populated groups anyway (LSH buckets, duplicate-gram
  * position lists). Semantics the caller relies on:
  *
  *   - groups with ≤ cap-1 rows collect their COMPLETE (unordered) list —
  *     identical rows to collect_list, in whatever order update/merge saw
  *     them (downstream must be order-insensitive, as with collect_list);
  *   - a group with ≥ cap rows yields EXACTLY cap entries, so
  *     `size(xs) = cap` is the saturation marker — with cap = K+1, a
  *     `size BETWEEN 2 AND K` filter reproduces "drop groups over K"
  *     without a SECOND pass over the input to count group sizes first
  *     (the pre-r11 ExactSubstr shape: a count aggregate + broadcast
  *     anti-join that re-ran the whole anchor scan);
  *   - the buffer is bounded at cap pairs — a degenerate corpus-wide-hot
  *     group can no longer materialize an unbounded aggregation buffer
  *     (the guard the two-pass shape existed for in the first place).
  *
  * Output: array<struct<id:bigint,i:bigint>> (field names pinned — the
  * pair-expansion lambdas read `.getField("id")` / `.getField("i")`). */
case class BoundedCollectPairsAgg(
    left: Expression,
    right: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongPairsBuffer] with BinaryLike[Expression] {

  require(cap > 0, "cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bounded_collect_pairs requires (bigint, bigint), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def createAggregationBuffer(): LongPairsBuffer = new LongPairsBuffer(cap)

  override def update(buf: LongPairsBuffer, input: InternalRow): LongPairsBuffer = {
    val id = left.eval(input)
    val pos = right.eval(input)
    if (id != null && pos != null)
      buf.add(id.asInstanceOf[Long], pos.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongPairsBuffer, other: LongPairsBuffer): LongPairsBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: LongPairsBuffer): Any = {
    val out = new Array[Any](buf.n / 2)
    var p = 0
    while (p < out.length) {
      out(p) = InternalRow(buf.arr(2 * p), buf.arr(2 * p + 1))
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: LongPairsBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): LongPairsBuffer =
    LongPairsBuffer.deserialize(bytes, cap)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_pairs"

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollectPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollectPairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedCollectPairsAgg =
    copy(left = newLeft, right = newRight)
}
