package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import Stateful.{Cells, ParDoLogic, Timers}

/** Stateful per-key processing on Spark's `transformWithState`
  * (StatefulProcessor) — the NATIVE-timers / native-state-cells substrate.
  *
  * The reference exposes N named state cells per key (sdk/state/
  * StateSpecs.java — ValueState/BagState/MapState) and N named timers per
  * key (DoFn.java:475–540, the TimerMap). [[Stateful.statefulParDo]]
  * (flatMapGroupsWithState) had to approximate both: cells as fields of
  * ONE serialized state blob, timers multiplexed over ONE Spark timeout
  * armed at the earliest deadline. `transformWithState` removes both
  * limitations natively:
  *
  *  - state cells: `getValueState`/`getListState`/`getMapState` are real
  *    per-key named columns in the state store — a 1 KB buffer update no
  *    longer rewrites the whole blob (see [[groupIntoBatchesListState]]);
  *  - timers: `registerTimer`/`deleteTimer` hold MANY timers per key, each
  *    firing its own `handleExpiredTimer` — a named deadline maps to a
  *    native timer instead of a re-armed min-heap (see
  *    [[twoEventTimeTimers]] for the case the multiplexer can only
  *    approximate: two independent event-time timers on one key, armed
  *    simultaneously, firing separately as the watermark crosses each).
  *
  * The key-local logic is the SAME [[Stateful.ParDoLogic]] value that
  * drives the V1 substrate, so V1 ≡ V2 holds by construction above the
  * timer plumbing; StatefulV2Spec pins it empirically for the trigger
  * taxonomy, Deduplicate TTL and GroupIntoBatches.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — Spark ships transformWithState
  * on RocksDB only. At scale the placement is identical to V1: state and
  * timers live in the executor state store, partitioned by the grouping
  * key, no extra exchange.
  */
object StatefulV2 {

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The session conf transformWithState requires; exposed so callers and
    * specs set/restore one well-known key. */
  def requiredConf: (String, String) =
    ("spark.sql.streaming.stateStore.providerClass", rocksProvider)

  /** [[Stateful.statefulParDo]] on the native substrate: same
    * [[ParDoLogic]] contract — (key, elements, cells) → (next cells or
    * None, outputs) — with the name→deadline map held in a native
    * `MapState` and each DISTINCT deadline registered as its own native
    * timer. On expiry, every name whose deadline has passed fires in one
    * `onTimer` call (sorted, matching V1's multiplexed drain order).
    *
    * Deadlines already overdue at batch time drain at the HEAD of
    * `handleInputRows`, exactly as V1 drains them at the head of
    * `onElements` (and as the reference fires an eligible timer before
    * delivering the next bundle): an element arriving in the same
    * micro-batch after its key's deadline sees the post-timer state on
    * BOTH substrates — e.g. a Deduplicate element landing after its key's
    * TTL expiry is re-emitted, not dropped, so V1 ≡ V2 holds AT the TTL
    * boundary too. The native timer for a drained deadline still fires
    * later; its `handleExpiredTimer` finds nothing left and no-ops. */
  def statefulParDo[K, V, S, O](
      ds: Dataset[(K, V)],
      logic: ParDoLogic[K, V, S, O],
      timeMode: TimeMode = TimeMode.ProcessingTime())(
      implicit kEnc: Encoder[K], oEnc: Encoder[O],
      sEnc: Encoder[S]): Dataset[O] = {
    // the drain clock: batch processing time, or the watermark in the
    // event-time domain (computed once — the flag rides the task closure)
    val eventTime = timeMode == TimeMode.EventTime()

    val processor = new StatefulProcessor[K, (K, V), O] {
      @transient private var cell: ValueState[S] = _
      @transient private var tmrs: MapState[String, Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        cell = getHandle.getValueState[S]("cell", sEnc, TTLConfig.NONE)
        tmrs = getHandle.getMapState[String, Long]("timers",
          Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      }

      private def readTimers(): Timers =
        if (!tmrs.exists()) Timers.empty
        else Timers(tmrs.iterator().map { case (n, at) => n -> at }.toMap)

      /** Persist the callback's verdict: update/clear the cells, rewrite
        * the name→deadline map, and diff the DISTINCT deadlines against
        * what is natively armed (`prevArmed`) so stale timers are deleted
        * and new ones registered. */
      private def sync(prevArmed: Set[Long], next: Option[Cells[S]]): Unit =
        next match {
          case Some(c) =>
            cell.update(c.value)
            tmrs.clear()
            c.timers.deadlines.foreach { case (n, at) => tmrs.updateValue(n, at) }
            val armed = c.timers.deadlines.values.toSet
            (prevArmed -- armed).foreach(getHandle.deleteTimer)
            (armed -- prevArmed).foreach(getHandle.registerTimer)
          case None =>
            cell.clear()
            tmrs.clear()
            prevArmed.foreach(getHandle.deleteTimer)
        }

      override def handleInputRows(key: K, rows: Iterator[(K, V)],
          tv: TimerValues): Iterator[O] = {
        val timers = readTimers()
        val prevArmed = timers.deadlines.values.toSet
        // V1-parity drain (see the method scaladoc): deadlines overdue at
        // batch time fire BEFORE the batch's elements are delivered
        val nowMs = if (eventTime) tv.getCurrentWatermarkInMs()
                    else tv.getCurrentProcessingTimeInMs()
        val overdue = timers.fired(nowMs)
        val preCells = Cells(if (cell.exists()) cell.get() else logic.zero, timers)
        val (afterTimer, timerOut) =
          if (overdue.isEmpty) (Some(preCells), Seq.empty[O])
          else logic.onTimer(key, overdue,
            preCells.copy(timers = timers.afterFiring(nowMs)))
        val base = afterTimer.getOrElse(Cells(logic.zero, Timers.empty))
        val (next, out) = logic.onElements(key, rows.map(_._2).toSeq, base)
        sync(prevArmed, next)
        (timerOut ++ out).iterator
      }

      override def handleExpiredTimer(key: K, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[O] = {
        val expiry = info.getExpiryTimeInMs
        val timers = readTimers()
        // every name at-or-before the expiry fires together (V1's drain
        // contract); names sharing one deadline shared one native timer
        val fired = timers.fired(expiry)
        if (fired.isEmpty) Iterator.empty // a later-deadline co-expiry already drained
        else {
          val cells = Cells(if (cell.exists()) cell.get() else logic.zero,
            timers.afterFiring(expiry))
          val (next, out) = logic.onTimer(key, fired, cells)
          // the fired timer itself is consumed natively — only OTHER armed
          // deadlines participate in the delete/register diff
          sync(timers.deadlines.values.toSet - expiry, next)
          out.iterator
        }
      }
    }

    ds.groupByKey(_._1)
      .transformWithState[O](processor, timeMode, OutputMode.Append())
  }

  /** [[Stateful.deduplicate]] on the native substrate (same logic value). */
  def deduplicate[K, V](ds: Dataset[(K, V)], ttlMs: Long)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[V] = {
    implicit val sEnc: Encoder[Boolean] = Encoders.scalaBoolean
    statefulParDo(ds, Stateful.dedupLogic[K, V](ttlMs))
  }

  /** [[Stateful.countTriggered]] on the native substrate. */
  def countTriggered[K, V, A](ds: Dataset[(K, V)], zero: A, add: (A, V) => A,
      every: Int)(implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[(A, Int, Long)]): Dataset[(K, A, Long)] =
    statefulParDo(ds, Stateful.countLogic[K, V, A](zero, add, every))

  /** [[Stateful.processingTimeTriggered]] on the native substrate. */
  def processingTimeTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[(A, Long, Boolean)]): Dataset[(K, A, Long)] =
    statefulParDo(ds, Stateful.procTimeLogic[K, V, A](zero, add, delayMs))

  /** [[Stateful.firstOfTriggered]] on the native substrate. */
  def firstOfTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[(A, Int, Long)]): Dataset[(K, A, Long)] =
    statefulParDo(ds, Stateful.firstOfLogic[K, V, A](zero, add, every, delayMs))

  /** [[Stateful.allOfTriggered]] on the native substrate. */
  def allOfTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[(A, Int, Long, Boolean)]): Dataset[(K, A, Long)] =
    statefulParDo(ds, Stateful.allOfLogic[K, V, A](zero, add, every, delayMs))

  /** [[Stateful.orFinallyTriggered]] on the native substrate. */
  def orFinallyTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, total: Int)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long, Boolean)],
      sEnc: Encoder[(A, Int, Int, Long, Boolean)]): Dataset[(K, A, Long, Boolean)] =
    statefulParDo(ds, Stateful.orFinallyLogic[K, V, A](zero, add, every, total))

  /** [[Stateful.afterEachTriggered]] on the native substrate. */
  def afterEachTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, counts: Seq[Int])(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[(A, Int, Int)]): Dataset[(K, A, Long)] = {
    require(counts.nonEmpty && counts.forall(_ > 0),
      "afterEach needs a non-empty sequence of positive element counts")
    statefulParDo(ds, Stateful.afterEachLogic[K, V, A](zero, add, counts))
  }

  /** [[Stateful.groupIntoBatches]] on the native substrate — the buffer
    * moves into a real ListState cell (see
    * [[groupIntoBatchesListState]]). */
  def groupIntoBatches[K, V](ds: Dataset[(K, V)], batchSize: Int, maxWaitMs: Long)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V],
      outEnc: Encoder[(K, Seq[V])], vTag: TypeTag[V]): Dataset[(K, Seq[V])] =
    groupIntoBatchesListState(ds, batchSize, maxWaitMs)

  /** GroupIntoBatches with the buffer in a NATIVE ListState cell — the
    * state-cell shape the reference's BagState models
    * (sdk/state/StateSpecs.java `bag()`): appending an element is an
    * append to the cell, not a read-modify-write of a serialized Seq blob.
    * At a million buffered elements per hot key, V1 rewrites the whole
    * buffer every micro-batch; this WRITES only the delta. The per-bundle
    * READ (`buf.get()`, to test the batch boundary) remains O(buffer) —
    * the same cost profile as the reference's BagState-over-store. */
  def groupIntoBatchesListState[K, V](ds: Dataset[(K, V)], batchSize: Int,
      maxWaitMs: Long)(implicit kEnc: Encoder[K], vEnc: Encoder[V],
      outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] = {

    val processor = new StatefulProcessor[K, (K, V), (K, Seq[V])] {
      @transient private var buf: ListState[V] = _
      // the armed flush deadline (absent = no timer): one timer per
      // partial-batch EPOCH, so a deadline armed for an already-flushed
      // batch never cuts a later partial batch's maxWait short, and the
      // timer really is deleted when the buffer drains
      @transient private var armed: ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
        armed = getHandle.getValueState[Long]("armedAt",
          Encoders.scalaLong, TTLConfig.NONE)
      }

      override def handleInputRows(key: K, rows: Iterator[(K, V)],
          tv: TimerValues): Iterator[(K, Seq[V])] = {
        rows.foreach(r => buf.appendValue(r._2))
        val all = buf.get().toSeq
        val full = all.grouped(batchSize).filter(_.size == batchSize).toSeq
        val rest = all.drop(full.size * batchSize)
        if (full.nonEmpty) {
          buf.clear()
          rest.foreach(buf.appendValue)
        }
        // one flush timer per waiting partial batch (the reference's
        // buffering timer), managed by epoch:
        //  - buffer drained → delete the timer (nothing left to flush)
        //  - full batches flushed, remainder carried → the remainder is a
        //    NEW epoch (its elements arrived this bundle): re-arm at
        //    now + maxWait, deleting the flushed epoch's stale deadline
        //  - still accumulating → keep the existing deadline (maxWait
        //    counts from the epoch's FIRST element, not its latest)
        val prev = if (armed.exists()) Some(armed.get()) else None
        if (rest.isEmpty) {
          prev.foreach(getHandle.deleteTimer)
          if (prev.isDefined) armed.clear()
        } else if (full.nonEmpty || prev.isEmpty) {
          prev.foreach(getHandle.deleteTimer)
          val at = tv.getCurrentProcessingTimeInMs() + maxWaitMs
          getHandle.registerTimer(at)
          armed.update(at)
        }
        full.iterator.map(key -> _)
      }

      override def handleExpiredTimer(key: K, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[(K, Seq[V])] = {
        armed.clear()
        val rest = if (buf.exists()) buf.get().toSeq else Seq.empty
        buf.clear()
        if (rest.nonEmpty) Iterator(key -> rest) else Iterator.empty
      }
    }

    ds.groupByKey(_._1)
      .transformWithState[(K, Seq[V])](processor,
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** OrderedListState (reference sdk/state/OrderedListState.java): a
    * per-key timestamp-ordered value list with range reads and range
    * clears. Backed by a native ListState of (timestamp, value) — appends
    * are delta-writes; reads sort (stable, so equal timestamps keep
    * insertion order, the reference's contract); a range clear rewrites
    * the survivors (the same cost profile the reference's runners have —
    * OrderedListState is an interface over whatever the store offers). */
  final class OrderedList[V] private[StatefulV2] (state: ListState[(Long, V)]) {
    def add(ts: Long, v: V): Unit = state.appendValue((ts, v))
    def read(): Seq[(Long, V)] =
      (if (state.exists()) state.get().toSeq else Seq.empty).sortBy(_._1)
    /** Entries with `from <= ts < to`, timestamp-ordered. */
    def readRange(from: Long, to: Long): Seq[(Long, V)] =
      read().filter(e => e._1 >= from && e._1 < to)
    def clearRange(from: Long, to: Long): Unit = {
      val keep = (if (state.exists()) state.get().toSeq else Seq.empty)
        .filterNot(e => e._1 >= from && e._1 < to)
      state.clear()
      keep.foreach(state.appendValue)
    }
    def clear(): Unit = state.clear()
  }

  /** Obtain an [[OrderedList]] cell from a processor's handle (call from
    * `init`). */
  def orderedListState[V](processor: StatefulProcessor[_, _, _], name: String)(
      implicit vEnc: Encoder[V]): OrderedList[V] =
    new OrderedList[V](processor.getHandle.getListState[(Long, V)](
      name, Encoders.tuple(Encoders.scalaLong, vEnc), TTLConfig.NONE))

  /** The event-time SORTER OrderedListState exists for (reference pattern:
    * buffer out-of-order events per key, release them in timestamp order
    * as the watermark passes): elements buffer into an OrderedList; each
    * batch (re-)arms an event-time timer at the earliest buffered
    * timestamp; when the watermark crosses, every element at-or-before it
    * emits in order and the emitted range is cleared — later stragglers
    * keep their own timer. Emits (key, ts, value) in per-key event-time
    * order across micro-batches. */
  def eventTimeSorted[K, V](ds: Dataset[(K, java.sql.Timestamp, V)],
      watermarkDelay: String)(implicit kEnc: Encoder[K], vEnc: Encoder[V],
      outEnc: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] = {

    val processor = new StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Long, V)] {
      @transient private var buf: OrderedList[V] = _
      // the currently armed deadline: re-arming every bundle without
      // deleting would accumulate one live timer per bundle on a hot key
      // (spurious empty wakeups + timer-store growth)
      @transient private var armed: ValueState[Long] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit = {
        buf = orderedListState[V](this, "buf")
        armed = getHandle.getValueState[Long]("armedAt",
          Encoders.scalaLong, TTLConfig.NONE)
      }

      private def rearm(): Unit = {
        val want = buf.read().headOption.map(_._1)
        val have = if (armed.exists()) Some(armed.get()) else None
        if (want != have) {
          have.foreach(getHandle.deleteTimer)
          want match {
            case Some(at) => getHandle.registerTimer(at); armed.update(at)
            case None => armed.clear()
          }
        }
      }

      override def handleInputRows(key: K, rows: Iterator[(K, java.sql.Timestamp, V)],
          tv: TimerValues): Iterator[(K, Long, V)] = {
        rows.foreach(r => buf.add(r._2.getTime, r._3))
        rearm()
        Iterator.empty
      }

      override def handleExpiredTimer(key: K, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[(K, Long, V)] = {
        armed.clear() // the fired timer was consumed natively
        val wm = tv.getCurrentWatermarkInMs()
        val ready = buf.readRange(Long.MinValue, wm + 1)
        buf.clearRange(Long.MinValue, wm + 1)
        rearm()
        ready.iterator.map { case (ts, v) => (key, ts, v) }
      }
    }

    implicit val rowEnc: Encoder[(K, java.sql.Timestamp, V)] = ds.encoder
    ds.toDF("k", "event_time", "v")
      .withWatermark("event_time", watermarkDelay)
      .as[(K, java.sql.Timestamp, V)]
      .groupByKey(_._1)
      .transformWithState[(K, Long, V)](processor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The multi-timer case the V1 multiplexer can only approximate,
    * expressed directly (DoFn.java:475–540: two @TimerId fields in the
    * EVENT-time domain on one key): the key's first element arms BOTH
    * timers simultaneously — "a" at ts+delayAMs, "b" at ts+delayBMs — as
    * two independent native timers; each fires its own expiry callback as
    * the watermark crosses its deadline. Emits (key, timerName, expiryMs).
    * V1 would arm only min(a, b) and re-arm on wake-up — under one Spark
    * timeout the second deadline silently shifts if the first callback
    * stalls; natively the two are independent store entries. */
  def twoEventTimeTimers[K](ds: Dataset[(K, java.sql.Timestamp)],
      delayAMs: Long, delayBMs: Long, watermarkDelay: String)(
      implicit kEnc: Encoder[K]): Dataset[(K, String, Long)] = {

    val processor = new StatefulProcessor[K, (K, java.sql.Timestamp), (K, String, Long)] {
      @transient private var armed: MapState[Long, String] = _

      override def init(outputMode: OutputMode, tm: TimeMode): Unit =
        armed = getHandle.getMapState[Long, String]("armed",
          Encoders.scalaLong, Encoders.STRING, TTLConfig.NONE)

      override def handleInputRows(key: K, rows: Iterator[(K, java.sql.Timestamp)],
          tv: TimerValues): Iterator[(K, String, Long)] = {
        if (!armed.exists()) {
          val t0 = rows.map(_._2.getTime).min
          val atA = t0 + delayAMs
          val atB = t0 + delayBMs
          armed.updateValue(atA, "a")
          armed.updateValue(atB, "b")
          getHandle.registerTimer(atA) // two timers armed at once —
          getHandle.registerTimer(atB) // the native TimerMap, no min-heap
        } else rows.foreach(_ => ()) // later elements don't re-arm
        Iterator.empty
      }

      override def handleExpiredTimer(key: K, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[(K, String, Long)] = {
        val at = info.getExpiryTimeInMs
        val name = if (armed.containsKey(at)) armed.getValue(at) else return Iterator.empty
        armed.removeKey(at)
        Iterator((key, name, at))
      }
    }

    implicit val rowEnc: Encoder[(K, java.sql.Timestamp)] = ds.encoder
    implicit val outEnc: Encoder[(K, String, Long)] =
      Encoders.tuple(kEnc, Encoders.STRING, Encoders.scalaLong)
    ds.toDF("k", "event_time")
      .withWatermark("event_time", watermarkDelay)
      .as[(K, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState[(K, String, Long)](processor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
