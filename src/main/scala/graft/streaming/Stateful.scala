package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key processing (SURVEY.md §2.9): the reference's state &
  * timers API (sdk/state — ValueState/BagState/MapState/Timer, DoFn
  * @StateId/@TimerId) rebuilt on `flatMapGroupsWithState`.
  *
  * Design notes:
  *  - Beam exposes N named state cells per key; Spark exposes ONE state
  *    object per key. `Cells[S]` models Beam's cells as fields of S —
  *    same expressiveness, one serialized blob per key.
  *  - Beam allows N timers per key; Spark allows one timeout. `Timers`
  *    multiplexes: it keeps a name→deadline map in state and always arms
  *    the Spark timeout at the EARLIEST deadline; on wake-up, every timer
  *    whose deadline passed fires (the min-heap trick from the survey).
  *  - State is per key *and* window in Beam; encode the window in the
  *    grouping key to get the same scoping.
  *
  * At scale: state lives in the executor state store (RocksDB-backed on a
  * real cluster), partitioned by the grouping key — the same shuffle
  * placement as the aggregation itself, no extra exchange.
  */
object Stateful {

  /** Multiplexed named timers (≙ Beam TimerMap, sdk/state/TimerMap.java):
    * stored inside the user state; `nextDeadline` is what gets armed on
    * the single Spark timeout. Timestamps are epoch millis. */
  final case class Timers(deadlines: Map[String, Long]) {
    def set(name: String, at: Long): Timers = Timers(deadlines + (name -> at))
    def clear(name: String): Timers = Timers(deadlines - name)
    def nextDeadline: Option[Long] =
      if (deadlines.isEmpty) None else Some(deadlines.values.min)
    def fired(now: Long): Seq[String] =
      deadlines.collect { case (n, at) if at <= now => n }.toSeq.sorted
    def afterFiring(now: Long): Timers =
      Timers(deadlines.filter { case (_, at) => at > now })
  }
  object Timers { val empty: Timers = Timers(Map.empty) }

  /** State cells + timers for one key (≙ a DoFn's @StateId fields plus its
    * @TimerId map). */
  final case class Cells[S](value: S, timers: Timers)

  /** A stateful ParDo's key-local logic, independent of the substrate that
    * runs it. The SAME value drives [[Stateful.statefulParDo]]
    * (flatMapGroupsWithState: one state blob, one multiplexed timeout) and
    * [[StatefulV2.statefulParDo]] (transformWithState: native state cells,
    * one native timer per named deadline) — so the substrate equivalence
    * StatefulV2Spec pins holds by construction for everything above the
    * timer plumbing. */
  final case class ParDoLogic[K, V, S, O](
      zero: S,
      onElements: (K, Seq[V], Cells[S]) => (Option[Cells[S]], Seq[O]),
      onTimer: (K, Seq[String], Cells[S]) => (Option[Cells[S]], Seq[O]))
      extends Serializable

  /** Generic stateful ParDo over a keyed stream — the substrate for
    * GroupIntoBatches, TTL dedup, custom triggers, and NFA/CEP state
    * machines.
    *
    * @param onElements (key, new elements, cells) → (new cells or None to
    *                   clear, outputs). Runs once per key per micro-batch.
    * @param onTimer    (key, fired timer names, cells) → (new cells or
    *                   None, outputs). Runs when the earliest deadline
    *                   passes (processing-time domain).
    */
  def statefulParDo[K, V, S, O](
      ds: Dataset[(K, V)],
      zero: S,
      onElements: (K, Seq[V], Cells[S]) => (Option[Cells[S]], Seq[O]),
      onTimer: (K, Seq[String], Cells[S]) => (Option[Cells[S]], Seq[O]))(
      implicit kEnc: Encoder[K], oEnc: Encoder[O],
      sEnc: Encoder[Cells[S]]): Dataset[O] = {

    def advance(key: K, values: Iterator[(K, V)],
        state: GroupState[Cells[S]]): Iterator[O] = {
      val cells = state.getOption.getOrElse(Cells(zero, Timers.empty))
      val (next, out) =
        if (state.hasTimedOut) {
          val now = System.currentTimeMillis()
          val fired = cells.timers.fired(now)
          val (c2, o) = onTimer(key, fired,
            cells.copy(timers = cells.timers.afterFiring(now)))
          (c2, o)
        } else {
          // Spark invokes hasTimedOut only for keys with NO data in the
          // micro-batch, so a continuously-hot key would never drain its
          // deadlines. Beam fires an eligible timer before delivering the
          // next bundle; mirror that by draining overdue deadlines here,
          // then processing the batch's elements against the post-timer
          // state (zero state if the timer callback cleared it).
          val now = System.currentTimeMillis()
          val overdue = cells.timers.fired(now)
          val (afterTimer, timerOut) =
            if (overdue.isEmpty) (Some(cells), Seq.empty[O])
            else onTimer(key, overdue,
              cells.copy(timers = cells.timers.afterFiring(now)))
          val (c2, o) = onElements(key, values.map(_._2).toSeq,
            afterTimer.getOrElse(Cells(zero, Timers.empty)))
          (c2, timerOut ++ o)
        }
      next match {
        case Some(c) =>
          state.update(c)
          // single Spark timeout armed at the earliest multiplexed deadline
          c.timers.nextDeadline.foreach { at =>
            state.setTimeoutDuration(math.max(1L, at - System.currentTimeMillis()))
          }
        case None => state.remove()
      }
      out.iterator
    }

    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(advance)
  }

  /** Key-local logic of [[deduplicate]] (substrate-shared, see
    * [[ParDoLogic]]). */
  private[streaming] def dedupLogic[K, V](ttlMs: Long): ParDoLogic[K, V, Boolean, V] =
    ParDoLogic(
      zero = false,
      onElements = (_, elems, cells) =>
        if (cells.value) (Some(cells), Seq.empty) // seen: drop, keep TTL
        else (Some(Cells(true, Timers.empty.set("ttl", System.currentTimeMillis() + ttlMs))),
          elems.headOption.toSeq),
      onTimer = (_, _, _) => (None, Seq.empty)) // TTL expired: clear state

  /** Keyed streaming Deduplicate with TTL (transforms/Deduplicate.java:68):
    * first element per key is emitted; repeats within `ttlMs` are dropped;
    * state self-expires so unbounded key spaces don't accumulate. */
  def deduplicate[K, V](ds: Dataset[(K, V)], ttlMs: Long)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[V] = {
    implicit val cellsEnc: Encoder[Cells[Boolean]] = Encoders.product[Cells[Boolean]]
    val l = dedupLogic[K, V](ttlMs)
    statefulParDo[K, V, Boolean, V](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Count-based early firing (trigger subset: AfterPane.elementCountAtLeast
    * composed under Repeatedly, ACCUMULATING mode — transforms/windowing/
    * AfterPane.java): emits a pane with the RUNNING aggregate every
    * `every` elements per key, labeled with a pane index (≙ PaneInfo's
    * pane index for speculative EARLY panes). Downstream consumers read
    * the latest pane per key; the final on-watermark pane is the ordinary
    * windowed aggregation this runs alongside. */
  def countTriggered[K, V, A](ds: Dataset[(K, V)], zero: A, add: (A, V) => A,
      every: Int)(implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[Cells[(A, Int, Long)]]): Dataset[(K, A, Long)] = {
    val l = countLogic[K, V, A](zero, add, every)
    statefulParDo[K, V, (A, Int, Long), (K, A, Long)](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[countTriggered]] (substrate-shared). */
  private[streaming] def countLogic[K, V, A](zero: A, add: (A, V) => A,
      every: Int): ParDoLogic[K, V, (A, Int, Long), (K, A, Long)] =
    ParDoLogic(
      zero = (zero, 0, 0L),
      onElements = (k, elems, cells) => {
        var (acc, sinceEmit, pane) = cells.value
        val out = Seq.newBuilder[(K, A, Long)]
        elems.foreach { v =>
          acc = add(acc, v)
          sinceEmit += 1
          if (sinceEmit >= every) {
            out += ((k, acc, pane))
            pane += 1
            sinceEmit = 0
          }
        }
        (Some(Cells((acc, sinceEmit, pane), Timers.empty)), out.result())
      },
      onTimer = (_, _, _) => (None, Seq.empty))

  /** Processing-time early firing (AfterProcessingTime.pastFirstElementInPane
    * ().plusDelayOf(delay) under Repeatedly, ACCUMULATING mode —
    * transforms/windowing/AfterProcessingTime.java): the first element of
    * a pane arms a processing-time timer `delayMs` out; when it fires, the
    * RUNNING aggregate is emitted as a speculative pane (with pane index)
    * and the next element starts a new pane. Elements arriving while the
    * timer is armed just accumulate — exactly the reference's
    * pastFirstElementInPane semantics. Runs alongside the ordinary
    * on-watermark windowed aggregation, which stays the final pane. */
  def processingTimeTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[Cells[(A, Long, Boolean)]]): Dataset[(K, A, Long)] = {
    val l = procTimeLogic[K, V, A](zero, add, delayMs)
    statefulParDo[K, V, (A, Long, Boolean), (K, A, Long)](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[processingTimeTriggered]] (substrate-shared). */
  private[streaming] def procTimeLogic[K, V, A](zero: A, add: (A, V) => A,
      delayMs: Long): ParDoLogic[K, V, (A, Long, Boolean), (K, A, Long)] =
    ParDoLogic(
      zero = (zero, 0L, false),
      onElements = (k, elems, cells) => {
        val (acc0, pane, _) = cells.value
        val acc = elems.foldLeft(acc0)(add)
        // first element of this pane arms the timer; later ones accumulate
        val timers =
          if (cells.timers.deadlines.contains("pane")) cells.timers
          else cells.timers.set("pane", System.currentTimeMillis() + delayMs)
        (Some(Cells((acc, pane, true), timers)), Seq.empty)
      },
      onTimer = (k, _, cells) => {
        val (acc, pane, dirty) = cells.value
        if (dirty) // emit the speculative pane, start the next one
          (Some(Cells((acc, pane + 1, false), cells.timers)), Seq((k, acc, pane)))
        else (Some(cells), Seq.empty)
      })

  /** AfterFirst(AfterPane.elementCountAtLeast(n),
    * AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)) under
    * Repeatedly (transforms/windowing/AfterFirst.java): a pane fires on
    * WHICHEVER sub-trigger satisfies first — the nth element emits
    * immediately and disarms the pane timer; otherwise the d-delay timer
    * armed by the pane's first element emits what accumulated.
    * Accumulating panes with indices, like the two sub-triggers alone. */
  def firstOfTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[Cells[(A, Int, Long)]]): Dataset[(K, A, Long)] = {
    val l = firstOfLogic[K, V, A](zero, add, every, delayMs)
    statefulParDo[K, V, (A, Int, Long), (K, A, Long)](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[firstOfTriggered]] (substrate-shared). */
  private[streaming] def firstOfLogic[K, V, A](zero: A, add: (A, V) => A,
      every: Int, delayMs: Long): ParDoLogic[K, V, (A, Int, Long), (K, A, Long)] =
    ParDoLogic(
      zero = (zero, 0, 0L),
      onElements = (k, elems, cells) => {
        var (acc, sinceEmit, pane) = cells.value
        var timers = cells.timers
        val out = Seq.newBuilder[(K, A, Long)]
        elems.foreach { v =>
          if (sinceEmit == 0) // first element of this pane arms the clock
            timers = timers.set("pane", System.currentTimeMillis() + delayMs)
          acc = add(acc, v)
          sinceEmit += 1
          if (sinceEmit >= every) { // count side satisfied first
            out += ((k, acc, pane))
            pane += 1
            sinceEmit = 0
            timers = timers.clear("pane")
          }
        }
        (Some(Cells((acc, sinceEmit, pane), timers)), out.result())
      },
      onTimer = (k, _, cells) => {
        val (acc, sinceEmit, pane) = cells.value
        if (sinceEmit > 0) // time side satisfied first: flush the open pane
          (Some(Cells((acc, 0, pane + 1), cells.timers)), Seq((k, acc, pane)))
        else (Some(cells), Seq.empty)
      })

  /** AfterAll(AfterPane.elementCountAtLeast(n),
    * AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)) under
    * Repeatedly (transforms/windowing/AfterAll.java): a pane fires only
    * once BOTH sub-triggers are satisfied — at least `every` elements
    * accumulated AND `delayMs` elapsed since the pane's first element.
    * Whichever side satisfies second delivers the pane: the timer firing
    * with the count already met emits immediately; elements arriving after
    * the timer fired emit as soon as the count fills. Joint satisfaction
    * is a persisted flag per side (the reference tracks exactly this via
    * each sub-trigger's finished bit in its trigger state machine). */
  def allOfTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, delayMs: Long)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[Cells[(A, Int, Long, Boolean)]]): Dataset[(K, A, Long)] = {
    val l = allOfLogic[K, V, A](zero, add, every, delayMs)
    statefulParDo[K, V, (A, Int, Long, Boolean), (K, A, Long)](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[allOfTriggered]] (substrate-shared). */
  private[streaming] def allOfLogic[K, V, A](zero: A, add: (A, V) => A,
      every: Int, delayMs: Long): ParDoLogic[K, V, (A, Int, Long, Boolean), (K, A, Long)] =
    ParDoLogic(
      zero = (zero, 0, 0L, false),
      onElements = (k, elems, cells) => {
        var (acc, sinceEmit, pane, timeSat) = cells.value
        var timers = cells.timers
        val out = Seq.newBuilder[(K, A, Long)]
        elems.foreach { v =>
          if (sinceEmit == 0) { // first element of this pane arms the clock
            timers = timers.set("pane", System.currentTimeMillis() + delayMs)
            timeSat = false
          }
          acc = add(acc, v)
          sinceEmit += 1
          if (sinceEmit >= every && timeSat) { // count side satisfied second
            out += ((k, acc, pane))
            pane += 1
            sinceEmit = 0
            timers = timers.clear("pane")
          }
        }
        (Some(Cells((acc, sinceEmit, pane, timeSat), timers)), out.result())
      },
      onTimer = (k, _, cells) => {
        val (acc, sinceEmit, pane, _) = cells.value
        if (sinceEmit >= every) // time side satisfied second: deliver now
          (Some(Cells((acc, 0, pane + 1, false), cells.timers)), Seq((k, acc, pane)))
        else // time satisfied first: remember and wait for the count
          (Some(Cells((acc, sinceEmit, pane, true), cells.timers)), Seq.empty)
      })

  /** Repeatedly.forever(AfterPane.elementCountAtLeast(every))
    * .orFinally(AfterPane.elementCountAtLeast(total))
    * (transforms/windowing/OrFinallyTrigger.java): speculative count-based
    * panes repeat until the `until` side — a total element count — is
    * satisfied; that delivers one last pane flagged `isFinal` (≙
    * PaneInfo.isLast) and permanently closes the key. Elements arriving
    * after the close are discarded, mirroring a finished trigger state
    * machine: the reference never fires a finished trigger again, and the
    * closed marker persisting in state is exactly its finished bit. */
  def orFinallyTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, every: Int, total: Int)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long, Boolean)],
      sEnc: Encoder[Cells[(A, Int, Int, Long, Boolean)]]): Dataset[(K, A, Long, Boolean)] = {
    val l = orFinallyLogic[K, V, A](zero, add, every, total)
    statefulParDo[K, V, (A, Int, Int, Long, Boolean), (K, A, Long, Boolean)](
      ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[orFinallyTriggered]] (substrate-shared). */
  private[streaming] def orFinallyLogic[K, V, A](zero: A, add: (A, V) => A,
      every: Int, total: Int): ParDoLogic[K, V, (A, Int, Int, Long, Boolean), (K, A, Long, Boolean)] =
    ParDoLogic(
      zero = (zero, 0, 0, 0L, false),
      onElements = (k, elems, cells) => {
        var (acc, sinceEmit, seen, pane, closed) = cells.value
        val out = Seq.newBuilder[(K, A, Long, Boolean)]
        elems.foreach { v =>
          if (!closed) {
            acc = add(acc, v)
            sinceEmit += 1
            seen += 1
            if (seen >= total) { // the until-side: final pane, then close
              out += ((k, acc, pane, true))
              pane += 1
              closed = true
            } else if (sinceEmit >= every) { // the repeated inner trigger
              out += ((k, acc, pane, false))
              pane += 1
              sinceEmit = 0
            }
          }
        }
        (Some(Cells((acc, sinceEmit, seen, pane, closed), cells.timers)), out.result())
      },
      onTimer = (_, _, _) => (None, Seq.empty))

  /** AfterEach.inOrder(AfterPane.elementCountAtLeast(c1), …, (cn))
    * (transforms/windowing/AfterEach.java): sub-triggers govern panes IN
    * SEQUENCE — pane i fires once c(i) elements accumulate, then control
    * advances to sub-trigger i+1; when the last finishes the whole
    * composite is finished and later elements no longer fire (the
    * sequence position persisting in state is the reference's
    * subTriggerIndex). Accumulating panes, like the other triggers. */
  def afterEachTriggered[K, V, A](ds: Dataset[(K, V)], zero: A,
      add: (A, V) => A, counts: Seq[Int])(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, A, Long)],
      sEnc: Encoder[Cells[(A, Int, Int)]]): Dataset[(K, A, Long)] = {
    require(counts.nonEmpty && counts.forall(_ > 0),
      "afterEach needs a non-empty sequence of positive element counts")
    val l = afterEachLogic[K, V, A](zero, add, counts)
    statefulParDo[K, V, (A, Int, Int), (K, A, Long)](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[afterEachTriggered]] (substrate-shared). */
  private[streaming] def afterEachLogic[K, V, A](zero: A, add: (A, V) => A,
      counts: Seq[Int]): ParDoLogic[K, V, (A, Int, Int), (K, A, Long)] =
    ParDoLogic(
      zero = (zero, 0, 0),
      onElements = (k, elems, cells) => {
        var (acc, sinceEmit, idx) = cells.value
        val out = Seq.newBuilder[(K, A, Long)]
        elems.foreach { v =>
          if (idx < counts.length) { // a finished sequence never fires again
            acc = add(acc, v)
            sinceEmit += 1
            if (sinceEmit >= counts(idx)) {
              out += ((k, acc, idx.toLong))
              idx += 1
              sinceEmit = 0
            }
          }
        }
        (Some(Cells((acc, sinceEmit, idx), cells.timers)), out.result())
      },
      onTimer = (_, _, _) => (None, Seq.empty))

  /** Per-(key, window) pane state for [[lateFiringPanes]]. */
  final case class WindowPanes[A](acc: A, paneIndex: Long, onTimeFired: Boolean)

  /** AfterWatermark.pastEndOfWindow().withLateFirings(AfterPane
    * .elementCountAtLeast(1)) with allowed lateness — the reference's
    * on-time + late pane semantics (transforms/windowing/AfterWatermark
    * .java, ReduceFnRunner's onTrigger/onGc paths), which plain Structured
    * Streaming aggregation cannot express (it DROPS post-watermark rows;
    * no late pane exists). Rebuilt on flatMapGroupsWithState with an
    * EVENT-time timeout: FMGWS receives late rows (only aggregations
    * filter them), so the window's state is held past the watermark for
    * `allowedLatenessMs` and late arrivals re-fire the pane.
    *
    * Per (key, tumbling window): elements accumulate until the watermark
    * passes the window end, which fires the ON_TIME pane (FIRE_IF_NON_EMPTY,
    * the reference default); each late element batch then fires a LATE pane
    * with the updated accumulating value and a rising pane index (≙
    * PaneInfo.getIndex/getTiming); past end + allowedLateness the state is
    * garbage-collected and further elements are dropped — exactly the
    * reference's window-expiry contract. A pending unfired pane at GC is
    * flushed, never silently dropped.
    *
    * Output rows: (key, windowStartMs, value, paneIndex, timing) with
    * timing ∈ {ON_TIME, LATE}.
    *
    * Implementation note: Spark's flatMapGroupsWithState under
    * EventTimeTimeout FILTERS input rows older than the watermark —
    * exactly the drop this operator exists to avoid — so the event-time
    * logic runs on `getCurrentWatermarkMs()` with a PROCESSING-time
    * timeout serving only as the liveness poll that notices watermark
    * crossings for quiet keys (Spark itself evaluates event-time timeouts
    * once per batch; the poll is the same cadence made explicit).
    *
    * At scale: state is one accumulator per open (key, window), partitioned
    * by the grouping key in the executor state store; the watermark GC
    * bounds the open-window count exactly as the reference's
    * ReduceFnRunner does. */
  def lateFiringPanes[K, V, A](
      ds: Dataset[(K, java.sql.Timestamp, V)],
      windowMs: Long, allowedLatenessMs: Long, watermarkDelay: String,
      zero: A, add: (A, V) => A, pollMs: Long = 500L)(
      implicit kwEnc: Encoder[(K, Long)],
      rowEnc: Encoder[(K, java.sql.Timestamp, V)],
      outEnc: Encoder[(K, Long, A, Long, String)],
      sEnc: Encoder[WindowPanes[A]]): Dataset[(K, Long, A, Long, String)] = {

    def advance(key: (K, Long), rows: Iterator[(K, java.sql.Timestamp, V)],
        state: GroupState[WindowPanes[A]]): Iterator[(K, Long, A, Long, String)] = {
      val (k, winStart) = key
      val winEnd = winStart + windowMs
      val gcAt = winEnd + allowedLatenessMs
      val wm = state.getCurrentWatermarkMs()
      if (state.hasTimedOut) {
        state.getOption match {
          case None => Iterator.empty
          case Some(st) if wm >= gcAt =>
            // window expiry: flush a pending unfired pane, then GC the state
            val out = if (!st.onTimeFired)
              Iterator((k, winStart, st.acc, st.paneIndex, "ON_TIME"))
            else Iterator.empty
            state.remove()
            out
          case Some(st) =>
            // poll tick: fire ON_TIME once the watermark crosses the end
            val out = if (wm >= winEnd && !st.onTimeFired) {
              state.update(WindowPanes(st.acc, st.paneIndex + 1, onTimeFired = true))
              Iterator((k, winStart, st.acc, st.paneIndex, "ON_TIME"))
            } else Iterator.empty
            state.setTimeoutDuration(pollMs)
            out
        }
      } else if (wm >= gcAt) {
        // Expired window: the elements themselves are past allowed lateness
        // and dropped, but any existing state must still be GC'd here —
        // Spark clears the timeout on every invocation, so if this branch
        // returned without acting the poll would never fire again and the
        // (key, window) entry would leak. Mirror the timed-out GC path:
        // flush a pending unfired ON_TIME pane, then remove.
        state.getOption match {
          case Some(st) =>
            val out = if (!st.onTimeFired)
              Iterator((k, winStart, st.acc, st.paneIndex, "ON_TIME"))
            else Iterator.empty
            state.remove()
            out
          case None => Iterator.empty
        }
      } else if (wm < winEnd) {
        // open window: accumulate; the poll notices the on-time crossing
        val st = state.getOption.getOrElse(WindowPanes(zero, 0L, onTimeFired = false))
        state.update(st.copy(acc = rows.foldLeft(st.acc)((a, r) => add(a, r._3))))
        state.setTimeoutDuration(pollMs)
        Iterator.empty
      } else {
        // late data (wm past end, within lateness). A hot key's poll may
        // not have run yet, so fire the overdue ON_TIME pane here first
        // (with only its pre-watermark accumulation), then this batch's
        // stragglers as a LATE pane — ReduceFnRunner's timer-before-bundle
        // ordering.
        val had = state.exists
        var st = state.getOption.getOrElse(WindowPanes(zero, 0L, onTimeFired = false))
        val out = Seq.newBuilder[(K, Long, A, Long, String)]
        if (!st.onTimeFired) {
          if (had) { // pre-watermark data exists: its ON_TIME pane is overdue
            out += ((k, winStart, st.acc, st.paneIndex, "ON_TIME"))
            st = WindowPanes(st.acc, st.paneIndex + 1, onTimeFired = true)
          } else st = st.copy(onTimeFired = true) // FIRE_IF_NON_EMPTY: no empty pane
        }
        val acc = rows.foldLeft(st.acc)((a, r) => add(a, r._3))
        out += ((k, winStart, acc, st.paneIndex, "LATE"))
        state.update(WindowPanes(acc, st.paneIndex + 1, onTimeFired = true))
        state.setTimeoutDuration(pollMs)
        out.result().iterator
      }
    }

    import org.apache.spark.sql.functions.col
    ds.toDF("k", "event_time", "v")
      .withWatermark("event_time", watermarkDelay)
      .as[(K, java.sql.Timestamp, V)]
      .groupByKey(r => (r._1, Math.floorDiv(r._2.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(advance)
  }

  /** GroupIntoBatches (transforms/GroupIntoBatches.java:59): per-key
    * batches of `batchSize`, flushed early after `maxWaitMs` of
    * inactivity (the flush timer is the reference's buffering timer). */
  def groupIntoBatches[K, V](ds: Dataset[(K, V)], batchSize: Int, maxWaitMs: Long)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V],
      outEnc: Encoder[(K, Seq[V])], vTag: TypeTag[V]): Dataset[(K, Seq[V])] = {
    implicit val cellsEnc: Encoder[Cells[Seq[V]]] = Encoders.product[Cells[Seq[V]]]
    val l = batchesLogic[K, V](batchSize, maxWaitMs)
    statefulParDo[K, V, Seq[V], (K, Seq[V])](ds, l.zero, l.onElements, l.onTimer)
  }

  /** Key-local logic of [[groupIntoBatches]] (substrate-shared). */
  private[streaming] def batchesLogic[K, V](batchSize: Int,
      maxWaitMs: Long): ParDoLogic[K, V, Seq[V], (K, Seq[V])] =
    ParDoLogic(
      zero = Seq.empty,
      onElements = (key, elems, cells) => {
        val buf = cells.value ++ elems
        val full = buf.grouped(batchSize).filter(_.size == batchSize).toSeq
        val rest = buf.drop(full.size * batchSize)
        val timers =
          if (rest.nonEmpty) Timers.empty.set("flush", System.currentTimeMillis() + maxWaitMs)
          else Timers.empty
        (Some(Cells(rest, timers)), full.map(key -> _))
      },
      onTimer = (key, _, cells) =>
        (None, if (cells.value.nonEmpty) Seq(key -> cells.value) else Seq.empty))
}
