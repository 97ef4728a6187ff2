package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One keyed input event (the operator's API record — `ts` is top-level so
  * `withWatermark` can tag it). Full-precision ts is preserved end to end:
  * `events.ts` is microsecond parquet and the emitted run boundaries must
  * byte-match the SQL oracle.
  */
case class KeyedEv(user_id: Long, event_id: Long, ts: Timestamp, is_error: Boolean)

/** One event inside per-key state (key held by the group). */
case class BurstEv(event_id: Long, ts: Timestamp, is_error: Boolean)

/** An open (or closed) run of consecutive matching events; len == 0 means
  * no open run.
  */
case class BurstRun(len: Long, firstId: Long, lastId: Long,
                    startTs: Timestamp, endTs: Timestamp)

/** Per-user detector state: events not yet provably complete (buffered
  * until the watermark passes them), the run open at the completed prefix's
  * end, and last activity for eviction.
  */
case class BurstState(buffer: Seq[BurstEv], run: BurstRun, maxTs: Long)

/** An emitted burst: `minRun`-or-longer maximal run of consecutive matching
  * events for one user.
  */
case class BurstOut(user_id: Long, run_len: Long,
                    first_event_id: Long, last_event_id: Long,
                    start_ts: Timestamp, end_ts: Timestamp)

/** CEP sequence-pattern detection as a stateful streaming operator: maximal
  * runs of >= minRun CONSECUTIVE matching events (e.g. `event_type =
  * 'error'`) per key, in EVENT-TIME order. The batch gaps-and-islands query
  * (q_cep_error_burst) is this operator run with `NoTimeout` — the oracle
  * pins the core's semantics, and the streaming flavor is asserted equal in
  * the test suite (same pattern as OrderRepair / StreamDedup).
  *
  * Ordering under out-of-order arrival: "consecutive" is only decidable on
  * the watermark-complete prefix, so arrivals buffer in state and are
  * processed in (ts, event_id) order strictly below the current watermark;
  * the run open at the prefix boundary stays open in state until the next
  * ordered event (or eviction) closes it. Events at or above the watermark
  * millisecond stay buffered — a later arrival may still sort before them.
  *
  * Scale: state per key is O(out-of-orderness) + one open run, evicted by
  * event-time timeout — the same bounded-state contract as OrderRepair;
  * partitioned by user key, no global sort.
  */
object Burst {

  private val NoRun = BurstRun(0L, 0L, 0L, null, null)

  private def evOrd(e: BurstEv): (Long, Int, Long) =
    (e.ts.getTime, e.ts.getNanos, e.event_id)

  /** Feed ordered complete events through the run machine; returns closed
    * qualifying runs and the run left open at the end.
    */
  private def advance(userId: Long, minRun: Int, run0: BurstRun,
                      ordered: Seq[BurstEv]): (Vector[BurstOut], BurstRun) = {
    val out = Vector.newBuilder[BurstOut]
    var run = run0
    def close(): Unit = {
      if (run.len >= minRun)
        out += BurstOut(userId, run.len, run.firstId, run.lastId,
          run.startTs, run.endTs)
      run = NoRun
    }
    ordered.foreach { e =>
      if (e.is_error) {
        run =
          if (run.len == 0L) BurstRun(1L, e.event_id, e.event_id, e.ts, e.ts)
          else BurstRun(run.len + 1, run.firstId, e.event_id, run.startTs, e.ts)
      } else close()
    }
    (out.result(), run)
  }

  private def closeFinal(userId: Long, minRun: Int,
                         run: BurstRun): Iterator[BurstOut] =
    if (run.len >= minRun)
      Iterator.single(BurstOut(userId, run.len, run.firstId, run.lastId,
        run.startTs, run.endTs))
    else Iterator.empty

  private def core(streaming: Boolean, gapMs: Long, minRun: Int)(
      key: Long, keyedRows: Iterator[KeyedEv],
      state: GroupState[BurstState]): Iterator[BurstOut] = {
    // group VALUES stay KeyedEv: a mapValues projection would rebuild `ts`
    // from the object and lose the watermark tag Append mode requires
    val rows = keyedRows.map(e => BurstEv(e.event_id, e.ts, e.is_error))

    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      val (closed, open) =
        advance(key, minRun, st.run, st.buffer.sortBy(evOrd))
      return closed.iterator ++ closeFinal(key, minRun, open)
    }

    val st = state.getOption.getOrElse(BurstState(Nil, NoRun, Long.MinValue))
    var maxTs = st.maxTs
    val arrived = rows.toVector
    arrived.foreach { e => if (e.ts.getTime > maxTs) maxTs = e.ts.getTime }
    val buffer = st.buffer ++ arrived

    if (streaming) {
      // Complete prefix = strictly below the watermark MILLISECOND: an event
      // whose truncated ms equals the watermark may still be preceded by a
      // later arrival in the same millisecond (ts > watermark, smaller id).
      val wm = state.getCurrentWatermarkMs()
      val (ready, pending) = buffer.partition(_.ts.getTime < wm)
      val (closed, open) = advance(key, minRun, st.run, ready.sortBy(evOrd))
      state.update(BurstState(pending, open, maxTs))
      state.setTimeoutTimestamp(math.max(maxTs + gapMs, wm + 1))
      closed.iterator
    } else {
      // Batch: one invocation per key — end-of-data is the final watermark.
      state.remove()
      val (closed, open) = advance(key, minRun, st.run, buffer.sortBy(evOrd))
      closed.iterator ++ closeFinal(key, minRun, open)
    }
  }

  private implicit val evEnc = Encoders.product[BurstEv]
  private implicit val outEnc = Encoders.product[BurstOut]
  private implicit val stateEnc = Encoders.product[BurstState]
  private implicit val keyEnc = Encoders.scalaLong

  /** Batch flavor (the driver-oracle target, q_cep_error_burst). */
  def batch(ds: Dataset[KeyedEv], minRun: Int = 3): Dataset[BurstOut] =
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        core(streaming = false, gapMs = 0L, minRun))

  /** Streaming flavor: caller must have applied `withWatermark("ts", …)`;
    * `gapMs` is how long a key's state outlives its last activity before
    * eviction closes any open run.
    */
  def streaming(ds: Dataset[KeyedEv], gapMs: Long,
                minRun: Int = 3): Dataset[BurstOut] =
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        core(streaming = true, gapMs = gapMs, minRun))
}
