package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** A turn with source position (provenance, the reference's
  * `Record.Position`) — the unit flowing through the stateful operators.
  */
case class TurnPos(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    pos: Long
)

/** Per-conversation order-repair state: next contiguous index to emit plus
  * the buffered out-of-order turns (the north star's "sorted-map state over
  * turn_idx"). Duplicates resolve min-pos-first — deterministic under any
  * partitioning, matching the reference Unique handler's sequential
  * first-wins (reference: src/Shipwright.Core/Dataflows/Transformations/
  * Unique.cs:89-93) without depending on arrival order.
  */
case class RepairState(nextIdx: Int, buffer: Map[Int, TurnPos], maxTs: Long)

/** Per-conversation stateful validation + turn-order repair
  * (`flatMapGroupsWithState`): buffers out-of-order turns in a per-key
  * sorted map, emits contiguous runs of `turn_idx` from 0, dedups by
  * (conv_id, turn_idx) keeping the min-pos occurrence.
  *
  * Streaming: `EventTimeTimeout` — when the watermark passes the
  * conversation's last activity + `gapMs`, the state times out; `strict`
  * decides whether the gapped suffix is dropped (strict) or flushed in
  * sorted order (repair what you can once nothing earlier can arrive).
  *
  * Batch: the same function runs with `NoTimeout` (one invocation per key,
  * empty initial state) — end-of-iterator plays the role of the final
  * watermark, so batch output == streaming output for the same input. That
  * equivalence is the correctness gate: the batch flavor is oracle-checked
  * in SQL, the streaming flavor is asserted equal to it in the test suites.
  *
  * Scale: state per key is O(max out-of-orderness), not O(conversation
  * length) — emitted turns leave the buffer immediately, and the watermark
  * evicts idle conversations, so state survives 10^12-turn streams as long
  * as disorder is bounded.
  */
object OrderRepair {

  def repairFn(strict: Boolean, streaming: Boolean, gapMs: Long)(
      key: String, rows: Iterator[TurnPos], state: GroupState[RepairState]): Iterator[TurnPos] = {

    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      return if (strict) Iterator.empty
      else st.buffer.toSeq.sortBy(_._1).map(_._2).iterator
    }

    val st = state.getOption.getOrElse(RepairState(0, Map.empty, Long.MinValue))
    // Hot loop: mutable buffer per invocation (an immutable Map.updated per
    // row allocates a trie node per turn — measurable GC churn at millions
    // of rows per micro-batch); converted back to immutable only for the
    // state encoder.
    val buf = scala.collection.mutable.HashMap.empty[Int, TurnPos]
    buf ++= st.buffer
    var maxTs = st.maxTs
    rows.foreach { r =>
      val t = r.ts.getTime
      if (t > maxTs) maxTs = t
      if (r.turn_idx >= st.nextIdx) {
        val prev = buf.getOrElse(r.turn_idx, null)
        if (prev == null || prev.pos > r.pos) buf.update(r.turn_idx, r) // min-pos wins
      } // else: duplicate of an already-emitted turn — reference flags these
        // via UniqueFlag; the repair operator simply never re-emits a key.
    }

    val emitted = Vector.newBuilder[TurnPos]
    var next = st.nextIdx
    var run = true
    while (run) {
      buf.remove(next) match {
        case Some(t) => emitted += t; next += 1
        case None => run = false
      }
    }

    if (streaming) {
      state.update(RepairState(next, buf.toMap, maxTs))
      // Evict once the watermark passes last activity + gap. A conversation
      // whose last event is already behind the advanced watermark (possible
      // with unordered file ingestion) must still get a FUTURE timeout —
      // Spark rejects timestamps at or before the current watermark.
      state.setTimeoutTimestamp(
        math.max(maxTs + gapMs, state.getCurrentWatermarkMs() + 1))
      emitted.result().iterator
    } else {
      // Batch: single invocation — end-of-data == final watermark.
      state.remove()
      val tail =
        if (strict) Iterator.empty
        else buf.toSeq.sortBy(_._1).map(_._2).iterator
      emitted.result().iterator ++ tail
    }
  }

  private implicit val turnPosEnc = Encoders.product[TurnPos]
  private implicit val stateEnc = Encoders.product[RepairState]
  private implicit val keyEnc = Encoders.STRING

  /** Batch flavor (also the oracle target). */
  def batch(ds: Dataset[TurnPos], strict: Boolean): Dataset[TurnPos] =
    ds.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        repairFn(strict, streaming = false, gapMs = 0L))

  /** Streaming flavor: caller must have applied `withWatermark("ts", …)`. */
  def streaming(ds: Dataset[TurnPos], strict: Boolean, gapMs: Long): Dataset[TurnPos] =
    ds.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        repairFn(strict, streaming = true, gapMs = gapMs))
}
