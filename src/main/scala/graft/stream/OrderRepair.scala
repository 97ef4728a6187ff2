package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A turn with source position (provenance, the reference's
  * `Record.Position`) — the friendly typed record for the stateful
  * operators.
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

/** The HOT-PATH record: identical content, packed for the typed
  * `flatMapGroupsWithState` boundary. Every micro-batch deserializes and
  * re-serializes each row crossing that boundary; with [[TurnPos]] that
  * means four UTF-8→UTF-16 String decodes per row (text dominating — the
  * memory-bandwidth ceiling BASELINE.md finding 4 measured). Here the
  * payload fields stay raw UTF-8 bytes: a copy, no decode, half the bytes
  * for ASCII text. `conv_id` stays String (it is the grouping key; byte
  * arrays compare by reference) and `ts` stays a timestamp — the watermark
  * tag must survive into the operator's child output for event-time
  * timeouts, which rules out projecting it to epoch micros.
  */
case class TurnPacked(
    conv_id: String,
    turn_idx: Int,
    role: Array[Byte],
    text: Array[Byte],
    tool: Array[Byte],
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
case class RepairState[T](nextIdx: Int, buffer: Map[Int, T], maxTs: Long)

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
  * as disorder is bounded. The [[TurnPacked]] flavor is the production hot
  * path; the [[TurnPos]] flavor is the convenience API. Both run the SAME
  * generic core, so they cannot drift.
  */
object OrderRepair {

  /** The single repair algorithm, generic in the record type; `idxOf` /
    * `posOf` / `tsOf` are the only record accesses. The buffer is a
    * `LongMap` (specialized keys — no Integer boxing per row on the hot
    * loop); it converts to the immutable state map only at state-commit
    * time, and only when non-empty.
    */
  private def repairCore[T](strict: Boolean, streaming: Boolean, gapMs: Long,
                            idxOf: T => Int, posOf: T => Long, tsOf: T => Long)(
      key: String, rows: Iterator[T],
      state: GroupState[RepairState[T]]): Iterator[T] = {

    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      return if (strict) Iterator.empty
      else st.buffer.toSeq.sortBy(_._1).map(_._2).iterator
    }

    val st = state.getOption.getOrElse(RepairState[T](0, Map.empty, Long.MinValue))
    val buf = scala.collection.mutable.LongMap.empty[T]
    st.buffer.foreach { case (k, v) => buf.update(k.toLong, v) }
    var maxTs = st.maxTs
    val nextIdx = st.nextIdx
    rows.foreach { r =>
      val t = tsOf(r)
      if (t > maxTs) maxTs = t
      val idx = idxOf(r)
      if (idx >= nextIdx) {
        val prev = buf.getOrNull(idx.toLong)
        if (prev == null || posOf(prev) > posOf(r)) buf.update(idx.toLong, r) // min-pos wins
      } // else: duplicate of an already-emitted turn — reference flags these
        // via UniqueFlag; the repair operator simply never re-emits a key.
    }

    val emitted = Vector.newBuilder[T]
    var next = nextIdx
    var run = true
    while (run) {
      val t = buf.getOrNull(next.toLong)
      if (t != null) { buf.remove(next.toLong); emitted += t; next += 1 }
      else run = false
    }

    if (streaming) {
      val remaining =
        if (buf.isEmpty) Map.empty[Int, T]
        else buf.iterator.map { case (k, v) => k.toInt -> v }.toMap
      state.update(RepairState(next, remaining, maxTs))
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

  def repairFn(strict: Boolean, streaming: Boolean, gapMs: Long)(
      key: String, rows: Iterator[TurnPos],
      state: GroupState[RepairState[TurnPos]]): Iterator[TurnPos] =
    repairCore[TurnPos](strict, streaming, gapMs,
      _.turn_idx, _.pos, _.ts.getTime)(key, rows, state)

  private def repairFnPacked(strict: Boolean, streaming: Boolean, gapMs: Long)(
      key: String, rows: Iterator[TurnPacked],
      state: GroupState[RepairState[TurnPacked]]): Iterator[TurnPacked] =
    repairCore[TurnPacked](strict, streaming, gapMs,
      _.turn_idx, _.pos, _.ts.getTime)(key, rows, state)

  private implicit val turnPosEnc = Encoders.product[TurnPos]
  private implicit val stateEnc = Encoders.product[RepairState[TurnPos]]
  private implicit val turnPackedEnc = Encoders.product[TurnPacked]
  private implicit val statePackedEnc = Encoders.product[RepairState[TurnPacked]]
  private implicit val keyEnc = Encoders.STRING

  /** Pack the boundary: payload strings → raw bytes (cast, no decode).
    * `ts` is projected UNTOUCHED so a watermark tag applied upstream
    * survives (NTZ sources get the encoder's upcast, same as [[TurnPos]]).
    */
  def pack(df: DataFrame): Dataset[TurnPacked] =
    df.select(col("conv_id"), col("turn_idx"),
      col("role").cast("binary").as("role"),
      col("text").cast("binary").as("text"),
      col("tool").cast("binary").as("tool"),
      col("ts"),
      col("pos")).as[TurnPacked]

  /** Inverse of [[pack]] (UTF-8 round-trip is exact). */
  def unpack(ds: Dataset[TurnPacked]): DataFrame =
    ds.toDF().select(col("conv_id"), col("turn_idx"),
      col("role").cast("string").as("role"),
      col("text").cast("string").as("text"),
      col("tool").cast("string").as("tool"),
      col("ts"),
      col("pos"))

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

  /** Hot-path batch flavor over the packed record. */
  def batchPacked(ds: Dataset[TurnPacked], strict: Boolean): Dataset[TurnPacked] =
    ds.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        repairFnPacked(strict, streaming = false, gapMs = 0L))

  /** Hot-path streaming flavor: apply `withWatermark` BEFORE [[pack]] (the
    * watermark node survives the packing projection; the timeout uses the
    * global watermark value, not the projected column).
    */
  def streamingPacked(ds: Dataset[TurnPacked], strict: Boolean,
                      gapMs: Long): Dataset[TurnPacked] =
    ds.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        repairFnPacked(strict, streaming = true, gapMs = gapMs))
}
