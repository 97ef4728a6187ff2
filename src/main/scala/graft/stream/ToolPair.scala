package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tool-call / tool-response pairing (north star: a stream-stream stateful
  * join). A call is an assistant turn carrying a tool name; its response is
  * the earliest later `tool`-role turn in the same conversation with the
  * same tool name within `maxDelay`.
  *
  * Batch flavor: range join + earliest-result window — oracle-checkable SQL.
  * Streaming flavor: watermarked stream-stream left-outer join with the
  * range condition bounding state on both sides (Spark evicts join state
  * for call rows once the watermark passes `c.ts + maxDelay`).
  */
object ToolPair {

  private def calls(turns: DataFrame): DataFrame =
    turns.filter(col("role") === "assistant" && col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("call_turn_idx"),
        col("tool"), col("ts").as("call_ts"), col("pos").as("call_pos"))

  private def results(turns: DataFrame): DataFrame =
    turns.filter(col("role") === "tool")
      .select(col("conv_id").as("r_conv_id"), col("turn_idx").as("result_turn_idx"),
        col("tool").as("r_tool"), col("ts").as("result_ts"), col("pos").as("result_pos"))

  // Parquet timestamps surface as TIMESTAMP_NTZ; unix_millis needs LTZ —
  // with the session pinned to UTC the cast is a no-op rebase.
  private def latencyMs =
    unix_millis(col("result_ts").cast("timestamp")) -
      unix_millis(col("call_ts").cast("timestamp"))

  private def joinCond(maxDelay: String) =
    col("conv_id") === col("r_conv_id") &&
      col("tool") === col("r_tool") &&
      col("result_turn_idx") > col("call_turn_idx") &&
      col("result_ts") >= col("call_ts") &&
      col("result_ts") <= col("call_ts") + expr(s"INTERVAL $maxDelay")

  /** Batch: left join, keep earliest matching result per call (by result ts
    * then pos — deterministic). Both sides arrive hashpartitioned on
    * conv_id from the transcript derivation, which satisfies the join's
    * (conv_id, tool) clustering AND the winner window's
    * (conv_id, call_turn_idx) clustering — neither adds an exchange
    * (PlanSpec-pinned).
    */
  def batch(turns: DataFrame, maxDelay: String = "5 MINUTES"): DataFrame = {
    val joined = calls(turns).join(results(turns), joinCond(maxDelay), "left")
    val w = Window.partitionBy(col("conv_id"), col("call_turn_idx"))
      .orderBy(col("result_ts").asc_nulls_last, col("result_pos").asc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "r_conv_id", "r_tool")
      .withColumn("latency_ms", latencyMs)
  }

  /** ALL matching (call, result) pairs — no earliest-per-call winner. This
    * is the exact multiset the streaming inner join emits for in-watermark
    * data, so it serves as the bench harness's correctness oracle for the
    * stream-stream join (emitted-pairs count must match it exactly).
    */
  def batchPairs(turns: DataFrame, maxDelay: String = "5 MINUTES"): DataFrame =
    calls(turns).join(results(turns), joinCond(maxDelay), "inner")
      .drop("r_conv_id", "r_tool")
      .withColumn("latency_ms", latencyMs)

  /** CEP absence detection ("tool call never answered within the SLA"):
    * calls with NO matching result within `maxDelay`. Batch flavor is a
    * left-anti join — one exchange on (conv_id, tool), no window, no
    * earliest-winner ranking, so it is strictly cheaper than `batch` when
    * only the timeouts are wanted.
    */
  def timeoutsBatch(turns: DataFrame, maxDelay: String = "5 MINUTES"): DataFrame =
    calls(turns).join(results(turns), joinCond(maxDelay), "left_anti")
      .select(col("conv_id"), col("call_turn_idx"), col("tool"), col("call_ts"))

  /** Streaming absence detection: the left-outer stream-stream join filtered
    * to null-padded rows. Spark emits the outer row exactly once, when the
    * watermark passes `call_ts + maxDelay` and join state for the call is
    * evicted — i.e. the timeout fires as soon as the stream can PROVE no
    * result can still arrive, which is the CEP timeout semantic.
    */
  def timeoutsStreaming(turns: DataFrame, maxDelay: String = "5 MINUTES",
                        watermark: String = "10 minutes"): DataFrame =
    streaming(turns, maxDelay, watermark, leftOuter = true)
      .filter(col("result_turn_idx").isNull)
      .select(col("conv_id"), col("call_turn_idx"), col("tool"), col("call_ts"))

  /** Streaming: both sides watermarked; inner or left-outer per
    * `leftOuter` (outer emission waits for the watermark, per Spark
    * stream-stream join semantics). Note streaming joins cannot apply the
    * earliest-result window — downstream dedup by (conv_id, call_turn_idx)
    * picks the winner; the test suite asserts set-equality of pairs with
    * the batch flavor for in-watermark data.
    */
  def streaming(turns: DataFrame, maxDelay: String = "5 MINUTES",
                watermark: String = "10 minutes", leftOuter: Boolean = false): DataFrame = {
    // Watermark BEFORE the role filters: each side's watermark must advance
    // from the full stream's event time, not just its own filtered rows —
    // with a post-filter watermark, a quiet side pins the global (min)
    // watermark at its last event and outer-join state never evicts. The
    // select alias (ts → call_ts/result_ts) carries the event-time tag.
    val wm = turns.withWatermark("ts", watermark)
    val c = calls(wm)
    val r = results(wm)
    c.join(r, joinCond(maxDelay), if (leftOuter) "leftOuter" else "inner")
      .drop("r_conv_id", "r_tool")
      .withColumn("latency_ms", latencyMs)
  }
}
