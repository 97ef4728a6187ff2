package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.source.Transcript

/** Conversation-level analytics over the north-rule transcript table —
  * the read-side queries an agent-transcript warehouse runs constantly:
  * per-conversation rollups, inter-turn latency, context-window truncation
  * for training-sample assembly, and role-protocol validation (a batch CEP
  * check; the streaming order/pairing flavors live in graft.stream).
  *
  * Scale notes (100 TB): every operator here costs exactly ONE hash
  * exchange on `conv_id` TOTAL — the turns derivation windows on conv_id
  * (Transcript.fromEvents), and each analytics groupBy/window REUSES that
  * partitioning instead of adding its own (PlanSpec-pinned); on a
  * pre-bucketed transcript table even that one disappears. No joins, no
  * explodes, no driver-side state.
  * Conversations are bounded (≤ a few thousand turns) so per-key windows
  * never spill; hot-conversation skew is the salted-agg problem already
  * handled in CepOps (q_skew_salted_agg).
  */
object ConvOps {

  private val W = Transcript.withTurns

  /** Inter-turn gap above which a turn is flagged slow (ms). */
  private val SlowMs = 30000L

  /** Token budget for context-window truncation (most-recent-first). */
  private val CtxTokens = 192L

  private def turns(s: SparkSession, dir: String): DataFrame =
    Transcript.fromEvents(s, dir)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-conversation rollup: turn counts by role, tool-call count, blank
    // or missing text count (the Required-validation failure surface), and
    // wall duration. One partial+final aggregate on conv_id.
    "q_conv_stats" -> ((s, dir) =>
      turns(s, dir).groupBy("conv_id").agg(
        count(lit(1)).as("n_turns"),
        count(when(col("role") === "user", 1)).as("n_user"),
        count(when(col("role") === "assistant", 1)).as("n_assistant"),
        count(when(col("role") === "assistant" && col("tool").isNotNull, 1))
          .as("n_tool_calls"),
        count(when(col("text").isNull || trim(col("text")) === "", 1))
          .as("n_blank_text"),
        (unix_millis(max(col("ts")).cast("timestamp")) -
          unix_millis(min(col("ts")).cast("timestamp"))).as("duration_ms"))),

    // Inter-turn latency: event-time gap to the previous turn in the same
    // conversation (lag window), flagging gaps above the SLA. First turn of
    // a conversation has NULL latency/slow — kept, not dropped.
    "q_turn_latency" -> ((s, dir) => {
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      turns(s, dir).select(col("conv_id"), col("turn_idx"), col("role"), col("ts"))
        .withColumn("latency_ms",
          unix_millis(col("ts").cast("timestamp")) -
            unix_millis(lag(col("ts"), 1).over(w).cast("timestamp")))
        .withColumn("slow", col("latency_ms") > SlowMs)
        .drop("ts")
    }),

    // Context-window truncation for training-sample assembly: running token
    // count from the END of each conversation (turn_idx DESC cumsum); a turn
    // is kept iff the suffix through it fits the budget. Flag-don't-drop —
    // the caller filters on `kept`, mirroring Unique/dedup semantics.
    "q_context_window" -> ((s, dir) => {
      val w = Window.partitionBy("conv_id").orderBy(col("turn_idx").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      turns(s, dir).select(col("conv_id"), col("turn_idx"), col("role"),
          coalesce(regexp_count(col("text"), lit("\\S+")), lit(0))
            .cast("long").as("n_tokens"))
        .withColumn("cum_from_end", sum("n_tokens").over(w))
        .withColumn("kept", col("cum_from_end") <= CtxTokens)
    }),

    // Role-protocol validation (batch CEP): a tool turn must directly follow
    // an assistant turn, a user turn must not follow a user turn, and an
    // assistant tool CALL must be directly followed by a tool turn. Emits
    // only violating turns with the violation kind — the per-record event
    // channel's analog for protocol errors.
    "q_role_violations" -> ((s, dir) => {
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      turns(s, dir).select(col("conv_id"), col("turn_idx"), col("role"), col("tool"))
        .withColumn("prev_role", lag(col("role"), 1).over(w))
        .withColumn("next_role", lead(col("role"), 1).over(w))
        .withColumn("violation",
          when(col("role") === "tool" &&
            (col("prev_role").isNull || col("prev_role") =!= "assistant"),
            "tool_without_call")
          .when(col("role") === "user" && col("prev_role") === "user",
            "double_user")
          .when(col("role") === "assistant" && col("tool").isNotNull &&
            (col("next_role").isNull || col("next_role") =!= "tool"),
            "unanswered_call")
          .otherwise(lit(null).cast("string")))
        .filter(col("violation").isNotNull)
        .drop("tool")
    })
  )

  val oracles: Map[String, String] = Map(

    "q_conv_stats" ->
      s"""${W}SELECT conv_id,
         |  count(*) AS n_turns,
         |  count(*) FILTER (WHERE role = 'user') AS n_user,
         |  count(*) FILTER (WHERE role = 'assistant') AS n_assistant,
         |  count(*) FILTER (WHERE role = 'assistant' AND tool IS NOT NULL) AS n_tool_calls,
         |  count(*) FILTER (WHERE text IS NULL OR trim(text) = '') AS n_blank_text,
         |  epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
         |FROM turns GROUP BY conv_id""".stripMargin,

    "q_turn_latency" ->
      s"""${W}SELECT conv_id, turn_idx, role,
         |  epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS latency_ms,
         |  (epoch_ms(ts) - epoch_ms(lag(ts) OVER w)) > $SlowMs AS slow
         |FROM turns
         |WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)""".stripMargin,

    "q_context_window" ->
      s"""${W}, t AS (
         |  SELECT conv_id, turn_idx, role,
         |    CAST(coalesce(len(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens
         |  FROM turns
         |)
         |SELECT conv_id, turn_idx, role, n_tokens,
         |  CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_from_end,
         |  CAST(sum(n_tokens) OVER w AS BIGINT) <= $CtxTokens AS kept
         |FROM t
         |WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx DESC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_role_violations" ->
      s"""${W}, r AS (
         |  SELECT conv_id, turn_idx, role, tool,
         |    lag(role) OVER w AS prev_role,
         |    lead(role) OVER w AS next_role
         |  FROM turns
         |  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
         |)
         |SELECT conv_id, turn_idx, role, prev_role, next_role,
         |  CASE
         |    WHEN role = 'tool' AND (prev_role IS NULL OR prev_role <> 'assistant')
         |      THEN 'tool_without_call'
         |    WHEN role = 'user' AND prev_role = 'user' THEN 'double_user'
         |    WHEN role = 'assistant' AND tool IS NOT NULL
         |      AND (next_role IS NULL OR next_role <> 'tool') THEN 'unanswered_call'
         |  END AS violation
         |FROM r WHERE CASE
         |    WHEN role = 'tool' AND (prev_role IS NULL OR prev_role <> 'assistant')
         |      THEN 'tool_without_call'
         |    WHEN role = 'user' AND prev_role = 'user' THEN 'double_user'
         |    WHEN role = 'assistant' AND tool IS NOT NULL
         |      AND (next_role IS NULL OR next_role <> 'tool') THEN 'unanswered_call'
         |  END IS NOT NULL""".stripMargin
  )
}
