package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dsl.Dataflow
import graft.model.Events
import graft.source.Transcript
import graft.transform._

/** Driver-contract queries covering every reference transformation
  * (SURVEY.md §2.2) over the deterministic transcript derived from the
  * `events` table. Each output projects plain scalar columns (no
  * array/struct) so the DuckDB oracle can reproduce it exactly:
  * `n_events` = size of the per-row event list, `stopped` = has a
  * StopProcessing event.
  */
object ReferenceOps {

  private def turns(s: SparkSession, dir: String): DataFrame =
    Transcript.fromEvents(s, dir)

  private def out(df: DataFrame, cols: Column*): DataFrame =
    df.select(cols :+ size(col(Events.col)).as("n_events")
                   :+ Events.stoppedCol.as("stopped"): _*)

  private val W = Transcript.withTurns

  /** Raw conversion-input fields injected deterministically from `pos`
    * (= event_id) so both engines construct identical convertible /
    * unconvertible samples.
    */
  private def withConvFields(df: DataFrame): DataFrame = df
    .withColumn("bool_raw",
      when(col("pos") % 7 === 0, "true").when(col("pos") % 7 === 1, "Yes")
        .when(col("pos") % 7 === 2, "N").when(col("pos") % 7 === 3, "0")
        .when(col("pos") % 7 === 4, "1").when(col("pos") % 7 === 5, "nope")
        .otherwise(lit(null)))
    .withColumn("dec_raw",
      when(col("pos") % 5 === 0, "123.45").when(col("pos") % 5 === 1, "-0.5")
        .when(col("pos") % 5 === 2, "1,234.56").when(col("pos") % 5 === 3, "abc")
        .otherwise(lit(null)))
    .withColumn("dt_raw",
      when(col("pos") % 10 === 0, "2018-01-02 03:04:05")
        .when(col("pos") % 10 === 1, "Jan  2, 2018 12:30 AM")
        .when(col("pos") % 10 === 2, "2018-01-02T03:04:05.0000000")
        .when(col("pos") % 10 === 3, "1/2/2018")
        .when(col("pos") % 10 === 4, "not a date")
        .when(col("pos") % 10 === 5, "2 Jan 2018")
        .when(col("pos") % 10 === 6, "January 2, 2018")
        .when(col("pos") % 10 === 7, "2018/1/2")
        .when(col("pos") % 10 === 8, "1/2/2018 3:04:05 PM")
        .otherwise(lit(null)))
    .withColumn("ssn_raw",
      when(col("pos") % 4 === 0, "123456789")
        .when(col("pos") % 4 === 1, "123-45-6789")
        .when(col("pos") % 4 === 2, "98-7654321")
        .otherwise("12345678"))

  private val convFieldsSql =
    """SELECT *,
      |  CASE WHEN pos % 7 = 0 THEN 'true' WHEN pos % 7 = 1 THEN 'Yes'
      |       WHEN pos % 7 = 2 THEN 'N' WHEN pos % 7 = 3 THEN '0'
      |       WHEN pos % 7 = 4 THEN '1' WHEN pos % 7 = 5 THEN 'nope' END AS bool_raw,
      |  CASE WHEN pos % 5 = 0 THEN '123.45' WHEN pos % 5 = 1 THEN '-0.5'
      |       WHEN pos % 5 = 2 THEN '1,234.56' WHEN pos % 5 = 3 THEN 'abc' END AS dec_raw,
      |  CASE WHEN pos % 10 = 0 THEN '2018-01-02 03:04:05'
      |       WHEN pos % 10 = 1 THEN 'Jan  2, 2018 12:30 AM'
      |       WHEN pos % 10 = 2 THEN '2018-01-02T03:04:05.0000000'
      |       WHEN pos % 10 = 3 THEN '1/2/2018'
      |       WHEN pos % 10 = 4 THEN 'not a date'
      |       WHEN pos % 10 = 5 THEN '2 Jan 2018'
      |       WHEN pos % 10 = 6 THEN 'January 2, 2018'
      |       WHEN pos % 10 = 7 THEN '2018/1/2'
      |       WHEN pos % 10 = 8 THEN '1/2/2018 3:04:05 PM' END AS dt_raw,
      |  CASE WHEN pos % 4 = 0 THEN '123456789' WHEN pos % 4 = 1 THEN '123-45-6789'
      |       WHEN pos % 4 = 2 THEN '98-7654321' ELSE '12345678' END AS ssn_raw
      |FROM turns""".stripMargin

  private val withConv = s"${W}, conv AS (\n$convFieldsSql\n)\n"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_required" -> ((s, dir) =>
      out(Pipeline(turns(s, dir), Seq(Required(Seq("text")))),
        col("conv_id"), col("turn_idx"), col("text"))),

    "q_default_value" -> ((s, dir) =>
      out(Pipeline(turns(s, dir), Seq(DefaultValue(Map("text" -> "EMPTY", "tool" -> "none")))),
        col("conv_id"), col("turn_idx"), col("text"), col("tool"))),

    "q_replace" -> ((s, dir) =>
      out(Pipeline(turns(s, dir),
        Seq(Replace(Seq("role"), Map("user" -> "human", "assistant" -> "ai")))),
        col("conv_id"), col("turn_idx"), col("role"))),

    "q_truncate" -> ((s, dir) =>
      out(Pipeline(turns(s, dir), Seq(Truncate(Map("text" -> 20)))),
        col("conv_id"), col("turn_idx"), col("text"))),

    "q_conditional" -> ((s, dir) =>
      out(Pipeline(turns(s, dir),
        Seq(Conditional(col("role") === "user", Seq(Truncate(Map("text" -> 10)))))),
        col("conv_id"), col("turn_idx"), col("role"), col("text"))),

    "q_code" -> ((s, dir) =>
      out(Pipeline(turns(s, dir),
        Seq(CodeT(df => df.withColumn("text_rev", reverse(col("text")))))),
        col("conv_id"), col("turn_idx"), col("text_rev"))),

    "q_conv_upper" -> ((s, dir) =>
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("role"), "upper"))),
        col("pos"), col("role"))),

    "q_conv_boolean" -> ((s, dir) =>
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("bool_raw"), "boolean"))),
        col("pos"), col("bool_raw").as("bool_val"))),

    "q_conv_decimal" -> ((s, dir) =>
      // decimal(38,18) bytes differ between Spark parquet and DuckDB under
      // the driver's hasher — emit double (the repo-wide cast-at-the-end
      // convention, e.g. q_tpch_q1) so both engines hash identically.
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("dec_raw"), "decimal"))),
        col("pos"), col("dec_raw").cast("double").as("dec_val"))),

    "q_conv_datetime" -> ((s, dir) =>
      // try_to_timestamp yields an LTZ timestamp; emit NTZ to match the
      // oracle's naive timestamps independent of driver tz normalization
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("dt_raw"), "datetime"))),
        col("pos"), col("dt_raw").cast("timestamp_ntz").as("dt_val"))),

    "q_conv_date" -> ((s, dir) =>
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("dt_raw"), "date"))),
        col("pos"), col("dt_raw").as("date_val"))),

    "q_conv_ssn" -> ((s, dir) =>
      out(Pipeline(withConvFields(turns(s, dir)), Seq(Conversion(Seq("ssn_raw"), "ssn"))),
        col("pos"), col("ssn_raw").as("ssn_val"))),

    "q_conv_gated" -> ((s, dir) =>
      // Conversion nested under Conditional: non-matching rows must keep
      // their ORIGINAL value (the column stays string) — the reference
      // leaves unconverted records untouched.
      out(Pipeline(withConvFields(turns(s, dir)),
        Seq(Conditional(col("role") === "user", Seq(Conversion(Seq("dec_raw"), "decimal"))))),
        col("pos"), col("role"), col("dec_raw").as("dec_val"))),

    "q_unique_flag" -> ((s, dir) =>
      out(Pipeline(turns(s, dir),
        Seq(UniqueFlag(Seq("conv_id", "role", "tool")))),
        col("pos"))),

    "q_lookup" -> ((s, dir) => {
      val t = turns(s, dir)
      val lookupDf = t.filter(col("tool").isNotNull)
        .groupBy("tool").agg(count(lit(1)).as("tool_uses"))
      out(Pipeline(t, Seq(Lookup(lookupDf, Seq("tool"), Seq("tool_uses")))),
        col("pos"), col("tool"), col("tool_uses"))
    }),

    "q_union_source" -> ((s, dir) => {
      val t = turns(s, dir)
      val a = t.filter(col("role") === "user")
      val b = t.filter(col("role") === "tool").drop("tool") // missing column
      Dataflow("union").source(a).source(b).run()
        .select(col("pos"), col("conv_id"), col("turn_idx"), col("role"), col("tool"))
    }),

    "q_error_split" -> ((s, dir) => {
      // The event-sink channel: errors are data — one row per LogEvent with
      // the record key alongside (ErrorSplit = the reference's per-record
      // event notification stream).
      val piped = Pipeline(withConvFields(turns(s, dir)),
        Seq(Required(Seq("text")), Conversion(Seq("bool_raw"), "boolean")))
      graft.sink.ErrorSplit.split(piped, Seq("conv_id", "turn_idx"))._2
    }),

    "q_pipeline_e2e" -> ((s, dir) => {
      val flow = Dataflow("transcripts")
        .withKeys("conv_id", "turn_idx")
        .default("tool", "none")
        .replace("role", Map("tool" -> "tool_result"))
        .transform(
          Required(Seq("text")),
          Truncate(Map("text" -> 120)),
          UniqueFlag(Seq("conv_id", "turn_idx")))
        .source(turns(s, dir))
      // no output orderBy: the result CONTRACT is the row multiset (the
      // oracle SQL has no ORDER BY and the driver compares sorted); a
      // cosmetic global sort costs a rangepartitioning exchange + full sort
      // of the transcript at 100 TB (guide §2.4's "orderBy used only to
      // make output deterministic")
      out(flow.run(),
        col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"))
    })
  )

  private def reqSql(field: String) = s"($field IS NULL OR trim($field) = '')"

  val oracles: Map[String, String] = Map(
    "q_required" -> (W +
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN ${reqSql("text")} THEN NULL ELSE text END AS text,
         |  CASE WHEN ${reqSql("text")} THEN 1 ELSE 0 END AS n_events,
         |  ${reqSql("text")} AS stopped
         |FROM turns""".stripMargin),

    "q_default_value" -> (W +
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN ${reqSql("text")} THEN 'EMPTY' ELSE text END AS text,
         |  coalesce(tool, 'none') AS tool, 0 AS n_events, false AS stopped
         |FROM turns""".stripMargin),

    "q_replace" -> (W +
      """SELECT conv_id, turn_idx,
        |  CASE role WHEN 'user' THEN 'human' WHEN 'assistant' THEN 'ai' ELSE role END AS role,
        |  0 AS n_events, false AS stopped
        |FROM turns""".stripMargin),

    "q_truncate" -> (W +
      """SELECT conv_id, turn_idx,
        |  CASE WHEN length(text) > 20 THEN substr(text, 1, 20) ELSE text END AS text,
        |  0 AS n_events, false AS stopped
        |FROM turns""".stripMargin),

    "q_conditional" -> (W +
      """SELECT conv_id, turn_idx, role,
        |  CASE WHEN role = 'user' AND length(text) > 10 THEN substr(text, 1, 10) ELSE text END AS text,
        |  0 AS n_events, false AS stopped
        |FROM turns""".stripMargin),

    "q_code" -> (W +
      """SELECT conv_id, turn_idx, reverse(text) AS text_rev, 0 AS n_events, false AS stopped
        |FROM turns""".stripMargin),

    "q_conv_upper" -> (withConv +
      """SELECT pos, upper(role) AS role, 0 AS n_events, false AS stopped FROM conv""".stripMargin),

    "q_conv_boolean" -> (withConv +
      """SELECT pos,
        |  CASE WHEN pos % 7 = 0 THEN true WHEN pos % 7 = 1 THEN true
        |       WHEN pos % 7 = 2 THEN false WHEN pos % 7 = 3 THEN false
        |       WHEN pos % 7 = 4 THEN true END AS bool_val,
        |  CASE WHEN pos % 7 = 5 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 7 = 5) AS stopped
        |FROM conv""".stripMargin),

    "q_conv_decimal" -> (withConv +
      """SELECT pos,
        |  CAST(CASE WHEN pos % 5 = 0 THEN CAST('123.45' AS DECIMAL(38,18))
        |       WHEN pos % 5 = 1 THEN CAST('-0.5' AS DECIMAL(38,18))
        |       WHEN pos % 5 = 2 THEN CAST('1234.56' AS DECIMAL(38,18)) END AS DOUBLE) AS dec_val,
        |  CASE WHEN pos % 5 = 3 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 5 = 3) AS stopped
        |FROM conv""".stripMargin),

    "q_conv_datetime" -> (withConv +
      """SELECT pos,
        |  CASE WHEN pos % 10 = 0 THEN TIMESTAMP '2018-01-02 03:04:05'
        |       WHEN pos % 10 = 1 THEN TIMESTAMP '2018-01-02 00:30:00'
        |       WHEN pos % 10 = 2 THEN TIMESTAMP '2018-01-02 03:04:05'
        |       WHEN pos % 10 = 3 THEN TIMESTAMP '2018-01-02 00:00:00'
        |       WHEN pos % 10 = 5 THEN TIMESTAMP '2018-01-02 00:00:00'
        |       WHEN pos % 10 = 6 THEN TIMESTAMP '2018-01-02 00:00:00'
        |       WHEN pos % 10 = 7 THEN TIMESTAMP '2018-01-02 00:00:00'
        |       WHEN pos % 10 = 8 THEN TIMESTAMP '2018-01-02 15:04:05' END AS dt_val,
        |  CASE WHEN pos % 10 = 4 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 10 = 4) AS stopped
        |FROM conv""".stripMargin),

    "q_conv_date" -> (withConv +
      """SELECT pos,
        |  CASE WHEN pos % 10 IN (0, 1, 2, 3, 5, 6, 7, 8) THEN DATE '2018-01-02' END AS date_val,
        |  CASE WHEN pos % 10 = 4 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 10 = 4) AS stopped
        |FROM conv""".stripMargin),

    "q_conv_ssn" -> (withConv +
      """SELECT pos,
        |  CASE WHEN pos % 4 = 0 THEN '123-45-6789' WHEN pos % 4 = 1 THEN '123-45-6789'
        |       WHEN pos % 4 = 2 THEN '987-65-4321' END AS ssn_val,
        |  CASE WHEN pos % 4 = 3 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 4 = 3) AS stopped
        |FROM conv""".stripMargin),

    "q_conv_gated" -> (withConv +
      """SELECT pos, role,
        |  CASE WHEN pos % 3 = 0 THEN
        |    CASE WHEN pos % 5 = 0 THEN '123.450000000000000000'
        |         WHEN pos % 5 = 1 THEN '-0.500000000000000000'
        |         WHEN pos % 5 = 2 THEN '1234.560000000000000000' END
        |  ELSE dec_raw END AS dec_val,
        |  CASE WHEN pos % 3 = 0 AND pos % 5 = 3 THEN 1 ELSE 0 END AS n_events,
        |  (pos % 3 = 0 AND pos % 5 = 3) AS stopped
        |FROM conv""".stripMargin),

    "q_unique_flag" -> (W +
      """, firsts AS (
        |  SELECT conv_id, role, tool, min(pos) AS first_pos
        |  FROM turns GROUP BY conv_id, role, tool
        |)
        |SELECT t.pos,
        |  CASE WHEN t.pos <> f.first_pos THEN 1 ELSE 0 END AS n_events,
        |  (t.pos <> f.first_pos) AS stopped
        |FROM turns t
        |JOIN firsts f ON t.conv_id = f.conv_id AND t.role = f.role
        |  AND t.tool IS NOT DISTINCT FROM f.tool""".stripMargin),

    "q_lookup" -> (W +
      """, lkp AS (
        |  SELECT tool, count(*) AS tool_uses FROM turns WHERE tool IS NOT NULL GROUP BY tool
        |)
        |SELECT t.pos, t.tool,
        |  CASE WHEN l.tool IS NOT NULL THEN l.tool_uses END AS tool_uses,
        |  CASE WHEN l.tool IS NULL THEN 1 ELSE 0 END AS n_events,
        |  (l.tool IS NULL) AS stopped
        |FROM turns t LEFT JOIN lkp l ON t.tool = l.tool""".stripMargin),

    "q_union_source" -> (W +
      """SELECT pos, conv_id, turn_idx, role, tool FROM turns WHERE role = 'user'
        |UNION ALL
        |SELECT pos, conv_id, turn_idx, role, NULL AS tool FROM turns WHERE role = 'tool'""".stripMargin),

    "q_error_split" -> (withConv +
      s"""SELECT conv_id, turn_idx, true AS stop, 'ERROR' AS level,
         |  'A value is required for the field [text]' AS description, text AS value
         |FROM conv WHERE ${reqSql("text")}
         |UNION ALL
         |SELECT conv_id, turn_idx, true AS stop, 'ERROR' AS level,
         |  'Unable to convert the data in field [bool_raw]' AS description, bool_raw AS value
         |FROM conv WHERE NOT ${reqSql("text")} AND pos % 7 = 5""".stripMargin),

    "q_pipeline_e2e" -> (W +
      s"""SELECT conv_id, turn_idx,
         |  CASE role WHEN 'tool' THEN 'tool_result' ELSE role END AS role,
         |  CASE WHEN ${reqSql("text")} THEN NULL
         |       WHEN length(text) > 120 THEN substr(text, 1, 120) ELSE text END AS text,
         |  coalesce(tool, 'none') AS tool, ts,
         |  CASE WHEN ${reqSql("text")} THEN 1 ELSE 0 END AS n_events,
         |  ${reqSql("text")} AS stopped
         |FROM turns""".stripMargin)
  )
}
