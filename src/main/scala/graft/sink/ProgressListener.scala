package graft.sink

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-micro-batch lineage + state metrics log (north rule: "every
  * micro-batch records per-partition lineage and state-store metrics to a
  * checkpointed progress log"). Appends one JSON line per batch to
  * `<dir>/progress.jsonl`: batchId, source offsets (the lineage — which
  * input slice produced the batch), rows/sec, state-store rows & memory,
  * watermark. Spark's own `progress.json` is already JSON — we persist the
  * subset that matters for resume audits next to the checkpoint.
  */
class ProgressListener(dir: String) extends StreamingQueryListener {

  Files.createDirectories(Paths.get(dir))
  private val out = Paths.get(dir, "progress.jsonl")

  override def onQueryStarted(event: QueryStartedEvent): Unit = {
    append(s"""{"event":"started","id":"${event.id}","runId":"${event.runId}"}""")
  }

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val sources = p.sources.map { s =>
      s"""{"description":${q(s.description)},"startOffset":${orNull(s.startOffset)},"endOffset":${orNull(s.endOffset)},"numInputRows":${s.numInputRows}}"""
    }.mkString("[", ",", "]")
    val state = Option(p.stateOperators).getOrElse(Array.empty).map { so =>
      s"""{"operatorName":${q(so.operatorName)},"numRowsTotal":${so.numRowsTotal},"numRowsUpdated":${so.numRowsUpdated},"memoryUsedBytes":${so.memoryUsedBytes}}"""
    }.mkString("[", ",", "]")
    val watermark = Option(p.eventTime.get("watermark")).map(q).getOrElse("null")
    append(
      s"""{"event":"progress","batchId":${p.batchId},"timestamp":${q(p.timestamp)},""" +
        s""""numInputRows":${p.numInputRows},"processedRowsPerSecond":${safeNum(p.processedRowsPerSecond)},""" +
        s""""durationMs":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
        s""""watermark":$watermark,"sources":$sources,"stateOperators":$state}""")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    append(s"""{"event":"terminated","id":"${event.id}"}""")

  private def safeNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  private def orNull(s: String): String = Option(s).map(identity).getOrElse("null")

  private def q(s: Any): String =
    "\"" + String.valueOf(s).replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""

  private def append(line: String): Unit = synchronized {
    Files.writeString(out, line + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
