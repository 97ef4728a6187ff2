package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Events

/** Level ordering shared by the min-level filters (the reference's
  * `LogLevel` comparison in ConsoleEventSink.cs:38-42).
  */
private[sink] object EventLevels {
  val order = Map("DEBUG" -> 0, "INFO" -> 1, "WARN" -> 2, "ERROR" -> 3, "CRITICAL" -> 4)

  /** Rank of the `level` column; unknown levels rank as INFO. */
  def rank(level: Column): Column =
    order.foldLeft(lit(order("INFO")): Column) { case (acc, (l, r)) =>
      when(level === l, lit(r)).otherwise(acc)
    }
}

/** The reference's event-sink channel (reference:
  * src/Shipwright.Core/Dataflows/EventSinks/ConsoleEventSink.cs:16-95,
  * AggregateEventSink.cs:34-79) re-expressed data-parallel: per-record
  * events are DATA (the `events` column), so "sinking" them is a DataFrame
  * split + writers, not a side channel.
  */
object ErrorSplit {

  /** Split pipeline output into (valid rows, error rows). Error rows =
    * one row per LogEvent, with the record key columns carried alongside —
    * the record-completed notification stream of the reference's
    * Dataflow.Handler terminus (Dataflow.cs:263-269).
    */
  def split(df: DataFrame, keyCols: Seq[String]): (DataFrame, DataFrame) = {
    val valid = df.filter(!Events.stoppedCol)
    val errors = df.filter(size(col(Events.col)) > 0)
      .select(keyCols.map(col) :+ explode(col(Events.col)).as("event"): _*)
      .select(keyCols.map(col) ++ Seq(
        col("event.stop").as("stop"), col("event.level").as("level"),
        col("event.description").as("description"), col("event.value").as("value")): _*)
    (valid, errors)
  }

  /** Per-record console lines (reference ConsoleEventSink.cs:44-95 logs each
    * record's event list at/above the minimum level). Formatting and the
    * level filter run DATA-PARALLEL over the [[split]] error stream; only
    * the final console emission ([[ConsoleEventSink.sinkRecords]]) is
    * driver-side — the console is inherently a driver device.
    */
  private def formatted(errors: DataFrame, keyCols: Seq[String],
                        minimumLevel: String): DataFrame = {
    require(EventLevels.order.contains(minimumLevel),
      s"Unknown minimum level [$minimumLevel]; expected one of ${EventLevels.order.keys.mkString(", ")}")
    val keyPart = concat_ws(", ", keyCols.map(k =>
      concat(lit(k + "="), coalesce(col(k).cast("string"), lit("null")))): _*)
    errors
      .filter(EventLevels.rank(col("level")) >= lit(EventLevels.order(minimumLevel)))
      .select(col("level"), concat(
        lit("record("), keyPart, lit("): "), col("description"),
        coalesce(concat(lit(" value="), col("value")), lit(""))).as("message"))
  }

  /** (level, message) pairs at/above the minimum level — the shape an
    * [[EventSink]]'s `notify` takes, so a pipeline can route per-record
    * events through whatever sink is configured.
    */
  def recordEvents(errors: DataFrame, keyCols: Seq[String],
                   minimumLevel: String = "WARN"): Dataset[(String, String)] = {
    val spark = errors.sparkSession
    import spark.implicits._
    formatted(errors, keyCols, minimumLevel).as[(String, String)]
  }

  /** Pre-rendered `[LEVEL] record(...): ...` console lines. */
  def recordLines(errors: DataFrame, keyCols: Seq[String],
                  minimumLevel: String = "WARN"): Dataset[String] = {
    val spark = errors.sparkSession
    import spark.implicits._
    formatted(errors, keyCols, minimumLevel)
      .select(concat(lit("["), col("level"), lit("] "), col("message")).as("line"))
      .as[String]
  }
}

/** Lifecycle notification sinks. The per-record volume goes through
  * [[ErrorSplit]]; these receive the aggregate notifications (dataflow /
  * source started & completed, per-batch error counts) like the reference's
  * `IEventSinkHandler` with a MinimumLevel filter.
  */
trait EventSink extends Serializable {
  def notify(level: String, message: String): Unit
}

class ConsoleEventSink(minimumLevel: String = "WARN") extends EventSink {
  private val order = Map("DEBUG" -> 0, "INFO" -> 1, "WARN" -> 2, "ERROR" -> 3, "CRITICAL" -> 4)
  require(order.contains(minimumLevel), // sink validation decorator analog
    s"Unknown minimum level [$minimumLevel]; expected one of ${order.keys.mkString(", ")}")
  def notify(level: String, message: String): Unit =
    if (order.getOrElse(level, 1) >= order.getOrElse(minimumLevel, 2))
      // scalastyle:off println
      println(s"[$level] $message")
      // scalastyle:on println

  /** Per-record mode: print one line per record event at/above this sink's
    * minimum level (closes the last deviation from ConsoleEventSink.cs:44-95,
    * which logs each record's event list). `toLocalIterator` streams one
    * partition at a time, so the driver never materializes the full error
    * set even when the pipeline output is large.
    */
  def sinkRecords(errors: DataFrame, keyCols: Seq[String]): Unit =
    ErrorSplit.recordLines(errors, keyCols, minimumLevel)
      // the formatted line already carries its own [LEVEL] prefix
      // scalastyle:off println
      .toLocalIterator().forEachRemaining(println(_))
      // scalastyle:on println
}

/** Fan-out to children, sequential (AggregateEventSink.cs:34-79). */
class AggregateEventSink(children: Seq[EventSink]) extends EventSink {
  def notify(level: String, message: String): Unit =
    children.foreach(_.notify(level, message))
}

/** Test capture (the reference's FakeEventSink). */
class CollectingEventSink extends EventSink {
  val captured = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def notify(level: String, message: String): Unit =
    synchronized { captured += ((level, message)) }
}
