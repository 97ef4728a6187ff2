package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{AggregateEventSink, CollectingEventSink, ConsoleEventSink, ErrorSplit}
import graft.transform._

/** Event channel: valid/error split and the lifecycle sink fan-out
  * (reference: EventSinks/AggregateEventSink.cs:34-79, minimum-level filter
  * of ConsoleEventSink.cs:16-95).
  */
class EventSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("error split: one row per event with record keys; valid excludes stopped") {
    val df = Seq((1L, "ok"), (2L, null), (3L, " ")).toDF("pos", "f")
    val piped = Pipeline(df, Seq(Required(Seq("f"))))
    val (valid, errors) = ErrorSplit.split(piped, Seq("pos"))
    assert(valid.select("pos").as[Long].collect().toSet == Set(1L))
    val errs = errors.collect().map(r =>
      (r.getAs[Long]("pos"), r.getAs[Boolean]("stop"), r.getAs[String]("level"))).toSet
    assert(errs == Set((2L, true, "ERROR"), (3L, true, "ERROR")))
  }

  test("aggregate sink fans out sequentially; level filter works") {
    val a = new CollectingEventSink
    val b = new CollectingEventSink
    val agg = new AggregateEventSink(Seq(a, b))
    agg.notify("ERROR", "boom")
    agg.notify("INFO", "fyi")
    assert(a.captured == b.captured && a.captured.size == 2)
    // console sink's level filter does not throw and filters below minimum
    new ConsoleEventSink("CRITICAL").notify("INFO", "suppressed")
  }
}
