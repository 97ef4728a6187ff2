package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.TranscriptPipeline
import graft.stream.TurnPos

/** End-to-end flagship job: file stream → validation → error split → order
  * repair → exactly-once merge + progress log, including kill-and-resume
  * with re-delivery converging to the same output table (FIXTURES.md §5).
  */
class TranscriptPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def writeBatchFile(dir: String, turns: Seq[TurnPos], n: Int): Unit =
    turns.toDS().coalesce(1).write.mode("append").parquet(dir)

  test("full pipeline: valid rows merged ordered, invalid rows in errors table, progress logged, resume converges") {
    val in = Files.createTempDirectory("tp_in").toString
    val out = Files.createTempDirectory("tp_out").toString
    val errs = Files.createTempDirectory("tp_errs").toString
    val ckpt = Files.createTempDirectory("tp_ckpt").toString
    val progress = Files.createTempDirectory("tp_progress").toString
    val cfg = TranscriptPipeline.Config(in, out, errs, ckpt, progress,
      maxFilesPerTrigger = 1)

    // file 1: conv a out of order + one invalid (blank text) turn
    writeBatchFile(in, Seq(
      TurnPos("a", 1, "assistant", "r1", "search", ts(2), 2),
      TurnPos("a", 0, "user", "q0", null, ts(1), 1),
      TurnPos("a", 2, "tool", "   ", "search", ts(3), 3)), 1)

    val (q1, sink1) = TranscriptPipeline.start(spark, cfg)
    q1.processAllAvailable()
    q1.stop()

    // the stopped (blank-text) turn short-circuits the write path exactly
    // like the reference's event decorator skipping DbCommand — it lands in
    // the errors table only
    val t1 = sink1.read(spark).orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text")))
    assert(t1.toSeq == Seq(("a", 0, "q0"), ("a", 1, "r1")))

    val errRows = spark.read.parquet(errs).collect()
    assert(errRows.length == 1)
    assert(errRows.head.getAs[String]("description").contains("required for the field [text]"))

    // "crash", add file 2, restart from the same checkpoint — file 1 is NOT
    // reprocessed (offsets) and the merge journal makes any replay a no-op
    writeBatchFile(in, Seq(
      TurnPos("a", 1, "assistant", "r1-amended", "search", ts(10), 10),
      TurnPos("b", 0, "user", "hello", null, ts(11), 11)), 2)
    val (q2, sink2) = TranscriptPipeline.start(spark, cfg)
    q2.processAllAvailable()
    q2.stop()

    val t2 = sink2.read(spark).orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text")))
    assert(t2.toSeq == Seq(
      ("a", 0, "q0"), ("a", 1, "r1-amended"), ("b", 0, "hello")))

    // progress log captured batches from both runs
    val log = Files.readString(java.nio.file.Paths.get(progress, "progress.jsonl"))
    assert(log.linesIterator.count(_.contains("\"event\":\"progress\"")) >= 2)
  }
}
