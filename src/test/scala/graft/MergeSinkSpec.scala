package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{MergeSink, ProgressListener}
import graft.stream.TurnPos

/** Exactly-once MERGE sink: keyed upsert, newest-wins, idempotent batch
  * re-delivery, checkpointed streaming end-to-end with re-processing
  * converging to the same table (FIXTURES.md §5 kill/restart script).
  */
class MergeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def turn(conv: String, idx: Int, text: String, pos: Long): TurnPos =
    TurnPos(conv, idx, "user", text, null, ts(pos), pos)

  private def tableOf(sink: MergeSink): Set[(String, Int, String)] =
    sink.read(spark).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text")))
      .toSet

  test("merge: upsert semantics, newest wins, idempotent re-delivery") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos")

    val b0 = Seq(turn("a", 0, "v1", 1), turn("a", 1, "v1", 2)).toDF()
    sink.merge(b0, 0L)
    assert(tableOf(sink) == Set(("a", 0, "v1"), ("a", 1, "v1")))

    // re-delivered batch 0 (post-crash replay) is a no-op
    sink.merge(b0, 0L)
    assert(sink.currentVersion == 0L)

    // batch 1 updates a key and inserts another; within-batch dup: max pos wins
    val b1 = Seq(turn("a", 1, "v2", 10), turn("a", 1, "stale", 5), turn("b", 0, "v1", 11)).toDF()
    sink.merge(b1, 1L)
    assert(tableOf(sink) == Set(("a", 0, "v1"), ("a", 1, "v2"), ("b", 0, "v1")))
  }

  test("streaming foreachBatch + checkpoint: restart with replay converges (exactly-once)") {
    implicit val enc = Encoders.product[TurnPos]
    val dir = Files.createTempDirectory("merge_stream").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos")

    val progressDir = Files.createTempDirectory("progress").toString
    val listener = new ProgressListener(progressDir)
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[TurnPos](enc, spark)
      def start() = ms.toDS().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TurnPos], id: Long) =>
          sink.merge(batch.toDF(), id)
        }.start()

      val q1 = start()
      ms.addData(Seq(turn("a", 0, "v1", 1), turn("a", 1, "v1", 2)))
      q1.processAllAvailable()
      q1.stop()

      // "crash": restart from the same checkpoint, old data replays plus new
      val q2 = start()
      ms.addData(Seq(turn("a", 1, "v2", 10), turn("b", 0, "v1", 11)))
      q2.processAllAvailable()
      q2.stop()

      assert(tableOf(sink) == Set(("a", 0, "v1"), ("a", 1, "v2"), ("b", 0, "v1")))

      // the progress log captured per-batch lineage lines
      val log = Files.readString(java.nio.file.Paths.get(progressDir, "progress.jsonl"))
      assert(log.contains("\"event\":\"progress\""))
      assert(log.contains("\"numInputRows\""))
    } finally spark.streams.removeListener(listener)
  }
}
