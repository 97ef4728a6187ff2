package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{BatchEffect, MergeSink, ProgressListener}
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

  test("rebucket migration: rows survive, width is journaled, reopening honors it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_rebucket").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos", numBuckets = 4)
    sink.merge((0 until 40).map(i => turn(s"c$i", i, s"v$i", i)).toDF(), 0L)
    assert(sink.bucketCount == 4)
    val before = tableOf(sink)
    sink.rebucket(spark, 16)
    assert(sink.bucketCount == 16)
    assert(tableOf(sink) == before)
    // merges after the migration land on the new width
    sink.merge(Seq(turn("c1", 1, "updated", 100)).toDF(), 1L)
    assert(tableOf(sink).contains(("c1", 1, "updated")))
    assert(tableOf(sink).size == before.size)
    // a REOPENED sink with a different constructor default must use the
    // journaled width — a mismatched width would mis-route every key
    val reopened = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos", numBuckets = 7)
    assert(reopened.bucketCount == 16)
    assert(tableOf(reopened) == tableOf(sink))
    reopened.merge(Seq(turn("c1", 1, "again", 200)).toDF(), 2L)
    assert(tableOf(reopened).contains(("c1", 1, "again")))
    assert(tableOf(reopened).size == before.size)
    // a rebucket through ANOTHER instance must be picked up by the ORIGINAL
    // open sink's next merge (width is read per merged-against version, not
    // cached at construction) — a stale width would mis-route keys silently
    new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos").rebucket(spark, 8)
    sink.merge(Seq(turn("c2", 2, "cross", 300)).toDF(), 3L)
    assert(sink.bucketCount == 8)
    assert(tableOf(sink).contains(("c2", 2, "cross")))
    assert(tableOf(sink).size == before.size)
  }

  test("concurrent-writer collision: loser fails loudly, winner's manifest unclobbered") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_collide").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos", numBuckets = 4)
    sink.merge(Seq(turn("c1", 0, "v0", 1)).toDF(), 0L) // commits version 0
    // Simulate a SECOND PROCESS winning the race to version 1: its manifest
    // exists and _current points at it, while this sink's in-flight commit
    // (which read version 0 before the winner published) targets the same
    // version. writeVersion is driven directly because the race window —
    // between the loser's version read and its rename — is not reachable
    // deterministically through merge().
    val winnerManifest = "buckets\t4\n"
    Files.write(java.nio.file.Paths.get(dir, "_manifest.1"), winnerManifest.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(dir, "_current"), "1".getBytes("UTF-8"))
    // raw writes bypass Hadoop's ChecksumFileSystem: drop the now-stale crc
    // sidecars so the sink's reads see the simulated winner's files
    Files.deleteIfExists(java.nio.file.Paths.get(dir, "._current.crc"))
    Files.deleteIfExists(java.nio.file.Paths.get(dir, "._manifest.1.crc"))
    val ex = intercept[IllegalStateException] {
      sink.writeVersion(1L, Map(0 -> "data_v1/__bucket=0"), 4)
    }
    assert(ex.getMessage.contains("another writer"))
    // rename-without-overwrite means the winner's manifest was NOT clobbered
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifest.1")), "UTF-8") == winnerManifest)
    assert(sink.currentVersion == 1L)
    // an ORPHAN above the committed pointer (crash residue: manifest renamed
    // but _current never flipped) must still be cleared, not collide — the
    // single writer can never wedge itself on its own debris
    Files.write(java.nio.file.Paths.get(dir, "_manifest.2"), "buckets\t4\n".getBytes("UTF-8"))
    sink.merge(Seq(turn("c2", 0, "v1", 2)).toDF(), 1L) // targets version 2, succeeds
    // the winner's (empty) manifest was the base: c1's version-0 data is no
    // longer referenced, so the merged table carries exactly the new batch
    assert(tableOf(sink).map(t => (t._1, t._2)) == Set(("c2", 0)))
  }

  test("merge: tombstones delete keys exactly-once; replays converge") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_del").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos")

    sink.merge(Seq(turn("a", 0, "v1", 1), turn("a", 1, "v1", 2),
      turn("b", 0, "v1", 3)).toDF(), 0L)

    // batch 1: update a/0, TOMBSTONE a/1, tombstone an absent key (no-op),
    // and a key where a later version resurrects over an earlier tombstone
    val b1 = Seq(
      (turn("a", 0, "v2", 10), false),
      (turn("a", 1, "ignored", 11), true),  // delete a/1
      (turn("z", 9, "ignored", 12), true),  // delete absent key → no-op
      (turn("b", 0, "ignored", 13), true),  // tombstone...
      (turn("b", 0, "kept", 14), false))    // ...beaten by newer upsert
      .map { case (t, d) => (t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts, t.pos, d) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "pos", "del")
    sink.merge(b1, 1L, deleteCol = Some("del"))
    assert(tableOf(sink) == Set(("a", 0, "v2"), ("b", 0, "kept")))

    // replay of batch 1 is a no-op (journaled)
    sink.merge(b1, 1L, deleteCol = Some("del"))
    assert(tableOf(sink) == Set(("a", 0, "v2"), ("b", 0, "kept")))

    // a non-delete batch over a table that has seen deletes still works
    sink.merge(Seq(turn("a", 1, "back", 20)).toDF()
      .withColumn("ignored", lit(1)).drop("ignored")
      .select(col("*")), 2L)
    assert(tableOf(sink) == Set(("a", 0, "v2"), ("a", 1, "back"), ("b", 0, "kept")))
  }

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

  test("merge is partition-scoped: untouched buckets' data dirs are reused, not rewritten") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_scope").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos", numBuckets = 8)
    // batch 0 populates several buckets
    sink.merge((0 until 32).map(i => turn(s"c$i", 0, "v", i.toLong)).toDF(), 0L)
    val manifest0 = Files.readString(java.nio.file.Paths.get(dir, "_manifest.0"))
    // batch 1 touches exactly one key → at most one bucket rewritten
    sink.merge(Seq(turn("c0", 0, "v2", 100L)).toDF(), 1L)
    val manifest1 = Files.readString(java.nio.file.Paths.get(dir, "_manifest.1"))
    def entries(m: String) = m.linesIterator.filterNot(_.startsWith("buckets"))
      .map(_.split("\t")).map(a => a(0) -> a(1)).toMap
    val (entries0, entries1) = (entries(manifest0), entries(manifest1))
    val changed = entries1.filter { case (b, d) => entries0.get(b).exists(_ != d) }
    assert(changed.size == 1, s"expected one rewritten bucket, got $changed")
    assert(entries1.filter(_._2.startsWith("data_v0")).size == entries0.size - 1)
    // content correct after the scoped merge
    val rows = tableOf(sink)
    assert(rows.contains(("c0", 0, "v2")) && rows.size == 32)
    // progress lines parse as JSON (listener robustness piggyback)
  }

  test("journal compaction: markers fold into _commits; replayed batch stays a no-op") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_compact").toString
    // threshold 2 → compaction triggers while the table is tiny
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos",
      numBuckets = 4, journalCompactAfter = 2)
    val b0 = Seq(turn("a", 0, "v1", 1)).toDF()
    sink.merge(b0, 0L)
    sink.merge(Seq(turn("a", 1, "v1", 2)).toDF(), 1L)
    sink.merge(Seq(turn("b", 0, "v1", 3)).toDF(), 2L)
    // markers were compacted into the _commits file (dir empty or near-empty)
    val compacted = Files.readString(java.nio.file.Paths.get(dir, "_commits"))
    assert(compacted.linesIterator.toSet.intersect(Set("0", "1")).size == 2,
      s"expected ids 0,1 compacted, got: $compacted")
    assert(sink.committedBatches == Set(0L, 1L, 2L))
    // a REPLAYED batch whose marker was deleted by compaction is still a no-op
    val vBefore = sink.currentVersion
    sink.merge(b0, 0L)
    assert(sink.currentVersion == vBefore)
    assert(tableOf(sink) == Set(("a", 0, "v1"), ("a", 1, "v1"), ("b", 0, "v1")))
    // a reopened sink sees the same journal
    val reopened = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos",
      numBuckets = 4, journalCompactAfter = 2)
    reopened.merge(b0, 0L)
    assert(reopened.currentVersion == vBefore)
    assert(reopened.committedBatches == Set(0L, 1L, 2L))
  }

  test("sink runs against an explicit file: FileSystem URI (Hadoop FS API path)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_fsuri")
    val sink = new MergeSink("file:" + dir.toString, Seq("conv_id", "turn_idx"), "pos")
    sink.merge(Seq(turn("a", 0, "v1", 1), turn("b", 0, "v1", 2)).toDF(), 0L)
    sink.merge(Seq(turn("a", 0, "v2", 10)).toDF(), 1L)
    assert(tableOf(sink) == Set(("a", 0, "v2"), ("b", 0, "v1")))
    // metadata really landed under the local path the URI names
    assert(Files.exists(dir.resolve("_current")))
    assert(Files.exists(dir.resolve("_manifest.1")))
  }

  test("BatchEffect: runs once per committed batch, skipped on re-delivery") {
    import spark.implicits._
    val dir = Files.createTempDirectory("merge_effect").toString
    val sink = new MergeSink(dir, Seq("conv_id", "turn_idx"), "pos")
    val runs = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val audit = new BatchEffect {
      def apply(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
        runs.merge(batchId, 1, (a, b) => a + b)
    }
    val b0 = Seq(turn("a", 0, "v1", 1)).toDF()
    sink.merge(b0, 0L, effects = Seq(audit))
    sink.merge(b0, 0L, effects = Seq(audit))               // replay → skipped
    sink.merge(Seq.empty[TurnPos].toDF(), 1L,
      effects = Seq(audit))                                // empty batch still journals
    sink.merge(b0, 1L, effects = Seq(audit))               // replay of empty id → skipped
    assert(runs.get(0L) == 1 && runs.get(1L) == 1)
    assert(tableOf(sink) == Set(("a", 0, "v1")))
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
