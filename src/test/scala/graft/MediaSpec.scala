package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.media.{ImageIODecoder, Media}

/** Multimodal plumbing truth table: hand-computed frame fan-out and resize
  * planning for known payload sizes (the codec is the deterministic fake;
  * what's under test is the Spark shape — fan-out, laziness, schema,
  * integer math).
  */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payloads(sizes: (Long, Int)*) =
    sizes.map { case (id, n) => (id, "x" * n) }.toSeq
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("frameSample: every 2nd 64-byte frame, short tail, empty payload → no rows") {
    // 200 bytes → frames 0..3 (lens 64,64,64,8) → sampled 0,2
    // 64 bytes  → frame 0 only
    // 0 bytes   → nothing
    val got = Media.frameSample(payloads(1L -> 200, 2L -> 64, 3L -> 0), "doc_id", "payload")
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame_off, f.frame_len)).toSet
    assert(got == Set(
      (1L, 0L, 0L, 64), (1L, 2L, 128L, 64),
      (2L, 0L, 0L, 64)))
  }

  test("frameSample: everyN=1 yields all frames including the short tail") {
    val got = Media.frameSample(payloads(1L -> 130), "doc_id", "payload", everyN = 1)
      .collect().map(f => (f.frame_idx, f.frame_len)).toSet
    assert(got == Set((0L, 64), (1L, 64), (2L, 2)))
  }

  test("ImageIODecoder: real PNG decode through the extractMeta plumbing") {
    // checked-in 13x7 RGB PNG fixture (deterministically generated)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/media/fixture.png"))
    val df = Seq((1L, bytes), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = Media.extractMeta(df, "doc_id", "payload", ImageIODecoder)
      .collect().map(m => (m.doc_id, m.n_bytes, m.width, m.height, m.first_byte)).toSet
    assert(got == Set(
      (1L, bytes.length, 13, 7, 0x89), // real dims from the JDK codec; PNG magic byte
      (2L, 12, -1, -1, 'n'.toInt))) // unrecognized payload → marker row, no failure
  }

  test("resizeMeta: no upscale, width-bound, height-bound, 1px floor") {
    // n=100 → w0=101, h0=(700%480)+1=221 → height-bound? 101*120 (12120) vs
    // 221*160 (35360) → 12120 < 35360 → height-bound: dst=(101*120/221, 120)=(54,120)
    // n=10 → w0=11, h0=71 → fits → (11,71)
    val got = Media.resizeMeta(payloads(1L -> 100, 2L -> 10), "doc_id", "payload")
      .collect().map(r => (r.doc_id, r.src_w, r.src_h, r.dst_w, r.dst_h)).toSet
    assert(got == Set(
      (1L, 101L, 221L, 54L, 120L),
      (2L, 11L, 71L, 11L, 71L)))
  }
}
