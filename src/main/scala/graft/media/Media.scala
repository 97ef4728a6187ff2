package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) rides as an opaque
  * `binary` column with typed metadata extracted by a per-partition decoder.
  * The Spark-side shape is real — binary column, mapPartitions batching,
  * deterministic output schema, partition-preserving. Two decoders ship:
  * [[ImageIODecoder]] does REAL image decode via the JDK's `javax.imageio`
  * codecs (PNG/JPEG/BMP/GIF — no extra jars), and [[FakeDecoder]] produces
  * deterministic arithmetic metadata so fixtures and the DuckDB oracle can
  * verify the plumbing byte-for-byte. Audio/video codecs are not in this
  * container; a JNI/JavaCV-backed [[MediaDecoder]]/[[FrameDecoder]] drops in
  * behind the same interface on a real cluster and nothing else changes.
  */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    first_byte: Int
)

trait MediaDecoder extends Serializable {
  def decode(id: Long, bytes: Array[Byte]): MediaMeta
}

/** Deterministic fake decode: metadata derived arithmetically from the byte
  * stream, so tests and oracles can verify the plumbing end-to-end.
  */
object FakeDecoder extends MediaDecoder {
  def decode(id: Long, bytes: Array[Byte]): MediaMeta =
    MediaMeta(id, bytes.length, bytes.length % 640, (bytes.length * 7) % 480,
      if (bytes.isEmpty) -1 else bytes(0) & 0xff)
}

/** Real image decode via the JDK's own codecs: `javax.imageio` ships
  * PNG/JPEG/BMP/GIF readers with zero extra jars, so actual width/height
  * come from the decoder. The ImageIO registry lookup is JVM-global and
  * thread-safe; one call per row is the codec's own amortization (no native
  * context to cache, unlike the JavaCV-style decoders this interface also
  * admits). A payload no installed reader recognizes — or a corrupt image —
  * decodes to (-1, -1) dims instead of failing the partition, so one bad
  * blob in a 100 TB scan costs one marker row, not a task retry storm.
  */
object ImageIODecoder extends MediaDecoder {
  def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    MediaMeta(id, bytes.length,
      if (img == null) -1 else img.getWidth,
      if (img == null) -1 else img.getHeight,
      if (bytes.isEmpty) -1 else bytes(0) & 0xff)
  }
}

/** One sampled frame of a (fake-)video payload: provenance offsets so a
  * downstream stage can seek into the original blob.
  */
case class FrameMeta(doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Int)

/** Frame decoder contract: a real implementation demuxes the container and
  * yields every `everyN`-th frame; the deterministic fake treats the payload
  * as fixed-size frames so the row-explosion plumbing is oracle-checkable.
  */
trait FrameDecoder extends Serializable {
  def frames(id: Long, bytes: Array[Byte], frameBytes: Int,
             everyN: Int): Iterator[FrameMeta]
}

object FakeFrameDecoder extends FrameDecoder {
  def frames(id: Long, bytes: Array[Byte], frameBytes: Int,
             everyN: Int): Iterator[FrameMeta] = {
    val n = bytes.length
    val total = (n + frameBytes - 1) / frameBytes
    Iterator.range(0, total, everyN).map(i =>
      FrameMeta(id, i.toLong, i.toLong * frameBytes,
        math.min(frameBytes, n - i * frameBytes)))
  }
}

/** Resize planning metadata: source dims (from the decoder) and the
  * fit-within-box target dims, aspect preserved, integer math only (so both
  * engines agree bit-for-bit — no float scale factors).
  */
case class ResizeMeta(doc_id: Long, src_w: Long, src_h: Long, dst_w: Long, dst_h: Long)

object Media {

  /** Attach a binary payload column and run the decoder partition-wise.
    * One decoder instance per partition (mapPartitions, not map) — the shape
    * a real codec needs for amortized init (native contexts, model weights).
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String,
                  decoder: MediaDecoder = FakeDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decoder.decode(id, bytes) } }
  }

  /** Frame sampling: one input row fans out to one row per sampled frame
    * (flatMap inside mapPartitions — the decoder is amortized per
    * partition, and a giant payload never materializes all its frames at
    * once because the iterator is lazy). Empty payloads yield no frames.
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int = 64, everyN: Int = 2,
                  decoder: FrameDecoder = FakeFrameDecoder): Dataset[FrameMeta] = {
    require(frameBytes > 0 && everyN > 0, "frameBytes and everyN must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) => decoder.frames(id, bytes, frameBytes, everyN) }
      }
  }

  /** Fit-within-box resize planning over decoded dimensions. Integer-only
    * arithmetic (floor division, floor at 1px) keeps the fake-decode path
    * byte-identical across engines; a real implementation hands `dst_w/h`
    * to the codec's scaler.
    */
  def resizeMeta(df: DataFrame, idCol: String, binCol: String,
                 maxW: Long = 160L, maxH: Long = 120L): Dataset[ResizeMeta] = {
    require(maxW > 0 && maxH > 0, "target box must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val w0 = n % 640 + 1 // fake decode dims (nonzero by construction)
          val h0 = (n * 7) % 480 + 1
          val (dw, dh) =
            if (w0 <= maxW && h0 <= maxH) (w0, h0) // never upscale
            else if (w0 * maxH >= h0 * maxW)
              (maxW, math.max(1L, h0 * maxW / w0)) // width-bound
            else
              (math.max(1L, w0 * maxH / h0), maxH) // height-bound
          ResizeMeta(id, w0, h0, dw, dh)
        }
      }
  }
}
