package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) rides as an opaque
  * `binary` column with typed metadata extracted by a per-partition decoder.
  * The Spark-side shape is real — binary column, mapPartitions batching,
  * deterministic output schema, partition-preserving — while the actual
  * codec is stubbed ([[FakeDecoder]]) because no image/audio libraries exist
  * in this container. Swap [[MediaDecoder]] for a JNI/JavaCV-backed
  * implementation on a real cluster; nothing else changes.
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

/** Real codec goes here on a cluster with media libraries installed. */
object UnimplementedDecoder extends MediaDecoder {
  def decode(id: Long, bytes: Array[Byte]): MediaMeta =
    ??? // requires image/audio codecs not present in this sandbox
}

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
}
