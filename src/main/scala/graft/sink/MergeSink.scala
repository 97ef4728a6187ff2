package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exactly-once keyed MERGE sink — the Spark-native replacement for the
  * reference's per-record `DbCommand` upsert path (reference:
  * src/Shipwright.Core/Dataflows/Transformations/DbCommand.cs:118-144).
  *
  * The north rule asks for Iceberg MERGE INTO; no Iceberg/Delta runtime
  * exists in this sandbox (see BASELINE.md), so the same contract is
  * realized Iceberg-style over hash-bucketed parquet with a manifest:
  *
  *   - the table is `numBuckets` hash-buckets of the key; a manifest maps
  *     bucket → current data directory (Iceberg's manifest-of-data-files,
  *     one entry per bucket)
  *   - merge(batch) touches ONLY the buckets containing batch keys: read
  *     those buckets ∪ batch, keep newest per key (batch beats current;
  *     within a batch, max `versionCol` wins), write replacement bucket
  *     dirs, publish a new manifest that references the untouched buckets'
  *     existing dirs — a partition-scoped merge, not a table rewrite
  *   - commit = write `_manifest.{N}`, atomically flip `_current`; the
  *     `_commits` journal records applied batch ids, so a re-delivered
  *     micro-batch (same batchId after restart) is a no-op:
  *     foreachBatch + checkpoint ⇒ exactly-once
  *
  * At 10^12-turn scale the bucket count rises with the key cardinality via
  * [[rebucket]] (read-all → re-hash → one commit), and the per-batch work
  * stays proportional to the batch's key spread, exactly like Iceberg's
  * merge-on-read partition pruning. A real Iceberg catalog drops in behind
  * the same merge(batch, batchId) interface.
  */
class MergeSink(tableDir: String, keyCols: Seq[String], versionCol: String,
                numBuckets: Int = 16) {
  require(keyCols.nonEmpty, "MergeSink needs at least one key column")
  require(versionCol.trim.nonEmpty, "MergeSink needs a version column")
  require(numBuckets > 0, "MergeSink needs a positive bucket count")

  private val root = Paths.get(tableDir)
  Files.createDirectories(root)

  private def currentPtr: Path = root.resolve("_current")
  private def commitsPtr: Path = root.resolve("_commits")
  private def manifestPath(v: Long): Path = root.resolve(s"_manifest.$v")

  def currentVersion: Long =
    if (Files.exists(currentPtr)) Files.readString(currentPtr).trim.toLong else -1L

  // Tolerate a truncated/garbled trailing line (crash mid-write before the
  // journal became tmp+atomic-move): an unparsable id is simply not
  // committed, so the batch re-merges idempotently instead of wedging.
  private def committedBatches: Set[Long] =
    if (Files.exists(commitsPtr))
      Files.readString(commitsPtr).split("\n")
        .flatMap(l => scala.util.Try(l.trim.toLong).toOption).toSet
    else Set.empty

  /** bucket → data dir (relative to root). */
  private def readManifest(v: Long): Map[Int, String] =
    if (v < 0 || !Files.exists(manifestPath(v))) Map.empty
    else Files.readString(manifestPath(v)).split("\n")
      .filter(l => l.nonEmpty && !l.startsWith("buckets\t")).map { line =>
        val Array(b, dir) = line.split("\t")
        b.toInt -> dir
      }.toMap

  private def readBucketCount(v: Long): Option[Int] =
    if (v < 0 || !Files.exists(manifestPath(v))) None
    else Files.readString(manifestPath(v)).split("\n")
      .find(_.startsWith("buckets\t")).map(_.split("\t")(1).toInt)

  /** Effective bucket width AT a manifest version: the JOURNALED width wins
    * over the constructor argument (an Iceberg-table-property analog).
    * merge() re-reads it from the exact version it merges against, so a
    * concurrent [[rebucket]] from another instance/process — or a rebucket
    * that failed mid-write — can never leave this instance hashing keys
    * with a width that disagrees with the manifest it reads.
    */
  private def widthAt(v: Long): Int = readBucketCount(v).getOrElse(numBuckets)

  def bucketCount: Int = widthAt(currentVersion)

  private def bucketCol(width: Int) = pmod(hash(keyCols.map(col): _*), lit(width))

  def read(spark: SparkSession): DataFrame = {
    val dirs = readManifest(currentVersion).values.toSeq.distinct
      .map(d => root.resolve(d).toString)
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs: _*).drop("__bucket")
  }

  def isEmpty: Boolean = readManifest(currentVersion).isEmpty

  /** Idempotent keyed merge of one micro-batch. Safe to call from
    * `foreachBatch`; re-delivery of an applied batchId is a no-op.
    *
    * `deleteCol`: optional boolean column marking TOMBSTONES — the MERGE's
    * `WHEN MATCHED AND <del> THEN DELETE` arm (the reference DbCommand's
    * arbitrary-SQL surface includes deletes). A tombstone removes its key
    * from the table; within a batch the newest row per key (by
    * `versionCol`) decides whether the key survives. Replays converge:
    * deleting an absent key is a no-op.
    */
  def merge(batch: DataFrame, batchId: Long,
            deleteCol: Option[String] = None): Unit = synchronized {
    if (committedBatches.contains(batchId)) return
    val spark = batch.sparkSession
    val v = currentVersion
    val manifest = readManifest(v)
    val width = widthAt(v) // the width THIS manifest was written with

    val keyed = batch
      .withColumn("__del",
        deleteCol.map(c => coalesce(col(c).cast("boolean"), lit(false)))
          .getOrElse(lit(false)))
      .drop(deleteCol.toSeq: _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("__bucket", bucketCol(width))

    val touched = keyed.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) { journal(v, manifest, batchId, width); return }

    // current rows of ONLY the touched buckets (partition-scoped read)
    val touchedDirs = manifest.filter { case (b, _) => touched.contains(b) }
      .values.toSeq.distinct.map(d => root.resolve(d).toString)
    val merged = {
      val withCur =
        if (touchedDirs.isEmpty) keyed
        else {
          // manifest entries point INSIDE __bucket=b partition dirs, so the
          // read is already bucket-scoped; the partition column is not in
          // the files — recompute it for the union/write
          val cur = spark.read.parquet(touchedDirs: _*)
            .withColumn("__bucket", bucketCol(width))
            .withColumn("__del", lit(false))
            .withColumn("__gen", lit(0))
          cur.unionByName(keyed.withColumn("__gen", lit(1)))
            .withColumn("__rn", row_number().over(
              Window.partitionBy(keyCols.map(col): _*)
                .orderBy(col("__gen").desc))) // batch row beats current row
            .filter(col("__rn") === 1).drop("__rn", "__gen")
        }
      // tombstone winners delete their key (WHEN MATCHED AND del THEN DELETE)
      withCur.filter(!col("__del")).drop("__del")
    }

    val next = v + 1
    val dataDir = s"data_v$next"
    merged
      .repartition(math.min(touched.size, width), col("__bucket"))
      .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
      .parquet(root.resolve(dataDir).toString)

    // a tombstone batch can empty a touched bucket entirely — only buckets
    // that actually wrote rows enter the manifest; emptied ones drop out
    val written = writtenBuckets(dataDir)
    val newManifest = manifest.filterNot { case (b, _) => touched.contains(b) } ++
      (touched & written).map(b => b -> s"$dataDir/__bucket=$b")
    journal(next, newManifest, batchId, width)
    gc(newManifest)
  }

  /** Admin migration: rewrite the WHOLE table at a new bucket width under
    * the next manifest version — read-all → re-hash → one atomic commit
    * (the usual write-data-then-flip discipline; a crash leaves the old
    * version current). Run it when key cardinality has outgrown the width
    * (per-bucket dirs getting too large); subsequent merges and reopened
    * sinks pick the journaled width up automatically.
    */
  def rebucket(spark: SparkSession, newBuckets: Int): Unit = synchronized {
    require(newBuckets > 0, "rebucket needs a positive bucket count")
    val v = currentVersion
    if (newBuckets == widthAt(v)) return
    val all = read(spark)
    val next = v + 1
    val newManifest =
      if (readManifest(v).isEmpty) Map.empty[Int, String]
      else {
        val dataDir = s"data_v$next"
        all.withColumn("__bucket", bucketCol(newBuckets))
          .repartition(math.min(newBuckets, 512), col("__bucket"))
          .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
          .parquet(root.resolve(dataDir).toString)
        writtenBuckets(dataDir).map(b => b -> s"$dataDir/__bucket=$b").toMap
      }
    // nothing mutates until this atomic flip: a failed write above leaves
    // the old version (and old width) current
    writeVersion(next, newManifest, newBuckets)
    gc(newManifest)
  }

  private def writtenBuckets(dataDir: String): Set[Int] =
    Option(root.resolve(dataDir).toFile.listFiles())
      .getOrElse(Array.empty)
      .collect { case f if f.getName.startsWith("__bucket=") =>
        f.getName.stripPrefix("__bucket=").toInt }
      .toSet

  private def journal(version: Long, manifest: Map[Int, String], batchId: Long,
                      width: Int): Unit = {
    writeVersion(version, manifest, width)
    val ctmp = root.resolve("_commits.tmp")
    Files.writeString(ctmp,
      (committedBatches + batchId).toSeq.sorted.mkString("", "\n", "\n"))
    Files.move(ctmp, commitsPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Manifest (with its journaled bucket width) + atomic `_current` flip. */
  private def writeVersion(version: Long, manifest: Map[Int, String], width: Int): Unit = {
    Files.writeString(manifestPath(version),
      (s"buckets\t$width" +:
        manifest.toSeq.sortBy(_._1).map { case (b, d) => s"$b\t$d" })
        .mkString("", "\n", "\n"))
    val tmp = root.resolve("_current.tmp")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Remove data dirs no manifest entry references (keep the live set). */
  private def gc(live: Map[Int, String]): Unit = {
    val liveDirs = live.values.map(_.split("/").head).toSet
    Option(root.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith("data_v") && !liveDirs.contains(f.getName))
        try deleteRecursively(f.toPath) catch { case NonFatal(_) => }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p) // a Stream holding a directory handle
      try children.forEach(deleteRecursively) finally children.close()
    }
    Files.deleteIfExists(p)
  }
}
