package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming dedup, the `Unique` transformation's two streaming flavors
  * (SURVEY.md §2.2):
  *   - drop flavor — `dropDuplicatesWithinWatermark` keeps the first arrival
  *     per key and expires key state once the watermark passes (bounded
  *     state at 10^12-turn scale);
  *   - flag flavor — the batch `UniqueFlag` transformation (min-pos winner,
  *     duplicate-of pointer) applied per micro-batch via foreachBatch when
  *     the duplicate-of provenance must be preserved.
  */
object StreamDedup {

  def dropWithinWatermark(df: DataFrame, keys: Seq[String],
                          tsCol: String = "ts", delay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
