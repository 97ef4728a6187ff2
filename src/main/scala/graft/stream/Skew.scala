package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key (hot conversation) skew handling, per the north rule: salted
  * repartitioning on conv_id plus AQE skew-join splitting.
  *
  *   - For stateless stages: [[repartitionSalted]] spreads a hot key over
  *     `saltBuckets` partitions; downstream per-key aggregation runs
  *     two-stage (partial on (key, salt), final on key) — see
  *     CepOps.q_skew_salted_agg for the oracle-checked shape.
  *   - For joins: enable AQE (`spark.sql.adaptive.enabled`,
  *     `spark.sql.adaptive.skewJoin.enabled`) and let runtime re-planning
  *     split oversized partitions; nothing to do per-query.
  *   - For the stateful ops (order repair), per-key state REQUIRES all rows
  *     of a conv in one partition — skew there is bounded by max turns per
  *     conversation, which the generator's Zipf cap keeps modest; the salt
  *     applies to the pre-shuffle map work, not the keyed state.
  */
object Skew {

  /** Deterministic salt: derived from the key plus a caller-supplied stable
    * tiebreaker column (e.g. turn position). A nondeterministic salt such as
    * `monotonically_increasing_id()`/`rand()` is the classic
    * repartition-correctness hazard: a recomputed map task after shuffle-
    * fetch failure produces DIFFERENT salt values than the lost output, so
    * rows duplicate or vanish. Requiring the tiebreaker keeps retries
    * bit-identical.
    */
  def saltCol(key: String, tiebreaker: org.apache.spark.sql.Column,
              saltBuckets: Int): org.apache.spark.sql.Column =
    pmod(hash(col(key), tiebreaker), lit(saltBuckets))

  /** Repartition by (key, salt) — same key spreads over up to `saltBuckets`
    * of the `numPartitions` output partitions (hash of the composite key,
    * so distinct salts may collide; raise saltBuckets ≥ 2× the partition
    * count for a near-uniform spread of one hot key).
    */
  def repartitionSalted(df: DataFrame, key: String,
                        tiebreaker: org.apache.spark.sql.Column,
                        saltBuckets: Int,
                        numPartitions: Option[Int] = None): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(key, tiebreaker, saltBuckets))
    numPartitions.map(n => salted.repartition(n, col(key), col("__salt")))
      .getOrElse(salted.repartition(col(key), col("__salt")))
      .drop("__salt")
  }
}
