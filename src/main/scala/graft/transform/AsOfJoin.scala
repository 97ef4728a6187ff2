package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the single LATEST right
  * row with `right.ts <= left.ts` in the same key group — the temporal
  * generalization of the reference's DbLookup enrichment (reference:
  * src/Shipwright.Core/Dataflows/Transformations/DbLookup.cs matches
  * exactly-one row by key equality; as-of matches "the version that was
  * current at event time"). Left rows with no prior right row keep nulls
  * (left-join semantics).
  *
  * Scale design: deliberately NOT a range join — Spark plans a
  * non-equi-join as a broadcast nested loop (OOM at 100 TB) or, with an
  * equi-key plus range predicate, as a per-key sort-merge whose worst case
  * is |L_k|×|R_k| per key. Instead both sides are tagged and unioned, then
  * ONE hash exchange on the key plus one in-partition sort by
  * (ts, side, ord) lets `last(payload, ignoreNulls)` over a running
  * unbounded-preceding window carry each right row's payload forward to
  * every later left row. Total cost = one shuffle of |L|+|R| rows — the
  * same exchange any per-key window pays — and the whole operator is
  * codegen'd (union, sort, window, project). Hot keys split like any other
  * skewed sort-window (salt the key upstream if a single key exceeds a
  * partition).
  *
  * Tie semantics (deterministic): a right row at ts == left.ts IS visible
  * (`<=`, side 0 sorts before side 1); among right rows with equal ts the
  * one with the greatest `rightOrd` wins (sort is ascending, the running
  * `last` keeps the latest).
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightOrd: String,
           rightVals: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payload = rightVals.distinct
    val payloadType = right.select(struct(payload.map(col): _*)).schema.head.dataType
    val leftRowType = left.select(struct(left.columns.map(col): _*)).schema.head.dataType

    val l2 = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__ord"),
      lit(null).cast(payloadType).as("__rv"),
      struct(left.columns.map(col): _*).as("__lrow"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      col(rightOrd).cast("long").as("__ord"),
      struct(payload.map(col): _*).as("__rv"),
      lit(null).cast(leftRowType).as("__lrow"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__carry", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__lrow.*") +:
        payload.map(v => col(s"__carry.$v").as(prefix + v)): _*)
  }
}
