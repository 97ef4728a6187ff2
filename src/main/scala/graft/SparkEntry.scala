package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-domain modules under graft.queries.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.ReferenceOps.defs ++ graft.queries.CepOps.defs ++
      graft.queries.TextOps.defs ++ graft.queries.VectorOps.defs ++
      graft.queries.RelOps.defs ++ graft.queries.GraphOps.defs ++
      graft.queries.PipelineOps.defs ++ graft.queries.ConvOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.ReferenceOps.oracles ++ graft.queries.CepOps.oracles ++
      graft.queries.TextOps.oracles ++ graft.queries.VectorOps.oracles ++
      graft.queries.RelOps.oracles ++ graft.queries.GraphOps.oracles ++
      graft.queries.PipelineOps.oracles ++ graft.queries.ConvOps.oracles
}
