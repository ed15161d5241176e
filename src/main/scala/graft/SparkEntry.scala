package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one named entry per implemented operator
  * (SURVEY.md §2 inventory + the training-data extensions); `oracleSql`
  * carries the DuckDB-equivalent ANSI SQL for the hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join (fact ⋈ broadcast dims) + windowed aggregation + top-k —
    * exercises scan, broadcast join, shuffle agg, sort, limit in one plan.
    *
    * NOTE: entry must stay free of graft's injected functions
    * (bounded_topk / cosine_sim / l2_sq) — the caller's session may not
    * register GraftExtensions. The vector queries in [[queries]] DO need
    * it; Verify/Bench/tests all set `spark.sql.extensions`.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalQueries.queries("q_star_join")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.TextQueries.queries ++
      operators.VectorQueries.queries ++
      operators.EventQueries.queries ++
      operators.Multimodal.queries ++
      operators.Curation.queries ++
      operators.Winnow.queries ++
      operators.Chunking.queries ++
      operators.NeoQueries.queries ++
      operators.Hierarchy.queries ++
      operators.Association.queries ++
      operators.Experiments.queries ++
      operators.TextRank.queries ++
      operators.Search.queries ++
      operators.Lifecycle.queries ++
      operators.SqlSurface.queries ++
      operators.Privacy.queries ++
      operators.Sketches.queries ++
      operators.Features.queries ++
      operators.OpsGate.queries ++
      operators.CountMin.queries ++
      operators.Calibration.queries ++
      operators.ZOrder.queries ++
      streaming.StreamGateQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracle ++
      operators.TextQueries.oracle ++
      operators.VectorQueries.oracle ++
      operators.EventQueries.oracle ++
      operators.Multimodal.oracle ++
      operators.Curation.oracle ++
      operators.Winnow.oracle ++
      operators.Chunking.oracle ++
      operators.NeoQueries.oracle ++
      operators.Hierarchy.oracle ++
      operators.Association.oracle ++
      operators.Experiments.oracle ++
      operators.TextRank.oracle ++
      operators.Search.oracle ++
      operators.Lifecycle.oracle ++
      operators.SqlSurface.oracle ++
      operators.Privacy.oracle ++
      operators.Sketches.oracle ++
      operators.Features.oracle ++
      operators.OpsGate.oracle ++
      operators.CountMin.oracle ++
      operators.Calibration.oracle ++
      operators.ZOrder.oracle ++
      streaming.StreamGateQueries.oracle
}
