package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one named query
  * here (via the [[QueryModule]]s below); SQL-expressible ones also carry
  * a DuckDB oracle twin that the driver hash-compares at sf0.01.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.CoreRelational,
    operators.ScalarFns,
    operators.TimeWindows,
    operators.TextPipeline,
    operators.Curation,
    operators.Scoring,
    operators.Retrieval,
    operators.Similarity,
    operators.Dedup,
    operators.Multimodal,
    operators.Advanced,
    operators.Analytics,
    operators.Evaluation,
    operators.Insights,
    operators.Operational,
    operators.Learning,
    operators.Linkage,
    operators.Mining,
    operators.Statistics,
    operators.Inference,
    operators.Modeling,
    operators.Diagnostics,
    operators.CorpusStats,
    operators.EffectSizes,
    operators.Activity,
    operators.Experiments,
    operators.Association,
    operators.Stratified,
    operators.Calibration,
    operators.Telemetry,
    operators.Macros,
    operators.Features,
    operators.Validation,
    operators.Integrity,
    operators.Relevance,
    operators.Auditing,
    operators.Training,
    operators.TrainingMix,
    operators.Selection,
    operators.Tuning,
    operators.Trends,
    operators.Formats,
    operators.Matching,
    operators.Planner,
    operators.XmlQueries,
    operators.ExtensionFns,
    operators.Coresets,
    operators.CorpusAudit,
    streaming.StreamingSmoke,
    streaming.StatefulSession,
    streaming.StatefulEwma,
    streaming.StatefulLag,
    streaming.StatefulGaps,
    streaming.StatefulPit,
    streaming.StatefulSprt,
    streaming.StatefulFunnel,
    streaming.StatefulBandIndex,
    streaming.LateData)

  /** Flagship query (TPC-H Q1-shaped aggregation over lineitem) on
    * sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (xxhash64-based signatures, streaming) → driver records a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.map(_.oracle).reduce(_ ++ _)
}
