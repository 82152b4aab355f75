package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.analytics contributes (name, query, oracle)
  * triples; queries without DuckDB-expressible semantics contribute None
  * and get the driver's weaker rows-only check.
  */
object SparkEntry {

  private def modules: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    analytics.Relational.defs ++ analytics.ChainOps.defs ++
      analytics.LLMOps.defs ++ analytics.TemporalOps.defs ++
      analytics.CurationOps.defs ++ analytics.ScaleOps.defs ++
      analytics.GraphOps.defs ++ analytics.MiningOps.defs ++
      analytics.StatsOps.defs ++ analytics.EvalOps.defs ++
      analytics.AuditOps.defs ++ analytics.InferOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pricing summary always yields the 6 (returnflag, linestatus)
    * groups regardless of scale factor.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.collect { case (n, _, Some(sql)) => n -> sql.trim }.toMap
}
