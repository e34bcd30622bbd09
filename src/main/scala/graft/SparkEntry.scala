package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-area registries in `graft.queries`;
  * every entry with an oracle is hash-compared against DuckDB by the driver.
  */
object SparkEntry {

  private def registry: Map[String, QueryDef] =
    PipelineQueries.defs ++ RelationalQueries.defs ++ TpchQueries.defs ++
      ExtensionQueries.defs ++ AnalyticsQueries.defs ++ TrainingQueries.defs ++
      CleaningQueries.defs ++ MaintenanceQueries.defs ++ StatsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3: dim filter → two joins → exact-decimal top-10 (136 grouped
    * orders pre-limit at sf0.001, so the smoke check has headroom). */
  def entry(spark: SparkSession): DataFrame =
    registry("q_tpch_q3").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
