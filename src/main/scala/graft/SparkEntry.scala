package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{AnnQueries, CoreQueries, DedupQueries, EventQueries, ExtendedQueries, GraphQueries, MultimodalQueries, PipelineQueries, SourceQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory maps SURVEY.md §2's operator list (plus the
  * training-data-pipeline extensions) onto the test corpus; each entry has a
  * DuckDB oracle in [[oracleSql]] with byte-identical column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ AnnQueries.queries ++ MultimodalQueries.queries ++
      ExtendedQueries.queries ++ PipelineQueries.queries ++ SourceQueries.queries ++
      GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ EventQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ AnnQueries.oracle ++ MultimodalQueries.oracle ++
      ExtendedQueries.oracle ++ PipelineQueries.oracle ++ SourceQueries.oracle ++
      GraphQueries.oracle
}
