package graft

import graft.queries.{AdvancedQueries, AnalyticsQueries, CoreQueries, CorpusQueries, CurationQueries, DataQueries, ExtendedQueries, GraphQueries, LoanQueries, PipelineQueries, RetrievalQueries, ScaleQueries, SeededAnnQueries, TemporalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each module under [[graft.queries]] exposes
  * `Seq[QueryDef]`; the maps below are derived from them. Every query
  * with SQL-expressible semantics carries a DuckDB oracle; the rest
  * (ML, LSH, hashing) get the driver's rows-only check.
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    CoreQueries.all ++ LoanQueries.all ++ DataQueries.all ++
      AdvancedQueries.all ++ ExtendedQueries.all ++ PipelineQueries.all ++
      CurationQueries.all ++ ScaleQueries.all ++ CorpusQueries.all ++
      AnalyticsQueries.all ++ TemporalQueries.all ++ SeededAnnQueries.all ++
      RetrievalQueries.all ++ GraphQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03JoinAgg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
