package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query/oracle maps. Keys are unique by
  * construction (each module uses its own prefix).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_sales_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ OperatorQueries.queries ++ ExtensionQueries.queries ++ SimilarityQueries.queries ++ StreamQueries.queries ++ AnalyticsQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ OperatorQueries.oracles ++ ExtensionQueries.oracles ++ SimilarityQueries.oracles ++ StreamQueries.oracles ++ AnalyticsQueries.oracles ++ GraphQueries.oracles
}
