package graft

import graft.queries.{CoreQueries, EventQueries, GffQueries, StreamQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are grouped by module: CoreQueries (interval/as-of/closure/
  * coverage/sampling), EventQueries (windowed feature engineering).
  */
object SparkEntry {
  /** Flagship: assembled entity×timestamp feature rows — lag + rolling +
    * backfill + session + point-in-time as-of in two shuffles (north_rule
    * metric unit), on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.q31(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++ GffQueries.defs ++
      StreamQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++ GffQueries.oracles ++
      StreamQueries.oracles
}
