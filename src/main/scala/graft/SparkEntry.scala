package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Headline, Registry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[graft.queries.Registry]] (Parity = SURVEY §2 operator
  * inventory, Headline = joins/windows/top-k/as-of/event-time, Extensions =
  * dedup/similarity/text/multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Headline.h1.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (plus extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
