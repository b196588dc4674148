package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) an equivalent DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * Every multi-row result carries an explicit deterministic ORDER BY on both
  * sides. That sort is presentation-only (it makes the oracle hash stable);
  * it is applied at the very top of the plan so Catalyst still pushes
  * filters/pruning beneath it, and result sets are kept small-to-moderate so
  * the global sort never dominates.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object Registry {
  def all: Seq[Q] = Parity.qs ++ Headline.qs ++ Extensions.qs ++ Indexing.qs ++ Serving.qs ++ Media.qs ++ MediaVideo.qs ++ Governance.qs ++ Patterns.qs ++ Analytics.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
