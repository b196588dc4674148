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
  *
  * `genOracle` is an OPTIONAL second referee used ONLY for generated-scale
  * sweeps (gen30/gen100 dirs from [[graft.GenData]]): a cheaper SQL face that
  * exploits structure GenData guarantees BY CONSTRUCTION (near-duplicate
  * pairs planted exclusively at adjacent doc_ids; video pixel grids that
  * reduce to per-doc byte histograms). It must compute the SAME rows as the
  * primary oracle on any GenData dir — the sweep cross-checks the two faces
  * at a scale where both run (both green on one dump ⇒ they agree) before
  * the cheap face is trusted at 100×. The driver's sf0.01/sf0.1 gates always
  * use the primary oracle; `tools/sweep_correctness.py` only reads the gen
  * face when ORACLE_OVERLAY points at the dumped gen_oracle_sql.json.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    genOracle: Option[String] = None
)

object Registry {
  def all: Seq[Q] = Parity.qs ++ Headline.qs ++ Extensions.qs ++ Indexing.qs ++ Serving.qs ++ Media.qs ++ MediaVideo.qs ++ Governance.qs ++ Patterns.qs ++ Analytics.qs ++ RankStats.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql), _) => n -> sql }.toMap

  /** GenData-only oracle faces (see [[Q.genOracle]]); keys ⊆ oracleSql keys. */
  def genOracleSql: Map[String, String] =
    all.collect { case Q(n, _, _, Some(sql)) => n -> sql }.toMap
}
