package graft

import org.apache.spark.sql.SparkSession

/** Session factory.
  *
  * Tuned for the harness's single-JVM `local[N]` mode but every setting
  * transfers to a real cluster: AQE (runtime re-plan, skew-join splitting,
  * partition coalescing) is what keeps the same code viable from 60k rows to
  * 100 TB; shuffle partitions default to the core count locally and would be
  * raised (or left to AQE) on a cluster.
  */
object GraftSession {
  def cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Get-or-create a session with graft defaults. */
  def get(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
