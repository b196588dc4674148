package graft

import org.apache.spark.sql.SparkSession

/** Per-query plan-dump helper for optimization-round before/after artifacts:
  * writes `plans/<round>/<query>_<tag>.txt` with the `explain("formatted")`
  * output of each named query.
  *
  * Usage: `sbt "runMain graft.ExplainOne r17 before x_theil_sen x_acf ..."`
  * (args: round dir, tag, then exact query names).
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainOne <roundDir> <tag> <query>...")
    val round = args(0)
    val tag   = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"plans/$round"))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"plans/$round/${name}_$tag.txt"),
            plan.getBytes("UTF-8"))
          println(s"wrote plans/$round/${name}_$tag.txt")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
