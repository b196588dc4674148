package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's predicate pushdown
  * and column pruning reach the scan — callers must NOT cache or collect here;
  * the scan must stay lazy so a downstream `select`/`filter` prunes IO.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is a nanosecond parquet timestamp, which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong` and
    * the ns→µs truncation happens here (integer `div`, matching DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast). NTZ to align with the oracle's naive
    * timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
