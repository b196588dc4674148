package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four published benchmark workloads (BASELINE.md) over its
  * own fixture CSVs, re-expressed relationally.
  *
  * The reference operators naive-split each raw line on "," and address
  * columns by position (`misc/lichess_op_1.go:23-31`, `misc/rate_filter_operator
  * .go:24-41`); that exact semantic is reproduced here — `split(value, ",")` +
  * `element_at` — so header rows and unparsable numerics fall out of the value
  * predicates just as they do in the reference binaries. Each workload is one
  * declarative pipeline: Catalyst fuses the filter+project into the scan and
  * adds map-side partial aggregation the reference lacks (SURVEY §4).
  */
object ReferenceWorkloads {

  /** Load a CSV-ish text file the way the reference streams it: raw lines,
    * naive comma split, 1-based field accessor below.
    */
  def loadNaiveCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).select(split(col("value"), ",").as("f"))

  // 0-based like the reference. try_element_at: a ragged/short row (e.g. a
  // blank line) yields null and falls out of the value predicates, matching
  // the reference binaries' skip-on-error behavior — ANSI element_at would
  // throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT and fail the job.
  private def fld(i: Int): Column = try_element_at(col("f"), lit(i + 1))

  /** L-simple (`misc/lichess_op_1.go` ∘ `lichess_op_2.go`):
    * winner='white' AND victory_status='mate' → game id.
    */
  def lichessSimple(lichess: DataFrame): DataFrame =
    lichess
      .filter(fld(6) === "white" && fld(5) === "mate")
      .select(fld(0).as("id"))

  /** L-complex (`misc/lichess_operator_1.go:38-45` + stateful count):
    * winner='white' AND turns>40 AND victory IN (mate,resign,outoftime) AND
    * opening IN (5 named) → count by condensed opening (first two words
    * joined by '_').
    */
  def lichessComplex(lichess: DataFrame): DataFrame = {
    val openings = Seq("Scandinavian Defense", "Sicilian Defense", "Indian Game",
      "Caro-Kann Defense", "Italian Game")
    lichess
      .filter(
        fld(6) === "white" &&
          fld(4).try_cast("double") > 40.0 &&
          fld(5).isin("mate", "resign", "outoftime") &&
          fld(14).isin(openings: _*)
      )
      .select(concat_ws("_", slice(split(fld(14), " "), 1, 2)).as("opening"))
      .groupBy(col("opening"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** P-simple (`misc/rate_filter_op_1.go` ∘ `rate_filter_op_2.go`):
    * Active='No' AND blockNumber='1000' → object id.
    */
  def parkingSimple(parking: DataFrame): DataFrame =
    parking
      .filter(fld(12) === "No" && fld(13) === "1000")
      .select(fld(2).as("objectid"))

  /** Load a quoted CSV positionally (no header), the way `operators/app1_2.go:
    * 24-27` parses Traffic Signs with encoding/csv + LazyQuotes: fields like
    * `16" X 42"` contain quotes and commas, so naive splitting is wrong here
    * and a real CSV reader is required.
    */
  def loadQuotedCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  private def c(i: Int): Column = col(s"_c$i") // positional, 0-based

  /** Demo app1_1 (`operators/app1_1.go:43-44`): FilteredTransform — category
    * contains param → project (objectid, sign name).
    */
  def trafficFilterContains(signs: DataFrame, param: String): DataFrame =
    signs.filter(c(8).contains(param)).select(c(2).as("objectid"), c(3).as("sign_name"))

  /** Demo app1_2 (`operators/app1_2.go:32`): Transform — project cols 2,3. */
  def trafficProject(signs: DataFrame): DataFrame =
    signs.select(c(2).as("objectid"), c(3).as("sign_name"))

  /** Demo app2_1 (`operators/app2_1.go:36-37`): equality on post type →
    * project category.
    */
  def trafficPostTypeCategory(signs: DataFrame, postType: String): DataFrame =
    signs.filter(c(6) === postType).select(c(8).as("category"))

  /** P-complex (`misc/rate_filter_operator.go:29-41` + count): meters with
    * rate <= 0.5 counted per zone. try_cast reproduces the reference's
    * skip-on-parse-error behavior (ANSI cast would throw on the header row).
    */
  def parkingComplex(parking: DataFrame): DataFrame =
    parking
      .filter(fld(5).try_cast("double") <= 0.5)
      .select(fld(8).as("zone"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("cnt"))
}
