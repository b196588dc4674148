package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation projections: PII redaction and deterministic weighted
  * mixture sampling. Both are pure map-side column transforms — no shuffle,
  * no state, codegen'd end to end — so they run at corpus scale at scan
  * throughput and compose with any pipeline stage (batch or streaming).
  */
object Curation {

  /** PII patterns, deliberately RE2-compatible (no lookaround, no backrefs)
    * so the same strings run under Java regex (Spark) and RE2 (DuckDB, and
    * the common at-scale regex engines). Redaction order matters: SSN-like
    * ids and emails/IPs are replaced before phones so their digits can't be
    * re-matched by the phone shapes.
    *
    * The phone pattern is a SHAPE alternation, every branch carrying ≥7
    * digits — international `+CC …` (≥7), parenthesized-area
    * `(NNN) NNN NNNN` (10), and separated `NNN-NNN-NNNN` (10, separators
    * space/dot/dash). A generic loose digit-run class here redacted prices,
    * number columns ("100 200 300") and ISO dates; the shapes leave those
    * untouched (dates are 4-2-2 / 2-2-4, never 3-3-4, and slash separators
    * are excluded entirely).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe   = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val ipRe    = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe =
    "\\+[0-9]{1,3}[ .-]?\\(?[0-9]{2,4}\\)?(?:[ .-]?[0-9]{2,4}){2,3}" +
    "|\\([0-9]{3}\\)[ .-]?[0-9]{3}[ .-]?[0-9]{4}" +
    "|[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}"

  /** Per-category match counts on the RAW text (before redaction). */
  def piiCounts(text: Column): (Column, Column, Column, Column) = (
    regexp_count(text, lit(emailRe)),
    regexp_count(text, lit(ssnRe)),
    regexp_count(text, lit(ipRe)),
    regexp_count(text, lit(phoneRe))
  )

  /** Replace every PII match with a typed placeholder token. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val s = regexp_replace(e, ssnRe, "<ID>")
    val i = regexp_replace(s, ipRe, "<IP>")
    regexp_replace(i, phoneRe, "<PHONE>")
  }

  /** Deterministic weighted mixture sampling: keep each row with probability
    * `rate` (a per-row Column, typically a function of the row's
    * source/domain), decided by a salted md5 of the row id — reproducible
    * across runs, engines, and partitionings (no RNG, no sort-order
    * dependence), which is what makes a training-data mix auditable. The
    * test is a pure projection + filter: at 100 TB it runs map-side at scan
    * speed and the realized per-domain rates concentrate tightly around the
    * targets (binomial over millions of docs).
    *
    * Uniformity: the first 4 md5 hex chars are compared against
    * printf("%04x", rate·65536) — md5 is uniform per nibble and lowercase
    * hex on every engine, so string order = numeric order.
    */
  def sampleMixture(df: DataFrame, idCol: String, rate: Column, salt: String): DataFrame = {
    val u   = substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 4)
    val thr = format_string("%04x", (least(greatest(rate, lit(0.0)), lit(1.0)) * 65536).cast("int"))
    df.filter(rate >= 1.0 || u < thr)
  }
}
