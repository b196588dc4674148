package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DedupOps

/** The FastSS fuzzy join's degenerate-key-space guard: a planted hot
  * deletion-neighborhood (mass-duplicate strings) must stay bounded by the
  * per-variant cap AND report the truncation in-row — loud degradation, not
  * silent quadratic blowup or silent recall loss.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], cap: Int): Row =
    DedupOps.fuzzyEditJoinStats(rows.toDF("id", "name"), "id", "name", cap).collect()(0)

  test("benign key space: all true pairs found, zero capped variants") {
    val rows = Seq[(Long, String)](
      (1L, "spark"), (2L, "sparks"), (3L, "spork"), (4L, "zeppelin"))
    val r = stats(rows, cap = 50)
    // (1,2) insertion, (1,3) substitution — (2,3) is distance 2, zeppelin alone.
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("n_capped_variants") === 0L)
  }

  test("planted hot neighborhood: candidate volume bounded by the cap, truncation reported in-row") {
    val cap = 10
    // 200 identical strings: every variant bucket holds all 200 ids — the
    // adversarial mass-duplicate shape. Uncapped this is 200*199/2 = 19900
    // candidate pairs; the cap bounds it at cap*(cap-1)/2.
    val hot = (1L to 200L).map(i => (i, "aaaaaa"))
    val r = stats(hot, cap)
    val maxPairs = cap.toLong * (cap - 1) / 2
    assert(r.getAs[Long]("n_candidates") === maxPairs,
      s"candidates must collapse to the capped bucket's pairs, got $r")
    assert(r.getAs[Long]("n_pairs") === maxPairs) // identical strings: distance 0
    // Two DISTINCT variant strings exist ("aaaaaa" and "aaaaa" — all six
    // deletions collapse to the same string) and both buckets overflowed:
    // both must show up in the in-row report.
    assert(r.getAs[Long]("n_capped_variants") === 2L,
      s"overflowing variant buckets must be reported in-row, got $r")
  }

  test("hot neighborhood beside a benign one: benign pairs survive, only hot buckets report") {
    val cap = 10
    val rows = (1L to 100L).map(i => (i, "bbbb")) ++
      Seq((101L, "graft"), (102L, "grafts"))
    val r = stats(rows, cap)
    // The benign pair (101, 102) must be found despite the hot mass.
    assert(r.getAs[Long]("n_pairs") === cap.toLong * (cap - 1) / 2 + 1)
    // "bbbb" and "bbb" (the collapsed deletions) overflow; graft's don't.
    assert(r.getAs[Long]("n_capped_variants") === 2L)
  }
}
