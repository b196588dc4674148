package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Governance

/** Governance family: k-anonymity math on a planted fixture, EWMA recurrence
  * against a hand-rolled fold, schema-evolution null-fill semantics, and the
  * unpivot reshape's row-local expansion.
  */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("k-anonymity flags small equivalence classes and low diversity") {
    val out = Governance.kAnonymity.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val nb = r.getAs[Long]("n_buckets")
      assert(nb <= n, "distinct buckets cannot exceed class size")
      assert((r.getAs[Long]("is_k_anon") == 1L) == (n >= 5))
      assert((r.getAs[Long]("is_l_diverse") == 1L) == (nb >= 3))
    }
  }

  test("EWMA recurrence matches a driver-side fold of the same series") {
    val out = Governance.ewmaAnomaly.run(spark, sf)
      .filter(col("priority") === "1-URGENT")
      .orderBy("day").collect()
    assert(out.length > 10)
    var e = 0L
    out.zipWithIndex.foreach { case (r, i) =>
      val n = r.getAs[Long]("n")
      val expectAnom =
        if (i == 0) 0L else if (1000 * n > 2 * e || 2000 * n < e) 1L else 0L
      e = if (i == 0) 1000 * n else (4 * e + 1000 * n) / 5
      assert(r.getAs[Long]("ewma_milli") == e, s"ewma at row $i")
      assert(r.getAs[Long]("is_anomaly") == expectAnom, s"anomaly flag at row $i")
    }
  }

  test("EWMA smooths: running value stays within the series' min/max envelope") {
    val rows = Governance.ewmaAnomaly.run(spark, sf).collect()
    val byKey = rows.groupBy(_.getAs[String]("priority"))
    byKey.foreach { case (_, rs) =>
      val ns = rs.map(_.getAs[Long]("n") * 1000)
      val lo = ns.min; val hi = ns.max
      rs.foreach(r => assert(r.getAs[Long]("ewma_milli") >= lo - 5 &&
        r.getAs[Long]("ewma_milli") <= hi))
    }
  }

  test("schema evolution null-fills the missing column for legacy files only") {
    val out = Governance.schemaEvolution.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_v2") < r.getAs[Long]("n"),
        "v1 rows must contribute null discounts (n_v2 strictly below n)")
      assert(r.getAs[Long]("n_v2") > 0, "v2 rows must carry the new column")
    }
  }

  test("unpivot emits exactly one row per (entity, metric) with matched values") {
    val wide = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty_cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val long = Governance.unpivotMetrics.run(spark, sf).collect()
    assert(long.length == wide.size * 3)
    long.filter(_.getAs[String]("metric") == "qty_cents").foreach { r =>
      assert(r.getAs[Long]("value_cents") == wide(r.getAs[String]("l_returnflag")))
    }
  }
}
