package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key (extension operator — absent
  * from the reference, SURVEY §2.5, and from OSS Spark's join strategies).
  *
  * A plain `p.ts >= i.start AND p.ts < i.end` join has no equi condition, so
  * Spark plans BroadcastNestedLoopJoin — fine while one side broadcasts,
  * quadratic disaster when both sides are big (the 100 TB case: events ×
  * campaign/incident/session windows). The standard fix Spark doesn't ship:
  * BUCKETIZE the time axis. Each point maps to one fixed-width bucket; each
  * interval explodes to the buckets it overlaps; the join becomes an
  * EQUI-join on bucket (hash-partitioned, AQE-skew-handled) plus a residual
  * range filter. Cost: |points| + Σ⌈len/width⌉ exploded interval rows through
  * one hash shuffle — linear, distributed, no driver involvement.
  *
  * Choose `bucketSeconds` ≈ the typical interval length: wider buckets mean
  * fewer exploded rows but more residual-filtered candidates; narrower the
  * reverse. A point-interval pair meets in exactly one bucket (the point's),
  * so no post-join dedup is needed.
  */
object IntervalJoin {

  /** Inner-join `points` to every interval containing them:
    * `pointTs ∈ [startCol, endCol)`. Returns the point columns plus the
    * interval columns. Timestamp columns throughout.
    */
  def pointInInterval(
      points: DataFrame,
      pointTs: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    val w = bucketSeconds * 1000000L // microseconds
    val p = points.withColumn("__b", expr(s"unix_micros($pointTs) div $w"))
    val i = intervals.withColumn(
      "__b",
      explode(sequence(
        expr(s"unix_micros($startCol) div $w"),
        expr(s"unix_micros($endCol) div $w"))))
    p.join(i, Seq("__b"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__b")
  }
}
