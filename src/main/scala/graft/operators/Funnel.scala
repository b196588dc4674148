package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel analysis over an event log: first-completion times for an ordered
  * step list with strict event-time ordering between steps (step k counts
  * only strictly after the user's step-k-1 completion), plus incremental
  * maintenance of that state.
  *
  * Plan shape (the h22_funnel scale argument): [[stepTimes]] chains one
  * whole-partition window min per step — step k's expression references
  * step k-1's column, so Catalyst stacks k WindowExecs and the per-user
  * collapse on ONE hash exchange over the user column. Shuffle volume is
  * the event log once, regardless of funnel depth.
  *
  * Incremental maintenance ([[stateToEvents]]): the per-user state is
  * itself a valid event log — replaying each recorded completion time as a
  * pseudo-event of its step type and re-running [[stepTimes]] over
  * (state-events ∪ delta) reproduces the full-history result EXACTLY,
  * provided delta events are not earlier than the state's horizon (the
  * standard append-only ingestion contract: if a delta view could undercut
  * the recorded t0, base clicks between the two t0 candidates — dropped
  * from the compact state — could be lost). Cost is O(|state| + |delta|):
  * the 100 TB history is never rescanned.
  */
object Funnel {

  /** Per-user first-completion times: one row per user, columns t0..t(k-1)
    * (null = step not reached). `ev` needs (userCol, typeCol, tmCol) with
    * tmCol an integral event time (micros).
    */
  def stepTimes(
      ev: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tmCol: String = "tm"
  ): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    stepTimesWhere(ev, steps.map(st => st -> (col(typeCol) === st)), userCol, tmCol)
  }

  /** [[stepTimes]] with a conversion window: steps past the first count
    * only within `withinUs` micros of the user's first-step time.
    */
  def stepTimesWithin(
      ev: DataFrame,
      steps: Seq[String],
      withinUs: Long,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tmCol: String = "tm"
  ): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    stepTimesWhere(ev, steps.map(st => st -> (col(typeCol) === st)), userCol, tmCol,
      Some(withinUs))
  }

  /** General form: each step is (label, predicate Column) — a step can be
    * any row condition, not just an event-type match (e.g. a purchase above
    * a value floor, a click on a given surface). Same plan shape.
    */
  def stepTimesWhere(
      ev: DataFrame,
      steps: Seq[(String, org.apache.spark.sql.Column)],
      userCol: String = "user_id",
      tmCol: String = "tm",
      withinUs: Option[Long] = None
  ): DataFrame = stepTimesKeyed(ev, steps, Seq(userCol), tmCol, withinUs)

  /** Composite-key form: the funnel entity is (userCol, sessionCol, …) —
    * e.g. per-session funnels — WITHOUT concatenating a string key (a 10 M-
    * row string group key costs several× the long columns it encodes).
    * Same chained-window plan, partitioned/grouped on the key columns.
    */
  def stepTimesKeyed(
      ev: DataFrame,
      steps: Seq[(String, org.apache.spark.sql.Column)],
      keyCols: Seq[String],
      tmCol: String = "tm",
      withinUs: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one step")
    require(keyCols.nonEmpty, "need at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val withT = steps.zipWithIndex.foldLeft(ev) { case (df, ((_, pred), i)) =>
      // Conversion window: steps past the first count only within
      // `withinUs` of the user's t0 — the product-analytics "converted
      // within N days" semantics. Same chained-window plan: the bound is
      // one more predicate on the already-present t0 column, so depth-k
      // windowed funnels still shuffle the log exactly once.
      val inWindow = withinUs
        .map(us => col(tmCol) <= col("t0") + lit(us))
        .getOrElse(lit(true))
      val hit =
        if (i == 0) pred else pred && col(tmCol) > col(s"t${i - 1}") && inWindow
      df.withColumn(s"t$i", min(when(hit, col(tmCol))).over(w))
    }
    withT
      .groupBy(keyCols.map(col): _*)
      .agg(
        min(col("t0")).as("t0"),
        steps.indices.drop(1).map(i => min(col(s"t$i")).as(s"t$i")): _*)
  }

  /** Collapse [[stepTimes]] output to the funnel report: one row per step
    * with the users-reached count and the exact integer micros sum of
    * (t_k − t_0) over users who reached step k.
    */
  def summary(perUser: DataFrame, steps: Seq[String]): DataFrame = {
    val aggs = steps.indices.map(i => count(col(s"t$i")).as(s"n$i")) ++
      steps.indices.drop(1).map(i =>
        coalesce(sum(when(col(s"t$i").isNotNull, col(s"t$i") - col("t0"))), lit(0L)).as(s"c$i"))
    val stackArgs = steps.indices.map { i =>
      val label = steps.take(i + 1).mkString(">")
      s"'$label', n$i, " + (if (i == 0) "CAST(0 AS BIGINT)" else s"c$i")
    }.mkString(", ")
    perUser
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${steps.size}, $stackArgs) AS (step, n_users, conv_us_total)")
      .orderBy("step")
  }

  /** Replay a [[stepTimes]] state table as pseudo-events — one (user, step
    * type, time) row per recorded completion, in a single pass (posexplode
    * + null filter, no per-step scan of the state).
    */
  def stateToEvents(
      state: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tmCol: String = "tm"
  ): DataFrame =
    state
      .select(
        col(userCol),
        posexplode(array(steps.indices.map(i => col(s"t$i")): _*)).as(Seq("__pos", tmCol)))
      .filter(col(tmCol).isNotNull)
      .select(
        col(userCol),
        element_at(array(steps.map(lit): _*), col("__pos") + 1).as(typeCol),
        col(tmCol))
}
