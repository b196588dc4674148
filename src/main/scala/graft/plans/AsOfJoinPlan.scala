package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for every left row, attach the latest right row with
  * the same (multi-column) key whose time is `<=` the left row's time
  * (inclusive lookback; left outer — unmatched left rows keep null right
  * columns; `toleranceMicros` optionally rejects matches older than
  * `leftTime - tolerance`).
  *
  * This is the whole-operator custom-plan path (SURVEY preference (c)): a
  * first-class [[LogicalPlan]] node planned by [[AsOfJoinStrategy]] into
  * [[AsOfJoinExec]], instead of composing built-ins (the union+window form in
  * [[graft.operators.AsOfJoin.lookback]] stays as the no-extension fallback).
  * The node is constructed already resolved — keys/times are [[Attribute]]s
  * picked from the children's analyzed outputs — so it passes through the
  * analyzer untouched; [[AsOfJoinRules]] keeps the optimizer's pushdown and
  * pruning flowing through it.
  *
  * Semantics mirror DuckDB's `ASOF LEFT JOIN` (the reference-era oracle for
  * h7): a left key with ANY null column never matches; right rows with null
  * key columns or null time are dropped; among right rows tied on
  * (key, time) one winner is kept (deterministic output only if the carried
  * right columns are functionally determined by (key, time), as in a
  * time-series "latest value" lookup).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    toleranceMicros: Option[Long] = None)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    s"asof needs matching key lists, got ${leftKeys.size} vs ${rightKeys.size}")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"asof key types differ at '${l.name}': ${l.dataType.simpleString} vs ${r.dataType.simpleString}")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"asof time types differ: ${leftTime.dataType.simpleString} vs ${rightTime.dataType.simpleString}")
  require(toleranceMicros.forall(_ >= 0), "asof tolerance must be non-negative")
  require(toleranceMicros.isEmpty || {
    import org.apache.spark.sql.types._
    Seq(TimestampType, TimestampNTZType, LongType, IntegerType).contains(leftTime.dataType)
  }, s"asof tolerance needs a long-backed time type, got ${leftTime.dataType.simpleString}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
