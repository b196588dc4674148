package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for [[AsOfJoinPlan]] — the piece that keeps a custom
  * whole-operator node from becoming an optimization barrier.
  *
  * Catalyst's own PushDownPredicates/ColumnPruning only understand built-in
  * nodes; without this rule a `Filter` or `Project` above an as-of join
  * would stop at the node and the scans below it would read every row and
  * column. At 100 TB that is the difference between scanning a pruned
  * 2-column slice and the whole table. Two rewrites, both semantics-safe:
  *
  *  1. Filter pushdown: deterministic conjuncts referencing only LEFT
  *     columns move below the join. Safe because the join is per-left-row
  *     (left outer): dropping a left row before or after joining yields the
  *     same result. Right-side conjuncts stay put — the join null-extends
  *     unmatched left rows, so a right predicate above the join also acts on
  *     those nulls and cannot be evaluated against the raw right side.
  *  2. Column pruning: a `Project` above the join that ignores some child
  *     columns shrinks each side to (referenced ∪ key ∪ time) via an
  *     inserted Project, which Catalyst's ColumnPruning then chases down to
  *     the scan's ReadSchema.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`, so it
  * runs inside the operator-optimization fixed-point batch.
  */
object AsOfJoinRules extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case p @ Project(projList, j: AsOfJoinPlan) =>
      val referenced = AttributeSet(projList.flatMap(_.references))
      val neededL = referenced ++ AttributeSet(j.leftKeys :+ j.leftTime)
      val neededR = referenced ++ AttributeSet(j.rightKeys :+ j.rightTime)
      val keepL = j.left.output.filter(neededL.contains)
      val keepR = j.right.output.filter(neededR.contains)
      // Fire only on a strict shrink, or the fixed-point batch would loop.
      if (keepL.size == j.left.output.size && keepR.size == j.right.output.size) p
      else {
        def slim(child: LogicalPlan, keep: Seq[Expression]): LogicalPlan =
          if (keep.size == child.output.size) child
          else Project(keep.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]), child)
        p.copy(child = j.copy(left = slim(j.left, keepL), right = slim(j.right, keepR)))
      }
  }
}
