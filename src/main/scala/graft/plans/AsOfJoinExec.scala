package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical as-of join: a single-pass sort-merge over key-co-partitioned,
  * (key..., time)-sorted children.
  *
  * Scale shape (the reason this beats every composed-builtin form at 100 TB):
  * `requiredChildDistribution` asks Catalyst for ONE hash exchange per side on
  * the join keys and `requiredChildOrdering` for a per-partition sort — then
  * the merge itself is O(|L| + |R|) streaming with O(1) state (the last
  * matching right row), no per-key buffering, no window carry column, no
  * union of mismatched schemas, no per-key cross product. EnsureRequirements
  * inserts the exchanges/sorts only when the children aren't already
  * partitioned/sorted usefully — so an upstream bucketed or pre-sorted source
  * makes the whole join exchange-free, which the union+window form
  * ([[graft.operators.AsOfJoin.lookback]]) can never express.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeOrd  = org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(leftTime.dataType)
    // Bind once on the driver; the bound trees are serialized into the task.
    val lKeys = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeys = rightKeys.map(BindReferences.bindReference(_, right.output))
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val outAttrs   = output
    // Nullability on the projection INPUT side must also be relaxed: the
    // right child declares non-null attrs, but unmatched left rows feed a
    // null row through them — a non-nullable BoundReference would skip the
    // null check and project garbage zeros.
    val inAttrs    = left.output ++ right.output.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project   = UnsafeProjection.create(outAttrs, inAttrs)
      val lKeyProj  = UnsafeProjection.create(lKeys)
      val rKeyProj  = UnsafeProjection.create(rKeys)
      // Compare the two single-purpose key rows with an interpreted natural
      // ascending ordering over the key schema.
      val keyOrd = RowOrdering.create(
        keyTypes.zipWithIndex.map { case (dt, i) =>
          SortOrder(BoundReference(i, dt, nullable = true), Ascending)
        }, Seq.empty[Attribute])
      val joined    = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf      = rIter.buffered

      // Streaming merge state: the latest right row seen for `matchKey`.
      // Rows coming out of SortExec (and the key projections) reuse buffers,
      // so saved state is copied; everything else is consumed strictly
      // forward.
      var matchKey: UnsafeRow   = null
      var matchRow: InternalRow = null
      var matchTime: Long       = Long.MinValue
      val tol = toleranceMicros.getOrElse(Long.MaxValue)
      def asLong(t: Any): Long = t match {
        case l: java.lang.Long => l
        case n: java.lang.Number => n.longValue()
      }

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = if (lk.anyNull) null else lTime.eval(lRow)
        if (lt == null) {
          // A null key column or null time never satisfies keys = keys AND
          // rt <= lt (SQL equi-join null semantics).
          joined(lRow, nullRight)
        } else {
          // Consume right rows up to and including (lk, lt); remember the
          // last one with key == lk. Ties on (key, time): last in sort order
          // wins (see AsOfJoinPlan scaladoc).
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
            if (cmp > 0) advance = false
            else {
              val rt = rTime.eval(rBuf.head)
              if (cmp == 0 && rt != null && timeOrd.compare(rt, lt) > 0) {
                advance = false // same key but in the future: stop, keep for later left rows
              } else {
                val r = rBuf.next()
                if (cmp == 0 && rt != null) {
                  matchKey = rk.copy(); matchRow = r.copy(); matchTime = asLong(rt)
                }
              }
            }
          }
          // The saved match is the LATEST right row with rt <= lt for this
          // key; if even it is older than the tolerance window, no valid
          // match exists for this left row (any other candidate is older).
          if (matchRow != null && matchKey != null && keyOrd.compare(matchKey, lk) == 0 &&
              (toleranceMicros.isEmpty || asLong(lt) - matchTime <= tol))
            joined(lRow, matchRow)
          else
            joined(lRow, nullRight)
        }
      }.map(project)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy turning [[AsOfJoinPlan]] into [[AsOfJoinExec]].
  * Registered via `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.GraftExtensions]]) and, belt-and-braces, appended to
  * `spark.experimental.extraStrategies` by [[graft.operators.AsOfJoin.native]]
  * so plain sessions (the driver's Verify/Bench mains) plan it too.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lks, rks, lt, rt, tol) =>
      AsOfJoinExec(lks, rks, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
