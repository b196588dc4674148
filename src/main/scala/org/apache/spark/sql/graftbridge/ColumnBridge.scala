package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversions so graft's custom
  * Catalyst expressions can be exposed as `Column`s (Spark 4 removed the
  * public `new Column(expr)` constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unwrap a sort Column (`asc(c)`/`desc(c)`/plain) into (child column,
    * ascending?, nullsFirst?). The `internal.SortOrder` ColumnNode is
    * `private[sql]`, hence this bridge. A plain column means Spark's
    * defaults: ascending, nulls first.
    */
  def unwrapSort(c: Column): (Column, Boolean, Boolean) = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder}
    c.node match {
      case so: NodeSortOrder =>
        (new Column(so.child),
          so.sortDirection == NodeSortOrder.Ascending,
          so.nullOrdering == NodeSortOrder.NullsFirst)
      case _ => (c, true, true)
    }
  }

  import org.apache.spark.sql.{DataFrame, Row, SparkSession}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.classic

  /** Wrap a (resolved) logical plan as a DataFrame — the `Dataset.ofRows`
    * entry point custom-LogicalPlan operators need went `private[sql]` in
    * Spark 4.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
