package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers callable from generated Java code (top-level object methods
  * get static forwarders).
  */
object TextHash {
  /** Polynomial rolling hash over UTF-8 bytes (base 1000003, natural 2^64
    * wraparound) — a deterministic document fingerprint. Prefix-composable:
    * hash(a ++ b) = hash(b bytes) folded onto hash(a), which is what makes it
    * a *rolling* hash usable for chunk-level fingerprinting.
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h     = 0L
    var i     = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }
}

/** Custom Catalyst expression for the rolling-hash fingerprint: native
  * `doGenCode` so it fuses into whole-stage codegen (no UDF serialization,
  * no row-at-a-time boxing in the hot path).
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column API for the fingerprint expression. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))
}
