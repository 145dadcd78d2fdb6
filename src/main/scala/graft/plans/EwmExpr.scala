package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exponentially weighted mean as a native Catalyst window function.
  *
  * Semantics match the reference's EWM recursion
  * (/root/reference/mlforecast/lag_transforms.py:1502-1527 `_ewm_from_agg`):
  * state starts at the first non-missing value, then
  * `ewm = alpha * x + (1 - alpha) * ewm` for every subsequent non-missing
  * value; missing (null/NaN) inputs leave the state untouched and emit the
  * current state.
  *
  * `zeroInit` starts the state at 0.0 (seen) instead of the first value:
  * the recursion becomes the pure affine "B" term of the EWM viewed as a
  * composition of affine maps y -> (1-alpha)*y + alpha*x, which is what
  * [[graft.functions.GlobalScan.blockedEwm]]'s distributed block combine
  * needs (y_block_end = (1-alpha)^n * y_carry + B).
  *
  * Implemented as a `DeclarativeAggregate` window function (same machinery as
  * `rank`), so it runs inside `WindowExec` with a running-frame — O(n) per
  * partition, no frame buffering, and the update expressions participate in
  * codegen. This is the scale path the reference needs a C++ kernel for.
  */
case class EwmUpdate(child: Expression, alpha: Double,
                     zeroInit: Boolean = false)
    extends AggregateWindowFunction {
  // enforced HERE so the Column API agrees with the SQL surface: outside
  // (0, 1] the recursion alpha*x + (1-alpha)*ewm oscillates or diverges
  // and would feed model features silently
  require(alpha > 0.0 && alpha <= 1.0,
    s"ewm alpha must be in (0, 1], got $alpha")

  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm"

  private lazy val ewm = AttributeReference("ewm", DoubleType, nullable = true)()
  override def aggBufferAttributes: Seq[AttributeReference] = ewm :: Nil

  override lazy val initialValues: Seq[Expression] =
    if (zeroInit) Seq(Literal(0.0))
    else Seq(Literal.create(null, DoubleType))

  private def missing(e: Expression): Expression =
    Or(IsNull(e), IsNaN(e))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(
      If(missing(x), ewm,
        If(IsNull(ewm), x,
          Add(Multiply(Literal(alpha), x), Multiply(Literal(1.0 - alpha), ewm)))))
  }

  override lazy val evaluateExpression: Expression = ewm

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmUpdate =
    copy(child = newChildren.head)
}

object EwmExpr {
  /** Running EWM of `x` over (partition, order ascending). The full
    * WindowExpression is built directly in Catalyst with the function's own
    * running RowFrame — bypassing `.over()`, whose frame-resolution rules
    * don't know about external window functions.
    */
  def ewm(x: Column, alpha: Double, partition: Seq[Column], order: Column,
          zeroInit: Boolean = false): Column = {
    val f = EwmUpdate(bridge.columnExpr(x), alpha, zeroInit)
    val spec = WindowSpecDefinition(
      partition.map(bridge.columnExpr),
      Seq(SortOrder(bridge.columnExpr(order), Ascending)),
      f.frame)
    bridge.exprColumn(WindowExpression(f, spec))
  }
}
