package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert d-index of two long cell coordinates on a 2^order grid
  * ([[graft.operators.Layout.hilbertXY2D]]). A native expression
  * because the iterative rotate-and-reflect recurrence rebinds (x, y)
  * each round — folded into Column `when`-trees the expression graph
  * grows exponentially with the order, while here it is one tight
  * codegen'd Java loop.
  */
case class HilbertIndex(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be 1..31, got $order")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires (bigint, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.operators.Layout.hilbertXY2D(
      x.asInstanceOf[Long], y.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.operators.Layout.hilbertXY2D($x, $y, $order);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}
