package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, Count}
import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `size(collect_list(x))` ⇒ `count(x)` inside an
  * aggregate.
  *
  * Sound because collect_list drops nulls and count(x) counts exactly
  * the non-null x — same value, but the rewrite never materializes the
  * array: collect_list is an object-hash aggregate whose buffer grows
  * with group size (the reference's travel_array pattern makes this a
  * real cost, SURVEY A1/A2), while count is a codegen'd 8-byte
  * accumulator with map-side partial aggregation.
  *
  * Restricted to non-distinct, unfiltered aggregate calls directly
  * under Size within an Aggregate node. Output type is preserved via a
  * cast back to Size's IntegerType.
  */
object CollectSizeToCount extends Rule[LogicalPlan] {

  private def rewrite(e: Expression): Expression = e.transform {
    case Size(ae @ AggregateExpression(cl: CollectList, _, false, None, _), _) =>
      Cast(ae.copy(aggregateFunction = Count(Seq(cl.child))), IntegerType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.copy(aggregateExpressions =
        agg.aggregateExpressions.map(ne =>
          rewrite(ne).asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
  }
}
