package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `row_number().over(partitionBy(g).orderBy(o))`
  * followed by `filter(rank <= k)` IS top-k-per-group — rewrite the
  * Filter+Window pair into [[TopKPerGroupNode]] so the sort-the-world
  * window plan becomes bounded heaps with a pre-shuffle partial.
  *
  * Opt-in (`spark.graft.topk.rewrite=true`): the rewrite changes the
  * physical strategy, not the result, but an engine should let users
  * see the plans they wrote unless they ask for the substitution. */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val confKey = "spark.graft.topk.rewrite"

  private def extractK(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    plan.transform {
      case f @ Filter(cond, w: Window)
          if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty =>
        w.windowExpressions.head match {
          case al @ Alias(WindowExpression(_: RowNumber, _), _) =>
            extractK(cond, al.toAttribute) match {
              case Some(k) if k > 0 =>
                TopKPerGroupNode(w.partitionSpec, w.orderSpec, k, al.toAttribute, w.child)
              case _ => f
            }
          case _ => f
        }
    }
  }
}
