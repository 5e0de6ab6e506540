package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, DenseRank, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Rank, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: `row_number()/rank()/dense_rank().over(partitionBy(g)
  * .orderBy(o))` followed by `filter(rank <= k)` IS top-k-per-group —
  * rewrite the Filter+Window pair into [[TopKPerGroupNode]] so the
  * sort-the-world window plan becomes bounded heaps with a pre-shuffle
  * partial. rank/dense_rank keep their tie semantics through
  * [[RankMode]]. A windowless global top-k (empty partitionBy) is NOT
  * rewritten — ClusteredDistribution(Nil) is unplannable, and Spark's
  * own TakeOrderedAndProject owns that shape.
  *
  * Opt-in (`spark.graft.topk.rewrite=true`): the rewrite changes the
  * physical strategy, not the result, but an engine should let users
  * see the plans they wrote unless they ask for the substitution. */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val confKey = "spark.graft.topk.rewrite"

  /** The rank-comparison attribute, looking through the cast that
    * integer-type promotion inserts when k is a Long literal. */
  private def attrOf(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case c: Cast => attrOf(c.child)
    case _ => None
  }

  private def litK(e: Expression): Option[Int] = e match {
    case Literal(k: Int, IntegerType) => Some(k)
    case Literal(k: Long, LongType) if k >= Int.MinValue && k <= Int.MaxValue => Some(k.toInt)
    case _ => None
  }

  private def extractK(cond: Expression, rank: Attribute): Option[Int] = {
    def matches(e: Expression) = attrOf(e).exists(_.semanticEquals(rank))
    cond match {
      case LessThanOrEqual(e, l) if matches(e) => litK(l)
      case LessThan(e, l) if matches(e) => litK(l).map(_ - 1)
      case GreaterThanOrEqual(l, e) if matches(e) => litK(l)
      case GreaterThan(l, e) if matches(e) => litK(l).map(_ - 1)
      case _ => None
    }
  }

  private def rankMode(e: Expression): Option[RankMode] = e match {
    case _: RowNumber => Some(RankMode.RowNumber)
    case _: Rank => Some(RankMode.Rank)
    case _: DenseRank => Some(RankMode.DenseRank)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    plan.transform {
      case f @ Filter(cond, w: Window)
          if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty &&
            w.partitionSpec.nonEmpty =>
        w.windowExpressions.head match {
          case al @ Alias(WindowExpression(fn, _), _) =>
            (rankMode(fn), extractK(cond, al.toAttribute)) match {
              case (Some(mode), Some(k)) if k > 0 =>
                TopKPerGroupNode(w.partitionSpec, w.orderSpec, k, al.toAttribute, mode, w.child)
              case _ => f
            }
          case _ => f
        }
    }
  }
}
