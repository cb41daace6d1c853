package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window-rank-filter idiom
  *
  * {{{ Project(cols w/o rank, Filter(rank <= k, Window(row_number() as rank, part, order))) }}}
  *
  * into the custom [[TopKPerKey]] operator whenever the rank column itself
  * is dropped — i.e. the query only uses the window to KEEP the top-k rows
  * per key, which is `bestRowPerKey`-style dedup and every "first k per
  * key" filter in the library. The window spelling shuffles all rows and
  * sorts every reducer partition; the rewrite turns the same query into
  * bounded heaps + a survivors-only shuffle with zero user-code changes.
  *
  * Deliberately narrow preconditions (semantics-preserving by
  * construction):
  *  - the Window computes exactly ONE expression, a plain `row_number()`;
  *  - the Filter is a pure rank bound: `rank <= k`, `rank < k`, `rank = 1`
  *    (no other conjuncts);
  *  - the Project references the rank attribute nowhere (so output schema
  *    and rows are identical — per-key row SETS are what row_number keeps).
  * Ties beyond the sort order resolve arbitrarily in BOTH spellings; as
  * with `row_number`, a total order makes either deterministic.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rank: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rank => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rank => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rank => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rank => Some(k)
    case _ => None
  }

  /** The standard optimizer may already have slid a `WindowGroupLimit`
    * under the Window (InferWindowGroupLimit); TopKPerKey subsumes it, so
    * unwrap — leaving it would re-introduce a per-partition partial sort. */
  private def unwrapGroupLimit(child: LogicalPlan): LogicalPlan = child match {
    case WindowGroupLimit(_, _, _: RowNumber, _, inner) => inner
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(we: WindowExpression, _)), part, order, child, _)))
      if we.windowFunction.isInstanceOf[RowNumber] &&
        order.nonEmpty &&
        rankBound(cond, alias.exprId).exists(_ > 0) &&
        !projectList.exists(_.references.exists(_.exprId == alias.exprId)) &&
        projectList.forall(_.references.subsetOf(unwrapGroupLimit(child).outputSet)) =>
      val k = rankBound(cond, alias.exprId).get
      Project(projectList, TopKPerKey(part, order, k, unwrapGroupLimit(child)))
    case other => other
  }
}
