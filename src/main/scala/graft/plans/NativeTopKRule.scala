package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{RowNumber, SpecifiedWindowFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.plans.TopKPerKey.TopKPerKeyNode

/** Injected optimizer rule (GraftExtensions): rewrite the engine's
  * hottest pattern
  *
  *   Project(cols without rn)
  *     Filter(rn <= k | rn = 1 | rn < k)
  *       Window(rn := row_number() over (partition p order o))
  *
  * into `Project(cols, TopKPerKeyNode(p, o, k, child))` — the native
  * bounded-heap operator — WHEN the rank column is provably unused
  * above the filter. Every `LatestPerKey`/staging-view/report dedup in
  * the engine then takes the sort-free native path with no call-site
  * changes: "declare the logical plan, let the optimizer pick the
  * physical strategy" applied to our own operator.
  *
  * Scope guards (anything else keeps the stock window plan):
  *  - single window expression, exactly `row_number()` (rank/dense_rank
  *    keep ties — different row multiplicity; they stay on Spark's
  *    WindowGroupLimit path);
  *  - the filter condition is ONLY the rank comparison (conjunctions
  *    keep their usual FilterExec placement);
  *  - the Project references the rank attribute nowhere (`topKRanked`
  *    keeps its Window);
  *  - non-empty orderSpec (the LatestPerKey determinism contract).
  *
  * Runs in the user-rule batch, i.e. after Spark's own
  * InferWindowGroupLimit may have inserted a WindowGroupLimit below the
  * Window — that node is part of the matched pattern and is removed
  * with it. Kill switch: `spark.graft.nativeTopK.enabled=false`.
  */
class NativeTopKRule extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case _ => None
  }

  private def isRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(), spec), _) =>
      spec.frameSpecification match {
        case _: SpecifiedWindowFrame => true
        case _ => true
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.nativeTopK.enabled", "true").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projectList,
          Filter(cond, w @ Window(Seq(rnExpr), partSpec, orderSpec, wChild, _)))
          if isRowNumber(rnExpr) && orderSpec.nonEmpty =>
        val rnAttr = rnExpr.toAttribute
        limitOf(cond, rnAttr) match {
          case Some(k)
              if projectList.forall(e => !e.references.contains(rnAttr)) &&
                partSpec.forall(_.deterministic) =>
            // strip an InferWindowGroupLimit insertion if present — the
            // native operator subsumes it
            val source = wChild match {
              case WindowGroupLimit(ps, os, _, _, gc)
                  if ps == partSpec && os == orderSpec => gc
              case other => other
            }
            Project(projectList, TopKPerKeyNode(partSpec, orderSpec, k, source))
          case _ => p
        }
    }
  }
}
