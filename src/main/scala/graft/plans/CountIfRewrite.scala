package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom Catalyst optimizer rule (reference: presto-main/.../sql/
  * planner/iterative/rule/RewriteAggregationIfToFilter.java — SURVEY §4.1
  * flags this as the one reference rewrite Catalyst lacks):
  *
  *   count(CASE WHEN p THEN 1 END)  →  count(1) FILTER (WHERE p)
  *
  * The CASE form materializes a column the aggregate then null-filters;
  * the FILTER form short-circuits before accumulating. Exactly
  * equivalent for count (count skips NULLs, so the no-ELSE branch
  * contributes nothing). Registered through SparkSessionExtensions —
  * the engine's plug-in point for plan rewrites.
  */
object CountIfRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      agg.transformExpressions {
        case ae @ AggregateExpression(
            Count(Seq(CaseWhen(Seq((pred, Literal(v, _))), elseV))), _, false, None, _)
            if v != null && elseV.forall {
              case Literal(null, _) => true
              case _ => false
            } =>
          ae.copy(
            aggregateFunction = Count(Seq(Literal(1))),
            filter = Some(pred))
      }
  }
}

/** Session-extension installer: `Engine.session` wires this in. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CountIfRewrite)
    ext.injectOptimizerRule(_ => UnnestCodegenRewrite)
    PrestoFunctions.registerAll(ext)
  }
}
