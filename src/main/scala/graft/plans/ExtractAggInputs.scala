package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes non-trivial input expressions of object-typed (non-codegen)
  * aggregates into a Project beneath the Aggregate.
  *
  * `TypedImperativeAggregate.update` evaluates its child expression with the
  * INTERPRETED evaluator once per input row (ObjectHashAggregateExec cannot
  * codegen the update path). For `xor8_filter(bitfilters_duckdb_hash(...))`
  * over billions of rows that interpreted hash dominates build time
  * (measured 3-5x vs the hash core). After this rewrite the hash is computed
  * in the codegen'd Project feeding the aggregate, and `update` degrades to
  * a single BoundReference field read.
  *
  * Scope: only object-typed (TypedImperativeAggregate) functions — Spark
  * codegens declarative aggregate inputs already; rewriting those would just
  * widen rows. Attribute/Literal children are left alone (nothing to gain).
  */
object ExtractAggInputs extends Rule[LogicalPlan] {

  private def trivial(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => true
    case _ => e.foldable
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(_, _, child, _) if needsRewrite(agg) =>
      val extracted = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
      val newAggExprs = agg.aggregateExpressions.map { ne =>
        ne.transform {
          case ae: AggregateExpression if ae.aggregateFunction.isInstanceOf[TypedImperativeAggregate[_]] =>
            val fn = ae.aggregateFunction
            val newChildren = fn.children.map {
              case e if trivial(e) || !e.deterministic => e
              case e =>
                val alias = Alias(e, "_aggin")()
                extracted += alias
                alias.toAttribute
            }
            ae.copy(aggregateFunction =
              fn.withNewChildren(newChildren).asInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction])
        }.asInstanceOf[NamedExpression]
      }
      if (extracted.isEmpty) agg
      else agg.copy(
        aggregateExpressions = newAggExprs,
        child = Project(child.output ++ extracted, child))
  }

  private def needsRewrite(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(_.exists {
      case ae: AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[TypedImperativeAggregate[_]] &&
          ae.aggregateFunction.children.exists(e => !trivial(e) && e.deterministic)
      case _ => false
    })
}
