package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression, ScalarSubquery}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites `big JOIN single_row_subquery [ON cond]` into a scalar-subquery
  * form: each referenced column of the single-row side becomes a
  * `ScalarSubquery`, the join disappears, and the join condition (if any)
  * becomes a plain `Filter` over the big side.
  *
  * Why this matters at scale: the natural way to use a filter blob is
  *
  * {{{
  *   SELECT * FROM lineitem, (SELECT xor8_filter(h) AS f FROM dim) flt
  *   WHERE xor8_filter_contains(flt.f, bitfilters_duckdb_hash('v1.5.1', l_partkey))
  * }}}
  *
  * which Catalyst plans as a BroadcastNestedLoopJoin whose build row carries
  * the serialized filter (easily 100 KB - 10 MB). Every probe-side row is
  * then joined against the blob row, the blob column rides along in every
  * intermediate row, and the predicate cannot push into the scan. After this
  * rewrite the blob is evaluated ONCE (subquery), folded into the probe
  * expression as a literal inside whole-stage codegen, and the filter
  * predicate sits directly over the scan where Spark can push it down — at
  * 100 TB the difference is a dead plan versus a streaming scan.
  *
  * Safety: a global (no grouping keys) Aggregate always produces exactly one
  * row, so `big CROSS JOIN single` is row-for-row `big` and an inner join
  * condition is exactly a filter. Only deterministic, non-streaming plans
  * are rewritten. Each referenced column becomes its own scalar subquery, so
  * the rule fires only when at most [[MaxFoldedColumns]] columns of the
  * single-row side are used (each subquery re-executes the aggregate).
  */
object FoldSingleRowJoin extends Rule[LogicalPlan] {

  /** Fire only when the single-row side contributes at most this many
    * columns (each becomes a separately-executed scalar subquery).
    */
  val MaxFoldedColumns = 4

  /** Plans statically guaranteed to produce exactly one row. */
  private def isSingleRow(plan: LogicalPlan): Boolean = plan match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case p: Project => isSingleRow(p.child)
    case _: OneRowRelation => true
    case _ => false
  }

  private def foldable(side: LogicalPlan): Boolean =
    isSingleRow(side) && side.deterministic && !side.isStreaming

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner | Cross, condOpt, _)
        if !j.isStreaming && // scalar subqueries are illegal in streaming plans
          condOpt.forall(_.deterministic) &&
          (foldable(right) ^ foldable(left)) && // both-sides-single: leave to Spark
          (if (foldable(right)) right else left).output.size <= MaxFoldedColumns =>
      val (big, single) = if (foldable(right)) (left, right) else (right, left)
      rewrite(j, big, single, condOpt)
  }

  private def rewrite(j: Join, big: LogicalPlan, single: LogicalPlan,
      condOpt: Option[Expression]): LogicalPlan = {
    def sub(a: Attribute) = ScalarSubquery(Project(Seq(a), single))
    val singleAttrs = single.outputSet
    val filtered = condOpt match {
      case Some(cond) =>
        val cond2 = cond.transform { case a: Attribute if singleAttrs.contains(a) => sub(a) }
        Filter(cond2, big)
      case None => big
    }
    // preserve the join's output schema (same exprIds) so parents still bind
    val projected: Seq[NamedExpression] = j.output.map {
      case a if singleAttrs.contains(a) => Alias(sub(a), a.name)(exprId = a.exprId)
      case a => a
    }
    Project(projected, filtered)
  }
}
