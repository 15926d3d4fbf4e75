package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** [EXT] Optimizer rule: in front of every `levenshtein(a, b) <= k`
  * predicate, plant the classic length bound
  * `abs(length(a) - length(b)) <= k` — a NECESSARY condition for the
  * edit distance (each edit changes the length by at most 1), so the
  * rewrite is semantics-preserving. The bound is O(1) per row while
  * levenshtein is O(|a|·|b|); with short-circuit And evaluation inside
  * codegen, most candidate pairs of a fuzzy join die before the
  * quadratic comparison runs.
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions`
  * (injectOptimizerRule) or `GraftExtensions.register(spark)`
  * (`experimental.extraOptimizations`). Idempotent: conjuncts already
  * containing the bound are left untouched, so optimizer re-runs reach
  * a fixpoint.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  /** Only for deterministic arguments: the bound re-evaluates a and b,
    * and duplicating a nondeterministic expression (rand()-bearing)
    * changes semantics — Catalyst's own rewrites guard the same way.
    */
  private def boundFor(cmp: Expression): Option[Expression] = cmp match {
    case LessThanOrEqual(Levenshtein(a, b, _), k @ Literal(_, IntegerType))
        if a.deterministic && b.deterministic =>
      Some(LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k))
    case LessThan(Levenshtein(a, b, _), k @ Literal(_, IntegerType))
        if a.deterministic && b.deterministic =>
      Some(LessThan(Abs(Subtract(Length(a), Length(b))), k))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, _))
        if a.deterministic && b.deterministic =>
      Some(GreaterThanOrEqual(k, Abs(Subtract(Length(a), Length(b)))))
    case _ => None
  }

  /** cheap bounds FIRST so And short-circuits before levenshtein */
  private def withBounds(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val additions = conjuncts.flatMap(boundFor)
      .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
    if (additions.isEmpty) None
    else Some((additions ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // predicate pushdown may have folded the filter into the join
    // condition already — handle both shapes
    case f @ Filter(cond, child) =>
      withBounds(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      withBounds(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }
}
