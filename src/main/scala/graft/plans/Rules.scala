package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Cast, Expression, GreaterThan, If, LambdaFunction, LessThan, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, IntegerType, LongType}

/** Optimizer rule: `size(array_intersect(x, y))` →
  * `cast(sorted_intersect_count(x, y) as int)` when BOTH inputs are
  * provably sorted distinct long arrays (a literal
  * `array_sort(array_distinct(_))` / `sort_array(array_distinct(_))`
  * tree with the default ascending comparator and non-null elements).
  *
  * Why: the built-in pair builds a hash set AND materializes a throwaway
  * intersection array per row (and ArraySort itself is CodegenFallback),
  * while the rewrite is a zero-allocation codegen'd merge loop — the d5
  * candidate-verify hot path, ~3× on a 450k-pair stage at sf0.1. The
  * guard is deliberately narrow: the pattern must prove sortedness,
  * distinctness and null-freedom SYNTACTICALLY; attribute references
  * whose producing plan sorted them upstream are not matched (lineage
  * proof would need a full column-provenance analysis).
  *
  * Registered via GraftExtensions (injectOptimizerRule) at session build,
  * or `spark.experimental.extraOptimizations :+= IntersectCountRewrite`
  * on a live session. Semantics preserved exactly: `size(_, false)`
  * (non-legacy) returns null on null input, as does the cast form;
  * intersection of distinct arrays has the same cardinality under both
  * implementations.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  /** The BOUND form of ArraySort.defaultComparator:
    * (l, r) -> if (l < r) -1 else if (l > r) 1 else 0. Matched
    * structurally — the plan's lambda variables carry exprIds, so
    * semanticEquals against the unbound default never holds. */
  private def isDefaultComparator(f: Expression): Boolean = f match {
    case LambdaFunction(
        If(LessThan(a, b), Literal(-1, _),
          If(GreaterThan(c, d), Literal(1, _), Literal(0, _))),
        Seq(x, y), _) =>
      a.semanticEquals(x) && b.semanticEquals(y) &&
        c.semanticEquals(x) && d.semanticEquals(y)
    case _ => false
  }

  private def sortedDistinct(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(_), f, _) => isDefaultComparator(f)
    case SortArray(ArrayDistinct(_), Literal(true, BooleanType)) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
        if nonNullLongArray(a) && nonNullLongArray(b) &&
          sortedDistinct(a) && sortedDistinct(b) =>
        Cast(SortedIntersectCount(a, b), IntegerType)
    }
}
