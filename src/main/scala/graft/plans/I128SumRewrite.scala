package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.I128DecimalSum
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite the "exact double sum via decimal
  * routing" idiom
  *
  * {{{ sum(CAST(x AS DECIMAL(p, 6)))   -- x double, p ≥ 28 }}}
  *
  * to the codegen'd two-long i128 aggregate
  * [[org.apache.spark.sql.graft.I128DecimalSum]] — same per-row
  * HALF_UP rounding, exact integer accumulation, ~2× cheaper than
  * decimal arithmetic on the aggregate hot path (the q1-shaped
  * pattern every order-independent-sum query uses).
  *
  * Schema-preserving by construction: the replacement's result type is
  * Sum's own decimal widening (min(38, p+10), 6) and the
  * AggregateExpression is `copy`d so its resultId — and therefore
  * every downstream attribute reference — survives.
  *
  * Scope guards (the rewrite must never change a result):
  *  - child is exactly a double-typed expression under a single cast;
  *  - scale 6 and p ≥ 28 (the engine's parity contract; below p=28
  *    the decimal route's narrow per-row domain is semantically
  *    load-bearing and is left alone);
  *  - no DISTINCT, no FILTER clause;
  *  - TRY cast excluded: try_cast requests null-on-overflow per row,
  *    while the i128 path sums |x| ≥ 1e(p-6) exactly.
  *
  * Documented divergence (strengthening only): for |x| ≥ 1e(p-6) the
  * decimal route null-skips (LEGACY) or errors (ANSI) the row; the
  * i128 path includes its exact value. Disable per-session with
  * `SET spark.graft.i128SumRewrite.enabled=false`.
  *
  * Injected via [[graft.GraftExtensions]] (conf
  * `spark.sql.extensions=graft.GraftExtensions`) or
  * `GraftExtensions.register(spark)` on a live session.
  */
object I128SumRewrite extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.i128SumRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
                Sum(Cast(c, dt: DecimalType, _, castMode), _),
                _, false, None, _)
              if c.dataType == DoubleType && dt.scale == 6 &&
                dt.precision >= 28 && castMode != EvalMode.TRY =>
            ae.copy(aggregateFunction =
              I128DecimalSum(c, math.min(38, dt.precision + 10)))
        }
    }
}
