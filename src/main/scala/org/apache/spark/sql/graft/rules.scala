package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BRound, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Collapses redundant nested roundings: rounding a value that is
  * already rounded to <= the same scale is a no-op, so
  * `bround(bround(e, 2), 4)` -> `bround(e, 2)` (same for `round`;
  * mixed modes are NOT collapsed — half-up of a half-even result can
  * differ). Layered meta pipelines produce these chains when one job's
  * rounded output feeds another's rounded ratio; each collapse removes a
  * BigDecimal round-trip per row from codegen.
  *
  * Injected via GraftExtensions (injectOptimizerRule) — the
  * session-extension path for optimizer customization without forking
  * Spark.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case BRound(inner @ BRound(_, Literal(s1: Int, IntegerType), _),
        Literal(s2: Int, IntegerType), _) if s2 >= s1 => inner
    case Round(inner @ Round(_, Literal(s1: Int, IntegerType), _),
        Literal(s2: Int, IntegerType), _) if s2 >= s1 => inner
  }
}
