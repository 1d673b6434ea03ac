package graft.functions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: `dot_product(x, x)` → `norm2sq(x)`.
  *
  * The self-dot shape appears wherever L2 distance is decomposed as
  * v·v − 2·v·q + q·q (the exact re-rank stage of every ANN path here —
  * [[graft.ops.PqOps.exactRerank]]); the fused kernel does one array
  * traversal and one element load per term instead of two. Accumulation
  * order is identical, so the rewrite is bit-exact — the full DuckDB
  * oracle sweep runs WITH the rule active and still hash-matches.
  *
  * This is the `Rule[LogicalPlan]` tier of the extension story (the
  * native expressions are the Expression tier): users get it at builder
  * time via `GraftExtensions` (`spark.sql.extensions=graft.functions
  * .GraftExtensions`) or on a live session via
  * `spark.experimental.extraOptimizations ++= Seq(SelfDotRewrite)`.
  * Guarded on determinism: a nondeterministic child must keep its two
  * (independently sampled) evaluations.
  */
object SelfDotRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotExpr(a, b) if a.deterministic && a.semanticEquals(b) => Norm2Expr(a)
    }
}
