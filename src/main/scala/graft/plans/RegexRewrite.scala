package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite anchored, metacharacter-free `RLIKE`
  * patterns into plain string predicates —
  *
  *   - `x RLIKE '^lit$'` → `x = 'lit'`
  *   - `x RLIKE '^lit'`  → `startswith(x, 'lit')`
  *   - `x RLIKE 'lit$'`  → `endswith(x, 'lit')`
  *   - `x RLIKE 'lit'`   → `contains(x, 'lit')`
  *
  * Why it matters at scale: text-curation plans are full of prefix
  * probes written as regexes (`source RLIKE '^wiki'`, blocklists,
  * URL-scheme checks). A regex match walks the automaton per row
  * inside codegen; the string forms are single `UTF8String` memcmp
  * calls AND — unlike RLIKE — are eligible for parquet data-source
  * pushdown as `StringStartsWith`/`StringContains`, so the rewrite can
  * skip row groups entirely instead of merely matching faster.
  *
  * Scope is deliberately conservative: only patterns whose body
  * contains NO regex metacharacter rewrite (any of `\.[]{}()*+?^$|`
  * in the body disqualifies — no attempt to interpret escapes), so
  * the rewrite is exactly the identity on match semantics, including
  * NULL handling (both sides are null-intolerant binary string
  * predicates) and the empty pattern (`contains(x, '')` ≡ `x RLIKE ''`
  * — true for every non-null row).
  *
  * Registered with `SparkSessionExtensions.injectOptimizerRule` (the
  * config path) and `spark.experimental.extraOptimizations` (the
  * runtime path) by [[graft.GraftExtensions]].
  */
object RegexPrefixRewrite extends Rule[LogicalPlan] {

  private val meta = "\\.[]{}()*+?^$|".toSet

  private def literalOnly(s: String): Boolean = !s.exists(meta.contains)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case r @ RLike(left, Literal(p: UTF8String, StringType)) =>
        val s = p.toString
        val anchoredStart = s.startsWith("^")
        val anchoredEnd = s.endsWith("$")
        val body = s.stripPrefix("^").stripSuffix("$")
        if (!literalOnly(body)) r
        else (anchoredStart, anchoredEnd) match {
          case (true, true) => EqualTo(left, Literal(body))
          case (true, false) => StartsWith(left, Literal(body))
          case (false, true) => EndsWith(left, Literal(body))
          case (false, false) => Contains(left, Literal(body))
        }
    }
}
