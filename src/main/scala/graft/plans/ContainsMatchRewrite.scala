package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Peephole optimizer rule: a BOOLEAN "does the text contain a match"
  * written as `size(regexp_extract_all(x, p, 0)) > 0` materializes EVERY
  * match into an array just to test emptiness — the natural way corpus
  * cleaning filters get written (count helpers reused as predicates).
  * Rewritten to `x RLIKE p`, which short-circuits on the first match and
  * allocates nothing. On a match-dense corpus column that is the
  * difference between one `Matcher.find()` and a full scan + array build
  * per row.
  *
  * Scope discipline: the rewrite fires ONLY inside Filter/Join
  * conditions, and ONLY under the default null regime. As a condition
  * the two forms are interchangeable when NULL input yields NULL (x =
  * NULL: both NULL, filtered out), but as a PROJECTED value `false` vs
  * `NULL` is observable, so projections are left alone — and under
  * `spark.sql.legacy.sizeOfNull` the size form yields `false`, which
  * diverges from RLIKE's NULL once the predicate sits under `NOT(...)`
  * (NOT false keeps the row; NOT NULL drops it), so legacy-regime Size
  * expressions are never matched (the flag is a field on the Size node,
  * checked in the pattern) rather than tracking predicate polarity.
  *
  * Installation: declaratively via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`), or imperatively on a live session with
  * `spark.experimental.extraOptimizations`. */
object ContainsMatchRewrite extends Rule[LogicalPlan] {

  /** size(regexp_extract_all(x, p, 0)) — the whole-match count shape.
    * `Size` captures the legacy flag AT CONSTRUCTION (a legacy-regime
    * size yields -1, not NULL, for NULL input), so matching on the
    * expression's own field — not the thread-local conf at rule-apply
    * time — is what makes the bail-out airtight. */
  private object MatchCount {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Size(RegExpExtractAll(x, p, Literal(0, IntegerType)), false) => Some((x, p))
      case _ => None
    }
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case GreaterThan(MatchCount(x, p), Literal(0, IntegerType)) => RLike(x, p)
    case LessThan(Literal(0, IntegerType), MatchCount(x, p)) => RLike(x, p)
    case GreaterThanOrEqual(MatchCount(x, p), Literal(1, IntegerType)) => RLike(x, p)
    case EqualTo(MatchCount(x, p), Literal(0, IntegerType)) => Not(RLike(x, p))
    case EqualTo(Literal(0, IntegerType), MatchCount(x, p)) => Not(RLike(x, p))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val c = rewrite(f.condition)
      if (c.fastEquals(f.condition)) f else f.copy(condition = c)
    case j: Join if j.condition.isDefined =>
      val c = j.condition.map(rewrite)
      if (c.exists(_.fastEquals(j.condition.get))) j else j.copy(condition = c)
  }
}
