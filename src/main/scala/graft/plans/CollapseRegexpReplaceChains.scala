package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ChainedRegexpReplace

/** Optimizer rule: collapse a nested `regexp_replace(regexp_replace(..))`
  * chain with LITERAL patterns/replacements into one
  * [[ChainedRegexpReplace]] node.
  *
  * The chained form is how multi-step text normalization is naturally
  * written (URL canonicalization strips fragment → tracking params →
  * separators; PII redaction replaces email → IP → phone), and each step
  * costs an intermediate UTF8String materialization plus a decode/encode
  * round-trip per row. The fused node keeps the IDENTICAL sequential
  * `Matcher.replaceAll` semantics — pass i runs over pass i-1's output,
  * `$1` references included — so no pattern-overlap analysis is needed
  * and the rewrite is safe at ANY expression position (projection,
  * filter, join key): unlike [[ContainsMatchRewrite]] this is a pure
  * strength reduction, not a null-regime-sensitive predicate rewrite.
  *
  * Scope: only position-1 replaces (the Column API's only form; SQL's
  * 4-arg `regexp_replace(s, p, r, pos)` with pos ≠ 1 starts matching at
  * an offset and is left alone) with non-null string literals for both
  * pattern and replacement. Chains of length 1 are left alone — fusion
  * buys nothing there.
  */
object CollapseRegexpReplaceChains extends Rule[LogicalPlan] {

  /** Peel `RegExpReplace(RegExpReplace(...), p, r)` / an already-fused
    * inner node into (subject, patterns, replacements), innermost pass
    * first. */
  private object Chain {
    def unapply(e: Expression): Option[(Expression, Seq[String], Seq[String])] = e match {
      case RegExpReplace(subject, Literal(p: UTF8String, _), Literal(r: UTF8String, _),
          Literal(1, IntegerType)) =>
        subject match {
          case Chain(inner, ps, rs) => Some((inner, ps :+ p.toString, rs :+ r.toString))
          case _ => Some((subject, Seq(p.toString), Seq(r.toString)))
        }
      case ChainedRegexpReplace(subject, ps, rs) => Some((subject, ps, rs))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // transform is top-down: the OUTERMOST replace of each chain matches
    // first and swallows the whole chain in one step
    case Chain(subject, ps, rs) if ps.length >= 2 =>
      ChainedRegexpReplace(subject, ps, rs)
  }
}
