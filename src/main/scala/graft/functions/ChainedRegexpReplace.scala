package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** One expression node for a whole `regexp_replace(regexp_replace(..))`
  * chain (URL canonicalization and PII redaction build 3–6-deep chains).
  *
  * Semantics are EXACTLY the sequential chain's — each (pattern,
  * replacement) pass runs left-to-right over the previous pass's output
  * via the same `Matcher.replaceAll` contract Spark's `RegExpReplace`
  * implements for position 1 (including `$1` group references in the
  * replacement) — so the [[graft.plans.CollapseRegexpReplaceChains]]
  * rewrite needs NO overlap analysis between the patterns to be safe.
  * What the fusion removes is the per-step expression overhead: a chain
  * of N `RegExpReplace` nodes materializes N intermediate `UTF8String`s
  * and N `String` decode/encode round-trips per row; this node decodes
  * once, loops N compiled patterns over a single `java.lang.String`, and
  * encodes once.
  *
  * Patterns and replacements must be foldable (the rule only fuses
  * literal chains), so they compile once per executor at expression
  * construction and ride codegen as a reference object.
  */
case class ChainedRegexpReplace(child: Expression,
                                patterns: Seq[String],
                                replacements: Seq[String])
    extends UnaryExpression {

  require(patterns.length == replacements.length && patterns.nonEmpty,
    "need one replacement per pattern")

  override def dataType: DataType = child.dataType

  @transient private lazy val compiled: Array[Pattern] =
    patterns.map(Pattern.compile).toArray

  @transient private lazy val reps: Array[String] = replacements.toArray

  override protected def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var i = 0
    while (i < compiled.length) {
      s = compiled(i).matcher(s).replaceAll(reps(i))
      i += 1
    }
    UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("patterns", compiled, "java.util.regex.Pattern[]")
    val rs = ctx.addReferenceObj("replacements", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $in.toString();
         |for (int $i = 0; $i < $pats.length; $i++) {
         |  $s = $pats[$i].matcher($s).replaceAll($rs[$i]);
         |}
         |${ev.value} = UTF8String.fromString($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
