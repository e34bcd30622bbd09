package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word-set stopword counts in ONE native byte-scan pass.
  *
  * Semantics are EXACTLY `size(regexp_extract_all(lower(text),
  * "\\b(w1|w2|...)\\b", 0))` evaluated independently per set
  * ([[graft.ops.TextOps.stopwordCount]]): a `\b(word)\b` match over plain
  * `[a-z0-9]+` words is precisely a maximal Java-`\b`-word token equal to
  * the word (`\b`'s word class is `'_' || Character.isLetterOrDigit` —
  * Unicode, UNLIKE the ASCII `\w`; see [[StopwordCounts.counts]]), so
  * counting set-membership of those runs reproduces each regex count
  * bit-for-bit — including underscore-joins ("a_the_b" never matches) and
  * Unicode-letter joins ("theé" never matches). Parity is property-tested
  * against the regex formulation in StopwordCountsSpec.
  *
  * Why native: the language-ID / quality queries score FOUR sets per
  * document; the column form runs four full `java.util.regex` scans of
  * every document (ProbeBand measured the 4-set stage at 0.38 s / 3.50 s
  * for sf0.1 / sf1x — the hottest stage of q_pipeline_assemble). Here the
  * lowercased bytes are scanned ONCE; tokens longer than the longest listed
  * word are skipped without allocation.
  */
case class StopwordCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {
  require(sets.nonEmpty && sets.forall(_.nonEmpty), "need at least one non-empty word set")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_stopword_counts"

  @transient private lazy val lookup: Array[java.util.HashSet[String]] =
    StopwordCounts.buildLookup(sets)
  @transient private lazy val maxLen: Int = sets.flatten.map(_.length).max

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      StopwordCounts.counts(input.asInstanceOf[UTF8String], lookup, maxLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = StopwordCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val setsRef = ctx.addReferenceObj("wordSets", lookup, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.counts($s, $setsRef, $maxLen));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCounts =
    copy(child = newChild)
}

object StopwordCounts {

  def buildLookup(sets: Seq[Seq[String]]): Array[java.util.HashSet[String]] =
    sets.map { ws =>
      val h = new java.util.HashSet[String]()
      ws.foreach(w => h.add(w.toLowerCase))
      h
    }.toArray

  /** One pass over the LOWERCASED code points (UTF8String.toLowerCase —
    * the same lowering Spark's `lower` applies). Java's `\b` word set is
    * NOT the ASCII `\w`: empirically (and per Pattern's BoundMatcher) a
    * word char for `\b` is `'_' || Character.isLetterOrDigit(cp)` with the
    * FULL Unicode classifier — 'é'/'世'/'Ä' are word chars (so "theé"
    * does NOT match `\bthe\b`) while '²'/'½'/ZWJ are boundaries. Tokens
    * are maximal runs of that class; a run matches a stopword only when it
    * is pure ASCII `[a-z0-9_]` and no longer than `maxLen` (all listed
    * words are ASCII), so most tokens are skipped without allocating. */
  def counts(s: UTF8String, sets: Array[java.util.HashSet[String]], maxLen: Int): Array[Int] = {
    val str = s.toLowerCase.toString
    val out = new Array[Int](sets.length)
    val n = str.length
    var i = 0
    var start = -1
    var ascii = true
    while (i <= n) {
      var word = false
      var step = 1
      if (i < n) {
        val cp = str.codePointAt(i)
        step = Character.charCount(cp)
        word = cp == '_' || Character.isLetterOrDigit(cp)
        if (word) {
          if (start < 0) { start = i; ascii = true }
          if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == '_'))
            ascii = false
        }
      }
      if (!word && start >= 0) {
        val len = i - start
        if (ascii && len <= maxLen) {
          val tok = str.substring(start, i)
          var k = 0
          while (k < sets.length) {
            if (sets(k).contains(tok)) out(k) += 1
            k += 1
          }
        }
        start = -1
      }
      i += step
    }
    out
  }

  val FunctionName = "graft_stopword_counts"

  /** Sets travel as one foldable string literal: words comma-joined, sets
    * '|'-joined (stopword lists are plain [a-z]+ words). */
  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        s"$FunctionName(text, sets_spec): sets_spec must be a literal")
      val spec = exprs(1).eval().toString
      StopwordCounts(exprs.head,
        spec.split('|').toSeq.map(_.split(',').toSeq.filter(_.nonEmpty)))
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column API: array<int> of per-set counts, one text scan. */
  def of(text: Column, sets: Seq[Seq[String]]): Column = {
    register(SparkSession.active)
    call_function(FunctionName, text, lit(sets.map(_.mkString(",")).mkString("|")))
  }
}
