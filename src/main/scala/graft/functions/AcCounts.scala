package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-pattern occurrence counts of a literal phrase dictionary in ONE
  * Aho–Corasick pass (Aho & Corasick 1975, "Efficient string matching: an
  * aid to bibliographic search").
  *
  * Semantics: for each pattern p, the number of positions i where
  * `substr(text, i, len(p)) = p` — ALL occurrences, overlapping included
  * (both a pattern with itself, "a a" twice inside "a a a", and across
  * patterns sharing affixes). This is the oracle-expressible definition
  * (a position scan) and the automaton's natural output function.
  *
  * Why native: the blocklist-filter shape (C4's "dirty word" page screen,
  * Raffel et al. 2020 §2.2) carries dictionaries of hundreds-to-thousands
  * of phrases. The column form is |dict| independent `contains`/`instr`
  * scans per document — O(|dict| · len) with |dict| passes over every
  * text; the automaton is ONE pass whose cost is independent of
  * dictionary size (transitions are precomputed dense goto tables for
  * ASCII patterns, matches drain a precomputed fail-closure output list).
  * Same discipline as [[StopwordCounts]]: the trie/fail structure is built
  * once per plan on the driver and ships to tasks as a reference object.
  */
case class AcCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_ac_counts: need at least one non-empty pattern")
  require(patterns.forall(_.forall(_ < 128)),
    "graft_ac_counts: patterns must be ASCII (text may be any Unicode)")
  require(patterns.distinct.size == patterns.size,
    "graft_ac_counts: duplicate pattern")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ac_counts"

  @transient private lazy val automaton: AcAutomaton = AcAutomaton.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(automaton.counts(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $acRef.counts($s));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AcCounts =
    copy(child = newChild)
}

/** The built automaton: dense ASCII goto table (`next(state)(c)` already
  * fail-closed — the classic NFA→DFA conversion, so the scan loop is one
  * array read per char), and per-state output lists closed over the fail
  * chain. Non-ASCII input chars can extend no ASCII pattern, so they reset
  * to the root state without a table lookup.
  */
final class AcAutomaton(
    val next: Array[Array[Int]],       // state -> ascii char -> state
    val outputs: Array[Array[Int]],    // state -> pattern ids ending here (fail-closed)
    val nPatterns: Int) extends Serializable {

  /** One pass; counts in a fresh long[nPatterns]. UTF-16 chars above 127
    * (including surrogate halves — never ASCII-equal) reset to root. */
  def counts(text: UTF8String, out: Array[Long]): Array[Long] = {
    val str = text.toString
    val n = str.length
    var state = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      state = if (c < 128) next(state)(c) else 0
      val outs = outputs(state)
      var k = 0
      while (k < outs.length) { out(outs(k)) += 1L; k += 1 }
      i += 1
    }
    out
  }

  def counts(text: UTF8String): Array[Long] =
    counts(text, new Array[Long](nPatterns))

  /** One pass, summary only: `[total occurrences, distinct patterns hit]`.
    * The per-pattern array never materializes into the plan, so the cost
    * of consuming the result is independent of dictionary size — a
    * k-wide `element_at` fold over [[counts]] builds a k-deep expression
    * tree (interpreted-speed past ~64 terms, StackOverflow in the
    * analyzer past ~512; see CLAUDE.md k-wide-tree trap). */
  def summary(text: UTF8String): Array[Long] = {
    val str = text.toString
    val n = str.length
    val seen = new Array[Boolean](nPatterns)
    var hits = 0L
    var pats = 0L
    var state = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      state = if (c < 128) next(state)(c) else 0
      val outs = outputs(state)
      var k = 0
      while (k < outs.length) {
        hits += 1L
        if (!seen(outs(k))) { seen(outs(k)) = true; pats += 1L }
        k += 1
      }
      i += 1
    }
    Array(hits, pats)
  }
}

object AcAutomaton {

  /** Standard construction: trie, BFS fail links, fail-closed outputs,
    * then goto-table closure (missing transition = fail target's). */
  def build(patterns: Seq[String]): AcAutomaton = {
    val maxNodes = patterns.map(_.length).sum + 1
    val next = Array.fill(maxNodes)(Array.fill(128)(-1))
    val out = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        if (next(s)(c) < 0) { next(s)(c) = nNodes; nNodes += 1 }
        s = next(s)(c)
      }
      out(s) ::= pid
    }
    val fail = new Array[Int](nNodes)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 128) {
      val t = next(0)(c)
      if (t < 0) next(0)(c) = 0
      else { fail(t) = 0; queue.enqueue(t) }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = out(s) ++ out(fail(s)) // fail-closed output list
      var c2 = 0
      while (c2 < 128) {
        val t = next(s)(c2)
        if (t < 0) next(s)(c2) = next(fail(s))(c2) // DFA closure
        else { fail(t) = next(fail(s))(c2); queue.enqueue(t) }
        c2 += 1
      }
    }
    new AcAutomaton(next.take(nNodes), out.take(nNodes).map(_.sorted.toArray),
      patterns.size)
  }
}

/** The summary twin of [[AcCounts]]: `[n_hits, n_pats]` from the same
  * one-pass automaton — the form the blocklist VERDICT consumes, with
  * plan cost independent of dictionary size (see [[AcAutomaton.summary]]).
  */
case class AcSummary(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_ac_summary: need at least one non-empty pattern")
  require(patterns.forall(_.forall(_ < 128)),
    "graft_ac_summary: patterns must be ASCII (text may be any Unicode)")
  require(patterns.distinct.size == patterns.size,
    "graft_ac_summary: duplicate pattern")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ac_summary"

  @transient private lazy val automaton: AcAutomaton = AcAutomaton.build(patterns)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(automaton.summary(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $acRef.summary($s));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AcSummary =
    copy(child = newChild)
}

object AcSummary {
  val FunctionName = "graft_ac_summary"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        s"$FunctionName(text, patterns_spec): patterns_spec must be a literal")
      AcSummary(exprs.head, exprs(1).eval().toString.split('|').toSeq)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column API: `[n_hits, n_pats]` in one scan. */
  def of(text: Column, patterns: Seq[String]): Column = {
    require(patterns.forall(!_.contains('|')), "patterns must not contain '|'")
    register(SparkSession.active)
    call_function(FunctionName, text, lit(patterns.mkString("|")))
  }
}

object AcCounts {

  val FunctionName = "graft_ac_counts"

  /** Patterns travel as one foldable '|'-joined string literal (phrases may
    * contain any ASCII except '|'). */
  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        s"$FunctionName(text, patterns_spec): patterns_spec must be a literal")
      AcCounts(exprs.head, exprs(1).eval().toString.split('|').toSeq)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column API: array<long> of per-pattern occurrence counts, one scan. */
  def of(text: Column, patterns: Seq[String]): Column = {
    require(patterns.forall(!_.contains('|')), "patterns must not contain '|'")
    register(SparkSession.active)
    call_function(FunctionName, text, lit(patterns.mkString("|")))
  }
}
