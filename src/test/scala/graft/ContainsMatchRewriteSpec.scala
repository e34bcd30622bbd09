package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.ContainsMatchRewrite
import graft.sources.Tables

/** The optimizer-rule surface: `ContainsMatchRewrite` must (a) actually
  * rewrite the plan, (b) preserve semantics, (c) leave genuine count
  * comparisons and projections alone. */
class ContainsMatchRewriteSpec extends SparkSpecBase {

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ ContainsMatchRewrite
    try body finally spark.experimental.extraOptimizations = before
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private lazy val docs = Tables.documents(spark, sf0001)

  test("contains-match filter rewrites to RLIKE and drops the array build") {
    withRule {
      val df = docs.filter(
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))) > 0)
      val plan = optimized(df)
      assert(plan.contains("RLIKE"), plan)
      assert(!plan.contains("regexp_extract_all"), plan)
      // semantics: equal to the straightforward rlike
      assert(df.count() === docs.filter(col("text").rlike("[0-9]+")).count())
    }
  }

  test("zero-equality rewrites to NOT RLIKE with identical row sets") {
    withRule {
      val df = docs.filter(
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))) === 0)
      val plan = optimized(df)
      assert(plan.contains("RLIKE"), plan)
      assert(!plan.contains("regexp_extract_all"), plan)
      assert(df.count() === docs.filter(!col("text").rlike("[0-9]+")).count())
      // the two branches partition the corpus
      assert(df.count() +
        docs.filter(col("text").rlike("[0-9]+")).count() === docs.count())
    }
  }

  test("genuine count thresholds and projections are left alone") {
    withRule {
      // > 1 is a real count question — must keep the extract_all
      val counted = docs.filter(
        size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))) > 1)
      assert(optimized(counted).contains("regexp_extract_all"))
      // projected boolean: false vs NULL is observable — must not rewrite
      val projected = docs.select(
        (size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))) > 0)
          .as("has_digit"))
      assert(optimized(projected).contains("regexp_extract_all"))
    }
  }

  test("legacy-regime Size nodes are never rewritten") {
    // under spark.sql.legacy.sizeOfNull a legacy-built size() yields -1
    // for NULL input, so `size(...) > 0` is false where RLIKE is NULL —
    // observable under NOT() (NOT false keeps the row, NOT NULL drops
    // it). The legacy regime is captured as a FIELD on the Size node at
    // construction, and Size EXECUTES by that field (not by the conf at
    // run time), so the rule matches on the field: a legacy node must
    // survive while the same shape with the default field rewrites.
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Literal, RegExpExtractAll, Size}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
    val t = Symbol("text").string
    def plan(legacy: Boolean) = Filter(
      GreaterThan(
        Size(RegExpExtractAll(t, Literal("[0-9]+"), Literal(0)), legacy),
        Literal(0)),
      LocalRelation(t))
    assert(graft.plans.ContainsMatchRewrite(plan(true)) === plan(true))
    assert(graft.plans.ContainsMatchRewrite(plan(false)).toString
      .contains("RLIKE"))
  }

  test("without the rule the plan keeps the array build (control)") {
    val df = docs.filter(
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))) > 0)
    assert(optimized(df).contains("regexp_extract_all"))
  }

  test("GraftExtensions installs functions and the optimizer rule cleanly") {
    // the declarative path registers against a fresh extensions holder
    // (a shared-JVM getOrCreate cannot exercise session construction);
    // the injectOptimizerRule call itself must accept the rule
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(holder)
  }
}
