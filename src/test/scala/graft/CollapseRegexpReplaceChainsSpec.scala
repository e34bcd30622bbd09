package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CleanOps
import graft.plans.CollapseRegexpReplaceChains
import graft.sources.Tables

/** The regexp_replace fusion rule: must fuse literal chains into one
  * sequential-semantics node, preserve results bit-for-bit (the chain IS
  * the semantics), and leave offset-position replaces alone. */
class CollapseRegexpReplaceChainsSpec extends SparkSpecBase {
  import spark.implicits._

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ CollapseRegexpReplaceChains
    try body finally spark.experimental.extraOptimizations = before
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("fires on the declared URL-canonicalization query's plan") {
    withRule {
      val df = SparkEntry.queries("q_url_canonical")(spark, sf0001)
      val plan = optimized(df)
      assert(plan.contains("chainedregexpreplace"), plan)
      // the 3-deep strip-fragment/tracking/tidy chain is gone; the two
      // independent single replaces (host lowering, path collapse) stay
      assert(!plan.contains("regexp_replace(regexp_replace"), plan)
    }
  }

  test("fusion preserves canonicalizeUrl and redactPii bit-for-bit") {
    // inputs hang off spark.range leaves: a Seq.toDF LocalRelation would
    // be constant-folded into the relation at optimize time, leaving no
    // expression for the rule to (visibly) fuse
    def rows(vals: String*) = spark.range(vals.length).select(
      element_at(array(vals.map(v => if (v == null) lit(null) else lit(v)): _*),
        (col("id") + 1).cast("int")).as("s"))
    val urls = rows(
      "HTTPS://Example.COM:443/a//b/?utm_source=x&id=7#frag",
      "http://h/p/?ref=z&utm_campaign=c&",
      "https://plain.org/path///",
      "ftp://User@Host:21/Mixed/Case?x=1",
      null
    ).withColumnRenamed("s", "url")
    val texts = rows(
      "mail a.b%c@d-e.fg or 10.0.0.1 then 555-1234 done",
      "digits 123-4567@x.yy keep email whole",
      null
    ).withColumnRenamed("s", "text")
    val baseU = urls.select(CleanOps.canonicalizeUrl(col("url")).as("c")).collect().toSeq
    val baseT = texts.select(CleanOps.redactPii(col("text")).as("c")).collect().toSeq
    withRule {
      val fusedU = urls.select(CleanOps.canonicalizeUrl(col("url")).as("c"))
      assert(optimized(fusedU).contains("chainedregexpreplace"))
      assert(fusedU.collect().toSeq === baseU)
      val fusedT = texts.select(CleanOps.redactPii(col("text")).as("c"))
      assert(optimized(fusedT).contains("chainedregexpreplace"))
      assert(fusedT.collect().toSeq === baseT)
    }
  }

  test("group references and pass-over-previous-output semantics survive fusion") {
    // pass 1 rewrites with $1; pass 2 matches text CREATED by pass 1 —
    // exactly the case where a parallel single-pass rewrite would diverge.
    // (the subject rides the range leaf so ConstantFolding can't collapse
    // the chain before the rule sees it)
    def df = spark.range(1).selectExpr("concat('ab ab', repeat('x', cast(id AS int))) AS s")
      .select(regexp_replace(regexp_replace(col("s"), "(a)b", "$1x"), "ax ax", "Y").as("r"))
    val expected = df.collect().map(_.getString(0)).toSeq
    assert(expected === Seq("Y"))
    withRule {
      val fused = df
      assert(optimized(fused).contains("chainedregexpreplace"), optimized(fused))
      assert(fused.collect().map(_.getString(0)).toSeq === expected)
    }
  }

  test("offset-position replaces and single replaces are left alone") {
    withRule {
      // SQL 4-arg form with pos != 1 starts matching at an offset — no fusion
      val posForm = spark.range(1)
        .selectExpr("concat('aaaa', repeat('z', cast(id AS int))) AS s")
        .selectExpr("regexp_replace(regexp_replace(s, 'a', 'b', 2), 'b', 'c', 3) AS r")
      assert(!optimized(posForm).contains("chainedregexpreplace"), optimized(posForm))
      assert(posForm.collect().head.getString(0) === "abcc")
      // a single replace has nothing to fuse
      val single = spark.range(1).selectExpr("cast(id AS string) AS s")
        .select(regexp_replace(col("s"), "0", "y").as("r"))
      assert(!optimized(single).contains("chainedregexpreplace"))
      assert(single.collect().head.getString(0) === "y")
    }
  }

  test("a non-literal pattern anywhere breaks the chain at that point") {
    withRule {
      val df = spark.range(1)
        .selectExpr("concat('aba', repeat('z', cast(id AS int))) AS s",
          "substring('a', 1, 1 + cast(id AS int)) AS p")
        .select(
          regexp_replace(
            regexp_replace(regexp_replace(col("s"), "b", "B"), col("p"), lit("X")),
            "X", "Z").as("r"))
      // the inner literal pair below the dynamic step cannot merge past
      // it, and (being a chain of one on each side) nothing fuses
      assert(!optimized(df).contains("chainedregexpreplace"), optimized(df))
      assert(df.collect().head.getString(0) === "ZBZ")
    }
  }

  test("fused plan matches the declared query's oracle rows on real data") {
    // end-to-end referee: q_url_canonical's full result with the rule on
    // equals its result with the rule off, on the real documents fixture
    val base = SparkEntry.queries("q_url_canonical")(spark, sf0001).collect().toSeq
    withRule {
      val fused = SparkEntry.queries("q_url_canonical")(spark, sf0001).collect().toSeq
      assert(fused === base)
    }
    Tables.documents(spark, sf0001) // keep the table loader warm for other suites
  }
}
