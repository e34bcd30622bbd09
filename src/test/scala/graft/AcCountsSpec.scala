package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{AcAutomaton, AcCounts}

/** The Aho-Corasick dictionary counter vs the definitional position scan:
  * for each pattern p, count positions i with substr(text, i, len(p)) = p
  * (overlap-inclusive — the DuckDB oracle's list-comprehension form). */
class AcCountsSpec extends SparkSpecBase {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private def brute(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def viaAutomaton(text: String, pats: Seq[String]): Seq[Long] =
    AcAutomaton.build(pats).counts(UTF8String.fromString(text)).toSeq

  test("hand cases: nested, suffix-linked, and self-overlapping patterns") {
    val pats = Seq("slow", "low", "slow scan", "a a", "aa")
    // "slow scan": slow@0, low@1, slow scan@0 -> (1,1,1,_,_)
    assert(viaAutomaton("slow scan", pats) === Seq(1L, 1L, 1L, 0L, 0L))
    // overlap with self: "a a a" has "a a" at 0 and 2; "aaa" has "aa" twice
    assert(viaAutomaton("a a a", pats) === Seq(0L, 0L, 0L, 2L, 0L))
    assert(viaAutomaton("aaa", pats) === Seq(0L, 0L, 0L, 0L, 2L))
    // empty text, text shorter than every pattern
    assert(viaAutomaton("", pats) === Seq(0L, 0L, 0L, 0L, 0L))
    assert(viaAutomaton("x", pats) === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("non-ASCII text chars reset matching and never join a match") {
    val pats = Seq("ab", "b")
    assert(viaAutomaton("aéb ab", pats) === Seq(1L, 2L))
    // surrogate pair between pattern chars breaks the match
    assert(viaAutomaton("a😀b", pats) === Seq(0L, 1L))
  }

  test("property: automaton == position scan on random texts and dictionaries") {
    val alpha = Gen.oneOf('a', 'b', ' ', 'c')
    val word = Gen.choose(1, 5).flatMap(n => Gen.stringOfN(n, alpha))
    val dict = Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, word))
      .map(_.distinct).suchThat(_.nonEmpty)
    val text = Gen.choose(0, 60).flatMap(n => Gen.stringOfN(n, alpha))
    check(Prop.forAll(dict, text) { (pats: List[String], t: String) =>
      viaAutomaton(t, pats) == brute(t, pats)
    })
  }

  test("column API agrees with the scan under codegen (spark plan)") {
    val pats = Seq("slow", "low", "table table", "a a")
    val df = spark.createDataFrame(Seq(
      (0L, "slow scan of a a a table table table"),
      (1L, "nothing here"),
      (2L, "lowlands slowly"))).toDF("id", "t")
    val got = df.select(col("id"), AcCounts.of(col("t"), pats).as("c"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val want = Seq(
      brute("slow scan of a a a table table table", pats),
      brute("nothing here", pats),
      brute("lowlands slowly", pats))
    assert(got.toSeq.map(_.toSeq) === want)
  }

  test("property: one-pass summary equals the fold of per-pattern counts") {
    val alpha = Gen.oneOf('a', 'b', ' ', 'c')
    val word = Gen.choose(1, 5).flatMap(n => Gen.stringOfN(n, alpha))
    val dict = Gen.choose(1, 8).flatMap(k => Gen.listOfN(k, word))
      .map(_.distinct).suchThat(_.nonEmpty)
    val text = Gen.choose(0, 60).flatMap(n => Gen.stringOfN(n, alpha))
    check(Prop.forAll(dict, text) { (pats: List[String], t: String) =>
      val a = AcAutomaton.build(pats)
      val cs = a.counts(UTF8String.fromString(t))
      val s = a.summary(UTF8String.fromString(t))
      s.toSeq == Seq(cs.sum, cs.count(_ > 0).toLong)
    })
  }

  test("null text yields null counts, not a crash") {
    val df = spark.createDataFrame(Seq((0L, "slow"), (1L, null.asInstanceOf[String])))
      .toDF("id", "t")
    val rows = df.select(AcCounts.of(col("t"), Seq("slow")).as("c"))
      .orderBy(lit(1)).collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
