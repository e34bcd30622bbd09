package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Parity proof for the fused stopword counter: graft_stopword_counts must
  * equal size(regexp_extract_all(lower(text), "\b(...)\b")) PER SET on
  * every boundary case Java's ASCII \b can produce. */
class StopwordCountsSpec extends SparkSpecBase {
  import spark.implicits._

  private val sets = Seq(TextOps.StopwordsEn, TextOps.StopwordsDe,
    TextOps.StopwordsFr, TextOps.StopwordsEs)

  private def assertParity(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sc = TextOps.langScores(col("text"))
    val rows = df.select(col("id"),
        sc.getItem(0).as("f0"), sc.getItem(1).as("f1"),
        sc.getItem(2).as("f2"), sc.getItem(3).as("f3"),
        TextOps.stopwordCount(col("text"), sets(0)).as("r0"),
        TextOps.stopwordCount(col("text"), sets(1)).as("r1"),
        TextOps.stopwordCount(col("text"), sets(2)).as("r2"),
        TextOps.stopwordCount(col("text"), sets(3)).as("r3"))
      .collect()
    rows.foreach { r =>
      (0 until 4).foreach { k =>
        assert(r.getInt(1 + k) === r.getInt(5 + k),
          s"set $k diverged on text ${texts(r.getLong(0).toInt)}")
      }
    }
  }

  test("hand-built boundary cases: underscores, digits, case, unicode, punctuation") {
    assertParity(Seq(
      "the quick fox and the dog",          // plain hits
      "THE AND Of To IN Is",                // lower() path
      "a_the_b the_ _the the1 1the",        // _ and digits are \w: joined tokens never match
      "theory thesis other pandas",          // substrings never match
      "the,and.of;to:in!is?",               // punctuation boundaries all match
      "thé theé éthe 世the",  // non-ASCII chars are NON-word: boundaries
      "İstanbul the İs",          // Turkish dotted I lowercases to i + combining dot
      "the  \t\n and",                      // whitespace runs
      "", " ", "___", "123 456",            // empty/no-token shapes
      "y es el en the und est dans",        // cross-set hits in one text
      "en en en en",                        // repeats count every occurrence
      "le la les et est dans der die das"   // fr + de mixed
    ))
  }

  test("property: random token soups agree with the regex formulation") {
    val words = sets.flatten ++ Seq("x", "the_", "_es", "qq", "thé", "123", "a1",
      "theory", "esx", "yy", "_", "")
    val seps = Seq(" ", ", ", "_", "-", ".", "\n", "é", "世", "")
    val rnd = new scala.util.Random(42)
    val texts = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map { _ =>
        words(rnd.nextInt(words.length)) + seps(rnd.nextInt(seps.length))
      }.mkString
    }
    assertParity(texts)
  }

  test("null text yields null; empty sets rejected at build") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "the")).toDF("id", "text")
    val got = df.select(col("id"), TextOps.langScores(col("text")).as("sc"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1))
    assert(got(1).getSeq[Int](1) === Seq(1, 0, 0, 0))
    intercept[Exception] {
      Seq(("a", 1)).toDF("text", "i")
        .select(graft.functions.StopwordCounts.of(col("text"), Seq(Seq.empty))).collect()
    }
  }
}
