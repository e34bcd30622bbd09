package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.ViterbiSeg

/** The Viterbi segmentation DP vs a full-enumeration referee: minimum
  * total surprisal, ties resolved by the longest-last-piece rule applied
  * from the end (the global order the DP's local `j DESC` pick induces,
  * and the oracle's `ORDER BY score ASC, j DESC` reproduces). */
class ViterbiSegSpec extends SparkSpecBase {

  private val MaxPiece = 4

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private def toMap(vocab: Seq[(String, Long)]) = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, s) => h.put(p, s) }
    h
  }

  /** All segmentations into pieces of length 1..MaxPiece. */
  private def enumerate(w: String): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(MaxPiece, w.length)).flatMap { j =>
      enumerate(w.drop(j)).map(w.take(j) :: _)
    }

  private def refSegment(w: String, vocab: Map[String, Long]): String = {
    // invalid-piece sentinel must stay far from Long overflow when a
    // short word's WORST segmentation sums several of them, yet dominate
    // any sum of valid/UNK costs (<= 10 pieces x 1e9)
    def cost(p: String): Long =
      vocab.getOrElse(p,
        if (p.length == 1) ViterbiSeg.UnkPenaltyMicro else 1000000000000L)
    // order: total cost ASC, then piece lengths compared FROM THE END,
    // longer first (the DP's local j-DESC tie-break, applied recursively)
    import scala.math.Ordering.Implicits._
    val best = enumerate(w).minBy { seg =>
      (seg.map(cost).sum, seg.reverse.map(p => -p.length): Seq[Int])
    }
    best.mkString("|")
  }

  test("hand case: equal-cost split prefers the longer LAST piece") {
    // vocab: ab|cd and abc|d both cost 20; a|bcd costs 20 too.
    val vocab = Seq("ab" -> 10L, "cd" -> 10L, "abc" -> 10L, "d" -> 10L,
      "a" -> 10L, "bcd" -> 10L)
    // last pieces: cd (2), d (1), bcd (3) -> bcd wins
    assert(ViterbiSeg.segment("abcd", toMap(vocab), MaxPiece) === "a|bcd")
  }

  test("unknown characters fall back to UNK single-char pieces") {
    val vocab = Seq("ab" -> 5L)
    assert(ViterbiSeg.segment("abxab", toMap(vocab), MaxPiece) === "ab|x|ab")
    assert(ViterbiSeg.segment("", toMap(vocab), MaxPiece) === "")
  }

  test("property: DP equals the full-enumeration referee") {
    val piece = Gen.choose(1, MaxPiece)
      .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    val vocabGen = for {
      k <- Gen.choose(1, 12)
      ps <- Gen.listOfN(k, piece)
      ss <- Gen.listOfN(k, Gen.chooseNum(1L, 30L))
    } yield ps.distinct.zip(ss).toMap ++
      // guarantee coverage like the corpus fit does
      Seq("a" -> 7L, "b" -> 9L, "c" -> 9L)
    val wordGen = Gen.choose(0, 9).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
    check(Prop.forAll(vocabGen, wordGen) { (vocab: Map[String, Long], w: String) =>
      ViterbiSeg.segment(w, toMap(vocab.toSeq), MaxPiece) == refSegment(w, vocab)
    })
  }

  test("column API under codegen matches the scala kernel") {
    val vocab = Seq("a" -> 7L, "b" -> 9L, "ab" -> 12L, "ba" -> 11L, "abb" -> 20L)
    val words = Seq("abba", "aaaa", "b", "abab")
    val df = spark.createDataFrame(words.map(Tuple1(_))).toDF("w")
    val got = df.select(ViterbiSeg.of(col("w"), vocab, MaxPiece).as("seg"))
      .collect().map(_.getString(0)).toSeq
    assert(got === words.map(w => ViterbiSeg.segment(w, toMap(vocab), MaxPiece)))
  }
}
