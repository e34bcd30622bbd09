package graft

import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin

class IntervalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(iv: Seq[(Long, Long, Long)], pts: Seq[Long], w: Int) =
    IntervalJoin.pointsInIntervals(
        iv.toDF("id", "lo", "hi"), pts.toDF("day"), w)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet

  test("half-open containment across bin boundaries") {
    // binWidth 8: interval [6, 13) spans bins 0 and 1; [8, 16) sits in 1
    val iv = Seq((1L, 6L, 13L), (2L, 8L, 16L))
    val pts = Seq(5L, 6L, 7L, 8L, 12L, 13L, 15L, 16L)
    assert(run(iv, pts, 8) === Set(
      (1L, 6L), (1L, 7L), (1L, 8L), (1L, 12L),            // 5 before, 13 = hi out
      (2L, 8L), (2L, 12L), (2L, 13L), (2L, 15L)))         // 16 = hi out
  }

  test("interval of exactly binWidth days and bin-aligned bounds") {
    // [8, 16) with width 8: lo bin 1, (hi-1) bin 1 -> single bin, no dup rows
    val rows = IntervalJoin.pointsInIntervals(
        Seq((1L, 8L, 16L)).toDF("id", "lo", "hi"), Seq(8L, 15L).toDF("day"), 8)
      .collect()
    assert(rows.length === 2) // a 2-bin explode without array_distinct would dup
  }

  test("binned rewrite equals the naive theta join on dense data") {
    val iv = (0L until 40L).map(i => (i, i * 3 % 50, i * 3 % 50 + 1 + i % 7))
    val pts = (0L until 120L).map(_ % 60)
    val naive = (for {
      (id, lo, hi) <- iv; d <- pts if d >= lo && d < hi
    } yield (id, d)) // multiset: duplicate points count twice
    val got = IntervalJoin.pointsInIntervals(
        iv.toDF("id", "lo", "hi"), pts.toDF("day"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got.sorted === naive.sorted)
    // the day-rollup count path (aggregate pushdown) equals counting the
    // matched-pair stream — same result, linear instead of density-squared
    val counts = IntervalJoin.countPointsInIntervals(
        iv.toDF("id", "lo", "hi"), pts.toDF("day"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts === naive.groupBy(_._1).view.mapValues(_.size.toLong).toMap)
  }

  test("degenerate intervals (hi <= lo) count zero, matching the pair form") {
    // before round 8, sequence(lo, hi-1) DESCENDED for hi <= lo and the
    // count path silently counted days outside the degenerate interval
    val iv = Seq((1L, 10L, 10L), (2L, 12L, 9L), (3L, 9L, 12L))
    val pts = Seq(8L, 9L, 10L, 11L, 12L)
    val counts = IntervalJoin.countPointsInIntervals(
        iv.toDF("id", "lo", "hi"), pts.toDF("day"), 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts === Map(3L -> 3L)) // only the real interval, 9/10/11
    assert(run(iv, pts, 8) === Set((3L, 9L), (3L, 10L), (3L, 11L)))
  }

  test("an interval longer than binWidth raises instead of losing matches") {
    // [0, 20) with binWidth 8 spans bins 0,1,2 — the ≤2-bin registration
    // would silently drop bin-1 days; both paths must refuse
    val iv = Seq((1L, 0L, 20L)).toDF("id", "lo", "hi")
    val pts = Seq(10L).toDF("day")
    intercept[Exception] {
      IntervalJoin.pointsInIntervals(iv, pts, 8).collect()
    }
    intercept[Exception] {
      IntervalJoin.countPointsInIntervals(iv, pts, 8).collect()
    }
  }
}
