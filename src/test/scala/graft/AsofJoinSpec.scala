package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    // key, time, px
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:02:00"), 200.0)
  ).toDF("qk", "qt", "px")

  private val trades = Seq(
    (1L, ts("2024-01-01 09:59:00"), "before-any"),   // before first quote
    (1L, ts("2024-01-01 10:05:00"), "tie"),          // equal time → matches 101
    (1L, ts("2024-01-01 10:07:00"), "between"),      // between quotes → 101
    (1L, ts("2024-01-01 11:00:00"), "after-all"),    // after last → 102
    (2L, ts("2024-01-01 10:03:00"), "other-key"),    // key 2 → 200
    (3L, ts("2024-01-01 10:03:00"), "no-right-rows") // key never quoted
  ).toDF("tk", "tt", "label")

  test("as-of join picks the latest right row at-or-before each left time") {
    val out = AsofJoin.asofJoin(trades, quotes, "tk", "qk", "tt", "qt", Seq("px"))
      .select("label", "px").as[(String, Option[Double])].collect().toMap
    assert(out("before-any").isEmpty)
    assert(out("tie").contains(101.0))
    assert(out("between").contains(101.0))
    assert(out("after-all").contains(102.0))
    assert(out("other-key").contains(200.0))
    assert(out("no-right-rows").isEmpty)
  }

  test("left row count and columns are preserved") {
    val out = AsofJoin.asofJoin(trades, quotes, "tk", "qk", "tt", "qt", Seq("px"))
    assert(out.count() === trades.count())
    assert(out.columns.toSeq === Seq("tk", "tt", "label", "px"))
  }

  test("payload name collision with the left side is rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes.withColumnRenamed("px", "label"),
        "tk", "qk", "tt", "qt", Seq("label"))
    }
  }

  test("approx_count_distinct stays within 5% of exact per group") {
    val df = sources.Tables.lineitem(spark, sf0001)
    val exact = df.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact")).as[(String, Long)].collect().toMap
    val approx = df.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx")).as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05, s"group $k: exact=$e approx=${approx(k)}")
    }
  }
}
