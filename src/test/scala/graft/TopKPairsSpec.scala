package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKPairs
import graft.sources.Tables

class TopKPairsSpec extends SparkSpecBase {

  private def viaAgg(k: Int) = {
    Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(TopKPairs.topK(-unix_micros(col("ts")), col("event_id"), k).as("tk"))
      .select(col("user_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("user_id"), (col("i") + 1).as("rn"), col("e.id").as("event_id"))
  }

  test("native top-k equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").asc)
    val expect = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"))
      .collect().map(_.toString).sorted.toSeq
    val got = viaAgg(3).collect().map(_.toString).sorted.toSeq
    assert(got === expect)
  }

  test("compaction path: 10k rows in one group still yields the exact smallest k") {
    import spark.implicits._
    // shuffled insertion order, several partitions => update-compact and
    // merge-compact both fire (buffer cap is 8k longs for k=5)
    val rows = scala.util.Random.shuffle((1L to 10000L).toList)
      .map(i => (1L, i * 7L % 10007L, i))
    val df = rows.toDF("g", "ord", "id").repartition(7)
    val got = df.groupBy("g").agg(TopKPairs.topK(col("ord"), col("id"), 5).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.ord"), col("e.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = rows.map(t => (t._2, t._3)).sorted.take(5)
    assert(got === expect)
  }

  test("top-k is partitioning-invariant") {
    val a = viaAgg(3).collect().map(_.toString).sorted.toSeq
    val ev = Tables.events(spark, sf0001).repartition(13)
    val b = ev.groupBy("user_id")
      .agg(TopKPairs.topK(-unix_micros(col("ts")), col("event_id"), 3).as("tk"))
      .select(col("user_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("user_id"), (col("i") + 1).as("rn"), col("e.id").as("event_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("plan: partial ObjectHashAggregate, no Window, no input Sort before the exchange") {
    val plan = viaAgg(3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_"), s"expected partial aggregation in:\n$plan")
    assert(!plan.contains("Window"), s"native top-k must not fall back to a window:\n$plan")
  }
}
