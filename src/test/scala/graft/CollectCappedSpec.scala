package graft

import org.apache.spark.sql.functions._

import graft.functions.CollectCapped.collectCapped
import graft.ops.Dedup
import graft.sources.Tables

/** The capped collector must (a) truncate at the cap under both update and
  * merge paths, and (b) leave the dedup tiers' outputs bit-identical to the
  * unbounded collect_list + size-filter formulation it replaced. */
class CollectCappedSpec extends SparkSpecBase {
  import spark.implicits._

  test("caps the buffer under partial aggregation and merge") {
    // 10k copies of one hot key across 8 partitions: unbounded collect_list
    // would buffer 10k elements; the cap keeps at most 5 per group
    val df = spark.range(10000).repartition(8)
      .select((col("id") % 2).as("k"), col("id"))
    val out = df.groupBy("k").agg(collectCapped(col("id"), 5).as("ids"))
      .select(col("k"), size(col("ids")).as("n")).as[(Long, Int)].collect().toMap
    assert(out == Map(0L -> 5, 1L -> 5))
  }

  test("keeps all elements when under the cap, skips nulls") {
    val df = Seq((1L, Some(10L)), (1L, None), (1L, Some(30L)), (2L, Some(7L)))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(sort_array(collectCapped(col("v"), 100)).as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out == Map(1L -> Seq(10L, 30L), 2L -> Seq(7L)))
  }

  test("works on struct elements") {
    val df = Seq((1L, 2L, 3L), (1L, 4L, 5L)).toDF("k", "a", "b")
    val out = df.groupBy("k")
      .agg(collectCapped(struct(col("a"), col("b")), 10).as("es"))
      .select(col("k"), size(col("es")).as("n")).as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 2))
  }

  test("minhash pairs are bit-identical to the unbounded formulation") {
    val docs = Tables.documents(spark, sf0001)
    val capped = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      n = 3, numPerm = 64, rowsPerBand = 2, threshold = 0.5)
      .orderBy("id_a", "id_b").collect().toSeq
    // effectively-unbounded twin: a cap far above any real bucket size, so
    // truncation never fires and only the size filter differs (it doesn't:
    // no sf0.001 bucket exceeds the default 64 — asserted by equality)
    val loose = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      n = 3, numPerm = 64, rowsPerBand = 2, threshold = 0.5, maxBucket = 100000)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(capped == loose)
    assert(capped.nonEmpty)
  }
}
