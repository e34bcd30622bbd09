package graft

import org.apache.spark.sql.functions._

import graft.functions.{Winnow, WinnowFingerprints}
import graft.ops.Dedup
import graft.sources.Tables

class WinnowSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 5
  private val W = 4

  test("identical texts produce identical fingerprint arrays") {
    val a = WinnowFingerprints.winnow("the quick brown fox jumps over the lazy dog", K, W)
    val b = WinnowFingerprints.winnow("the quick brown fox jumps over the lazy dog", K, W)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("winnow guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    val common = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 > w+k-1 = 8
    val d1 = "XXXX " + common + " YYYY"
    val d2 = "totally different prefix " + common + " and suffix"
    val f1 = WinnowFingerprints.winnow(d1, K, W).toSet
    val f2 = WinnowFingerprints.winnow(d2, K, W).toSet
    assert(f1.intersect(f2).nonEmpty)
  }

  test("short text below k yields no fingerprints; at k yields one") {
    assert(WinnowFingerprints.winnow("abc", K, W).isEmpty)
    assert(WinnowFingerprints.winnow("abcde", K, W).length === 1)
  }

  test("codegen and interpreted paths agree") {
    val df = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"), Winnow.fingerprints(col("text"), K, W).as("fps"))
    val viaCodegen = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaOracle = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> WinnowFingerprints.winnow(r.getString(1), K, W).toSeq).toMap
    assert(viaCodegen === viaOracle)
  }

  test("planted copied passage is detected; unrelated docs are not paired") {
    val passage = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"intro text here $passage closing remarks"),
      (2L, s"completely different opening $passage different ending too"),
      (3L, "no shared content at all just random words qqq www eee rrr")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text", K, W, minShared = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }
}
