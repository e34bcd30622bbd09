package graft

import org.apache.spark.sql.functions._

import graft.ops.Maintain
import graft.sources.Tables

/** Maintenance-tier properties: merge classification totals, skyline
  * decomposition vs the naive quadratic, bloom reduction losslessness and
  * no-false-negatives, and checksum partitioning-invariance. */
class MaintainSpec extends SparkSpecBase {
  import spark.implicits._

  test("mergeClassify partitions the key space exactly (insert/update/delete/keep)") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v")
    val chg = Seq((2L, Some(21.0), "u"), (4L, None, "d"), (9L, Some(90.0), "u"))
      .toDF("k", "v", "op")
    val got = Maintain.mergeClassify(base, chg, "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "keep", Some(10.0)),
      (2L, "update", Some(21.0)),
      (3L, "keep", Some(30.0)),
      (4L, "delete", None),
      (9L, "insert", Some(90.0))))
  }

  test("paretoFront2D equals the naive quadratic dominance filter, ties kept") {
    // deterministic pseudo-random 2-D points from the fixture hash, with
    // planted ties: two rows share the best (price, size) corner
    val pts = spark.range(500).select(col("id"),
        (pmod(hash(col("id")), lit(1000)) / 10.0).as("price"),
        pmod(hash(col("id") * 7 + 1), lit(40)).cast("int").as("size"))
      .unionAll(Seq((9001L, 99.9, 0), (9002L, 99.9, 0)).toDF("id", "price", "size"))
    val fast = Maintain.paretoFront2D(pts, "price", "size")
      .select("id").collect().map(_.getLong(0)).toSet
    val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val naive = rows.filter { case (_, p, s) =>
      !rows.exists { case (_, p2, s2) => p2 >= p && s2 <= s && (p2 > p || s2 < s) }
    }.map(_._1).toSet
    assert(fast === naive)
    assert(fast.contains(9001L) && fast.contains(9002L), "ties must both survive")
  }

  test("bloomContains has no false negatives and bloomReduceJoin equals the plain join") {
    val dim = Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    val fact = Tables.orders(spark, sf0001).select(col("o_custkey"), col("o_totalprice"))
    // no false negatives: every true dim key passes the bitmap test
    val m = 4096; val j = 3
    val bloom = udaf(new graft.ops.Sketch.BloomAgg(m, j))
    val bitmap = dim.select(col("c_custkey").cast("string").as("k"))
      .agg(bloom(col("k")).as("bits"))
    val misses = dim.crossJoin(broadcast(bitmap))
      .filter(!Maintain.bloomContains(col("c_custkey"), col("bits"), m, j))
      .count()
    assert(misses === 0L)
    // lossless: reduced join == plain join, row for row
    val got = Maintain.bloomReduceJoin(fact, "o_custkey", dim, "c_custkey")
      .select("o_custkey", "o_totalprice", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getAs[Number](2).longValue)).sorted.toSeq
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_custkey", "o_totalprice", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getAs[Number](2).longValue)).sorted.toSeq
    assert(got === plain)
  }

  test("contentChecksum is invariant under repartitioning (order-independent folds)") {
    val docs = Tables.documents(spark, sf0001)
    val content = concat(col("doc_id").cast("string"), lit(":"), col("text"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Maintain.contentChecksum(df, "source", content)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    assert(sums(docs.repartition(17, col("text"))) === sums(docs.coalesce(1)))
    // and it actually discriminates: dropping one row changes the group
    val all = sums(docs)
    val dropped = sums(docs.filter(col("doc_id") =!= 3L))
    assert(all !== dropped)
  }
}
