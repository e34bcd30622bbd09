package graft

import org.apache.spark.sql.functions._

import graft.ops.Cluster
import graft.sources.Tables

class ClusterSpec extends SparkSpecBase {
  private lazy val emb = Tables.embeddings(spark, sf0001)
  private lazy val n = emb.count()

  test("kmeans partitions the corpus: sizes sum to |corpus|, cids unique") {
    val out = Cluster.kmeansFixedPoint(emb, k = 8, iters = 2).collect()
    assert(out.map(_.getAs[Long]("cid")).distinct.length === out.length)
    assert(out.map(_.getAs[Long]("size")).sum === n)
    assert(out.forall(_.getAs[Long]("avg_qdist") >= 0L))
    assert(out.forall(_.getAs[Long]("centroid_sum") > 0L)) // +1 shift ⇒ positive
  }

  test("Lloyd monotonicity: 2 updates never raise total within-cluster cost") {
    def total(iters: Int): Long =
      Cluster.kmeansFixedPoint(emb, k = 8, iters = iters).collect()
        .map(r => r.getAs[Long]("avg_qdist") * r.getAs[Long]("size")).sum
    // avg_qdist is a truncated integer mean — allow 1 unit of slack per row
    assert(total(2) <= total(0) + n)
  }

  test("kmeans result is partitioning-invariant (exact integer arithmetic)") {
    val a = Cluster.kmeansFixedPoint(emb, k = 8, iters = 1).collect().map(_.toString).toSeq
    val b = Cluster.kmeansFixedPoint(emb.repartition(13), k = 8, iters = 1)
      .collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("salted two-phase exemplars == naive form at any salts count") {
    val baseline = Cluster.clusterExemplars(emb, k = 8, iters = 1, m = 5, salts = 1)
      .collect().map(_.toString).toSeq
    Seq(3, 8, 16).foreach { s =>
      val got = Cluster.clusterExemplars(emb, k = 8, iters = 1, m = 5, salts = s)
        .collect().map(_.toString).toSeq
      assert(got === baseline, s"salts=$s diverged")
    }
  }

  test("exemplars: at most m per cluster, ranks contiguous, qdist ascending") {
    val out = Cluster.clusterExemplars(emb, k = 8, iters = 2, m = 5).collect()
    out.groupBy(_.getAs[Long]("cid")).foreach { case (cid, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rn"))
      assert(sorted.length <= 5, s"cid $cid")
      assert(sorted.map(_.getAs[Long]("rn")).toSeq === (1L to sorted.length).toSeq)
      val ds = sorted.map(_.getAs[Long]("qdist")).toSeq
      assert(ds === ds.sorted, s"cid $cid distances not ascending")
    }
  }

  test("assignment is map-only: final plan has no sort-merge join, broadcasts the centroid-sum table") {
    val plan = Cluster.kmeansFixedPoint(emb, k = 8, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
