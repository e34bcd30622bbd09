package graft

import org.apache.spark.sql.functions._

import graft.ops.Pca
import graft.sources.Tables

class PcaSpec extends SparkSpecBase {
  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("covariance diagonal is non-negative and the direction is non-null") {
    val out = Pca.pcaPowerFixedPoint(emb, dim = 64, iters = 2).collect()
    assert(out.length === 64)
    assert(out.forall(_.getAs[Long]("var_diag") >= 0L))
    assert(out.exists(r => math.abs(r.getAs[Long]("w")) > 0L))
    // renorm bounds every component near the 1000 fixed-point unit
    assert(out.forall(r => math.abs(r.getAs[Long]("w")) <= 2000L))
  }

  test("pca result is partitioning-invariant (mergeable integer buffers)") {
    val a = Pca.pcaPowerFixedPoint(emb, dim = 64, iters = 2).collect().map(_.toString).toSeq
    val b = Pca.pcaPowerFixedPoint(emb.repartition(13), dim = 64, iters = 2)
      .collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("integer covariance matches a brute-force computation on a tiny corpus") {
    import spark.implicits._
    // 3 planted vectors, dim 3, padded into the embedding column shape
    val vecs = Seq(
      Seq(0.1f, -0.2f, 0.3f),
      Seq(0.4f, 0.0f, -0.1f),
      Seq(-0.3f, 0.2f, 0.5f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val out = Pca.pcaPowerFixedPoint(df, dim = 3, iters = 1).collect()

    // brute force with the identical integer rules
    val q = vecs.map(_.map(x => math.round((x.toDouble + 1.0) * 100000.0)))
    val n = q.length.toLong
    val s = (0 until 3).map(i => q.map(_(i)).sum)
    val m = s.map(_ / n)
    def cov(i: Int, j: Int): Long = q.map(v => (v(i) - m(i)) * (v(j) - m(j))).sum
    (0 until 3).foreach { p =>
      assert(out(p).getAs[Long]("var_diag") === cov(p, p), s"dim $p")
    }
  }

  test("GramAgg plans map-side partial aggregation (one buffer per partition)") {
    import org.apache.spark.sql.functions.udaf
    val q = emb.select(graft.ops.Cluster.quantizeShift(col("embedding"), 1e5).as("q"))
      .select(udaf(new Pca.GramAgg(64)).apply(col("q")).as("g"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.contains("partial_"), s"expected a partial aggregation stage in:\n$plan")
    assert(!plan.contains("Join"), s"gram pass must be join-free:\n$plan")
  }
}
