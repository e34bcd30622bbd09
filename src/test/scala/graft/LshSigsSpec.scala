package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.sources.Tables

/** The one-pass native signature expression must reproduce the composed
  * per-plane formulation bit-for-bit (same planes, same dot order, same
  * sign convention) — it replaced that formulation in bandedSigs. */
class LshSigsSpec extends SparkSpecBase {

  test("native LshSigs equals the composed per-plane sign bits") {
    val emb = Tables.embeddings(spark, sf0001)
    val (rpb, nb, dim) = (3, 48, 64)
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val planesFlat = Array.tabulate(nb * rpb)(Similarity.planeVec(_, dim)).flatten
    val native = base.select(col("vec_id"),
      graft.functions.LshSigs.lshSigs(col("v"), planesFlat, rpb, dim).as("sig"))
    val bitCols = (0 until nb).map { b =>
      (0 until rpb).map { r =>
        val plane = typedLit(Similarity.planeVec(b * rpb + r, dim))
        when(graft.functions.DotProduct.dot(col("v"), plane) >= 0,
          shiftleft(lit(1), r)).otherwise(lit(0))
      }.reduce((a, c) => a.bitwiseOR(c))
    }
    val composed = base.select(col("vec_id"), array(bitCols: _*).as("sig"))
    val n = native.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val c = composed.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(n.length === c.length && n.length > 0)
    n.zip(c).foreach { case (a, b) => assert(a === b) }
  }

  test("LshSigs handles the empty vector (all-positive zero dots)") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[Double])).toDF("vec_id", "v")
    val planes = Array.tabulate(2 * 2)(Similarity.planeVec(_, 4)).flatten
    val out = df.select(graft.functions.LshSigs.lshSigs(col("v"), planes, 2, 4).as("sig"))
      .collect().head.getSeq[Int](0)
    // zero dot >= 0 => every bit set
    assert(out === Seq(3, 3))
  }
}
