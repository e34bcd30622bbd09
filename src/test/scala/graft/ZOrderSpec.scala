package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  private def ref(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (k <- 0 until bits) {
      z |= ((x >> k) & 1L) << (2 * k)
      z |= ((y >> k) & 1L) << (2 * k + 1)
    }
    z
  }

  test("interleave2 column expression matches the reference bit-interleave") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y) => ref(x, y, 10) })
    // corner values
    assert(ref(0, 0, 10) === 0L)
    assert(ref(1023, 1023, 10) === (1L << 20) - 1)
  }

  test("z-sorted blocks bound both dimensions; linear sort only bounds its leading column") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4096)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    def meanBlockSpan(sorted: Seq[(Long, Long)]): Double = {
      val blocks = sorted.grouped(64).toSeq
      blocks.map { b =>
        val (xs, ys) = (b.map(_._1), b.map(_._2))
        (xs.max - xs.min + ys.max - ys.min).toDouble
      }.sum / blocks.size
    }
    val zSpan = meanBlockSpan(pts.sortBy { case (x, y) => ref(x, y, 10) })
    val xSpan = meanBlockSpan(pts.sortBy(_._1))
    // a row-group's min/max cover (x-range + y-range): under linear sort
    // the non-leading dimension stays ~full-domain (~1023), under z-order
    // both stay block-local
    assert(zSpan < xSpan * 0.5, s"z-order span $zSpan vs linear span $xSpan")
  }
}
