package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Sketch

/** HDR-histogram quantile sketch: the bucket expression vs its integer
  * definition, the first-octave exactness, and the 2^-m relative-error
  * contract of every quantile estimate against exact rank statistics. */
class HdrSketchSpec extends SparkSpecBase {

  private val M = 5

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  /** Scala twin of [[Sketch.hdrBucketLb]]: e = max(bitlen(v)-(m+1), 0). */
  private def lbRef(v: Long, m: Int): Long = {
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(v)
    val e = math.max(bitlen - (m + 1), 0)
    (v >> e) << e
  }

  test("bucket expression equals the bit-twiddled definition") {
    val vs = Seq(1L, 2L, 31L, 32L, 63L, 64L, 65L, 127L, 128L, 1000L,
      101370L, (1L << 40) + 12345L, Long.MaxValue / 3)
    val df = spark.createDataFrame(vs.map(Tuple1(_))).toDF("v")
    val got = df.select(Sketch.hdrBucketLb(col("v"), M).as("lb"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === vs.map(lbRef(_, M)))
  }

  test("first octave (v < 2^(m+1)) is stored exactly") {
    (1L until (1L << (M + 1))).foreach(v => assert(lbRef(v, M) == v))
  }

  test("property: every quantile estimate is a lower bound within 2^-m relative error") {
    val values = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 1L << 50)))
    val q = Gen.oneOf((1, 2), (9, 10), (99, 100), (1, 100), (1, 1))
    check(Prop.forAll(values, q) { (vs: List[Long], qq: (Int, Int)) =>
      val (qn, qd) = qq
      val n = vs.size
      val rank = (n.toLong * qn + qd - 1) / qd
      val exact = vs.sorted.apply(math.max(rank.toInt - 1, 0))
      // sketch estimate: smallest lb whose cumulative bucket count >= rank
      val hist = vs.groupBy(lbRef(_, M)).view.mapValues(_.size).toSeq.sortBy(_._1)
      val est = hist.scanLeft((0L, 0L)) { case ((_, c), (lb, cnt)) => (lb, c + cnt) }
        .drop(1).collectFirst { case (lb, cum) if cum >= rank => lb }.get
      est <= exact && (exact - est) <= (exact >> M)
    })
  }
}
