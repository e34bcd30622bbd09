package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-histogram sketch for LOSSLESS set-overlap upper bounds in
  * similarity-join candidate pruning (the "count filter" family).
  *
  * [[HashRangeHist]] buckets a doc's 64-bit shingle hashes into 128 ranges
  * by their top 7 bits and stores each range's count as a SATURATING 4-bit
  * nibble packed into 8 longs (64 bytes per doc — vs ~500 bytes for the
  * full hash array). [[HistMinSum]] then computes
  * `Σ_r min(cnt_a[r], cnt_b[r])`, which upper-bounds `|A ∩ B|`: every
  * common element adds 1 to the SAME range on both sides. Saturation keeps
  * the bound sound: a nibble value 15 means "15 or more", so when both
  * sides saturate a range its contribution is replaced by a huge constant
  * (never under-counts → never a false prune).
  *
  * Use: ride `HistMinSum(ct_a, ct_b) * (q+p) >= p*(n_a+n_b) - (q+p)` as a
  * residual on the PPJoin candidate join — junk pairs (the 9.8M-for-3k
  * candidate explosion at the 10x stretch fixture) die before the distinct
  * and before the full-array verify joins. The `(q+p)` slack absolves the
  * 6-dp rounding admission at the Jaccard threshold boundary, so the
  * pruning is lossless for the declared `round(j,6) >= t` filter semantics.
  *
  * Resolution note: the bound is discriminative while sets are ≲ the range
  * count (128); much larger sets saturate toward "no prune", which is safe
  * (they just fall through to exact verification).
  *
  * HashRangeHist runs once per DOC (interpreted eval is fine → CodegenFallback);
  * HistMinSum runs once per candidate JOIN ROW and is fully codegen'd.
  */
case class HashRangeHist(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val out = new Array[Long](8)
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      val r = ((xs.getLong(i) >>> 57) & 127L).toInt // range 0..127
      val w = r >> 4          // which long
      val s = (r & 15) << 2   // nibble shift
      val cur = (out(w) >>> s) & 15L
      if (cur < 15L) out(w) = (out(w) & ~(15L << s)) | ((cur + 1L) << s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashRangeHist {
  val FunctionName = "graft_range_hist"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1,
        s"$FunctionName(hs): expects 1 argument, got ${exprs.length}")
      HashRangeHist(exprs.head)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def hist(hs: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, hs)
  }
}

/** `Σ_r min(cnt_a[r], cnt_b[r])` over two [[HashRangeHist]] sketches — a
  * lossless upper bound on the distinct-set overlap (see there). Both-
  * saturated ranges contribute 2^50 ("unknown, possibly large"): large
  * enough that no real per-range overlap can exceed it, small enough that
  * 128 of them (≤ 2^57) can never overflow the Long sum. */
case class HistMinSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private val BothSaturated = HistMinSum.BothSaturated

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var w = 0
    var sum = 0L
    while (w < 8) {
      var xa = x.getLong(w); var yb = y.getLong(w)
      var k = 0
      while (k < 16) {
        val ca = xa & 15L; val cb = yb & 15L
        sum += (if (ca == 15L && cb == 15L) BothSaturated else math.min(ca, cb))
        xa >>>= 4; yb >>>= 4
        k += 1
      }
      w += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val w = ctx.freshName("w"); val k = ctx.freshName("k")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      val sum = ctx.freshName("sum")
      s"""
         |long $sum = 0L;
         |for (int $w = 0; $w < 8; $w++) {
         |  long $xa = $a.getLong($w); long $yb = $b.getLong($w);
         |  for (int $k = 0; $k < 16; $k++) {
         |    long $ca = $xa & 15L; long $cb = $yb & 15L;
         |    $sum += ($ca == 15L && $cb == 15L) ? ${HistMinSum.BothSaturated}L : java.lang.Math.min($ca, $cb);
         |    $xa >>>= 4; $yb >>>= 4;
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HistMinSum {
  /** Contribution of a both-saturated range. Must dominate any true
    * per-range overlap (so the bound never under-counts) while keeping
    * 128 × BothSaturated overflow-free in a Long. */
  val BothSaturated: Long = 1L << 50

  val FunctionName = "graft_hist_min_sum"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2,
        s"$FunctionName(ct_a, ct_b): expects 2 arguments, got ${exprs.length}")
      HistMinSum(exprs.head, exprs(1))
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def minSum(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, a, b)
  }
}
