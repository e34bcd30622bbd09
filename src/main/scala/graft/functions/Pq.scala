package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jegou, Douze, Schmid 2011) as native
  * codegen expressions.
  *
  * The column-expression formulation (`least` over numCodes literal-array
  * struct candidates per subspace, an `array(...)` of numSub*numCodes
  * literal dot products for the LUT) works at K=16 but is a janino monster
  * at the classic K=256 — the generated projection grows with M*K*subDim
  * and compile time dominates the query (measured 116 s at sf0.01).
  * Here the codebook lives in ONE flat `double[]` reference and codegen is
  * a three-level primitive loop: compile is instant and independent of K,
  * and evaluation touches each (codeword, dim) weight exactly once.
  *
  * `booksFlat` layout: codeword (m, k) occupies
  * `[(m*numCodes + k)*subDim, (m*numCodes + k + 1)*subDim)`.
  * Squared codeword norms are precomputed at construction with the same
  * left-to-right summation order the DuckDB oracle's Scala-generated `cc`
  * literals use.
  *
  * FP order parity (both engines): encode ranks on `cc - 2*<sub,c>`
  * (ties → smaller k); LUT entry (m,k) is `(<sub,sub> - 2*<sub,c>) + cc`,
  * all inner products summed left-to-right like [[DotProduct]] /
  * `list_inner_product`.
  */
private[functions] abstract class PqKernel extends UnaryExpression {
  def booksFlat: Array[Double]
  def numSub: Int
  def numCodes: Int
  def subDim: Int

  // abstract members are UNINITIALIZED while this superclass body runs
  // (both at construction and Java deserialization) — validation and the
  // norm table must be lazy, never constructor-time
  protected def validate(): Unit =
    require(numSub >= 1 && numCodes >= 1 && subDim >= 1 &&
      booksFlat.length == numSub * numCodes * subDim,
      "booksFlat length must be numSub*numCodes*subDim")

  protected lazy val ccs: Array[Double] = Array.tabulate(numSub * numCodes) { j =>
    var s = 0.0
    var i = 0
    while (i < subDim) { s += booksFlat(j * subDim + i) * booksFlat(j * subDim + i); i += 1 }
    s
  }
}

/** PQ encode: per-subspace argmin codeword id, `array<int>` of numSub. */
case class PqEncode(child: Expression, booksFlat: Array[Double],
                    numSub: Int, numCodes: Int, subDim: Int) extends PqKernel {
  validate()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ne = v.numElements()
    val out = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < numCodes) {
        val j = m * numCodes + k
        val off = j * subDim
        var s = 0.0
        var i = 0
        while (i < subDim && m * subDim + i < ne) {
          s += v.getDouble(m * subDim + i) * booksFlat(off + i); i += 1
        }
        val d = ccs(j) - 2.0 * s
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(m) = best
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("booksFlat", booksFlat, "double[]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ne = ctx.freshName("ne")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $ne = $v.numElements();
         |int[] $out = new int[$numSub];
         |for (int $m = 0; $m < $numSub; $m++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $k = 0; $k < $numCodes; $k++) {
         |    int $j = $m * $numCodes + $k;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $subDim && $m * $subDim + $i < $ne; $i++) {
         |      $s += $v.getDouble($m * $subDim + $i) * $booksRef[$j * $subDim + $i];
         |    }
         |    double $d = $ccsRef[$j] - 2.0 * $s;
         |    if ($d < $bestD) { $bestD = $d; $best = $k; }
         |  }
         |  $out[$m] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `array<double>` of numSub*numCodes exact
  * subspace distances (entry m*numCodes+k = ||q_m - c_{m,k}||^2). */
case class PqLut(child: Expression, booksFlat: Array[Double],
                 numSub: Int, numCodes: Int, subDim: Int) extends PqKernel {
  validate()

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ne = v.numElements()
    val out = new Array[Double](numSub * numCodes)
    var m = 0
    while (m < numSub) {
      var qq = 0.0
      var i = 0
      while (i < subDim && m * subDim + i < ne) {
        qq += v.getDouble(m * subDim + i) * v.getDouble(m * subDim + i); i += 1
      }
      var k = 0
      while (k < numCodes) {
        val j = m * numCodes + k
        val off = j * subDim
        var s = 0.0
        i = 0
        while (i < subDim && m * subDim + i < ne) {
          s += v.getDouble(m * subDim + i) * booksFlat(off + i); i += 1
        }
        out(j) = (qq - 2.0 * s) + ccs(j)
        k += 1
      }
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("booksFlat", booksFlat, "double[]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ne = ctx.freshName("ne")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val qq = ctx.freshName("qq")
      s"""
         |int $ne = $v.numElements();
         |double[] $out = new double[${numSub * numCodes}];
         |for (int $m = 0; $m < $numSub; $m++) {
         |  double $qq = 0.0;
         |  for (int $i = 0; $i < $subDim && $m * $subDim + $i < $ne; $i++) {
         |    $qq += $v.getDouble($m * $subDim + $i) * $v.getDouble($m * $subDim + $i);
         |  }
         |  for (int $k = 0; $k < $numCodes; $k++) {
         |    int $j = $m * $numCodes + $k;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $subDim && $m * $subDim + $i < $ne; $i++) {
         |      $s += $v.getDouble($m * $subDim + $i) * $booksRef[$j * $subDim + $i];
         |    }
         |    $out[$j] = ($qq - 2.0 * $s) + $ccsRef[$j];
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Pq {
  val EncodeName = "graft_pq_encode"
  val LutName = "graft_pq_lut"

  private def args(exprs: Seq[Expression], name: String): (Array[Double], Int, Int, Int) = {
    require(exprs.length == 5 && exprs.tail.forall(_.foldable),
      s"$name(v, books_flat, num_sub, num_codes, sub_dim): trailing args must be literals")
    (exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray(),
      exprs(2).eval().asInstanceOf[Number].intValue(),
      exprs(3).eval().asInstanceOf[Number].intValue(),
      exprs(4).eval().asInstanceOf[Number].intValue())
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      EncodeName, exprs => {
        val (b, m, k, d) = args(exprs, EncodeName)
        PqEncode(exprs.head, b, m, k, d)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      LutName, exprs => {
        val (b, m, k, d) = args(exprs, LutName)
        PqLut(exprs.head, b, m, k, d)
      }, "scala_udf")
  }

  def encode(v: Column, booksFlat: Array[Double], numSub: Int, numCodes: Int,
             subDim: Int): Column = {
    register(SparkSession.active)
    call_function(EncodeName, v, typedlit(booksFlat), lit(numSub), lit(numCodes), lit(subDim))
  }

  def lut(v: Column, booksFlat: Array[Double], numSub: Int, numCodes: Int,
          subDim: Int): Column = {
    register(SparkSession.active)
    call_function(LutName, v, typedlit(booksFlat), lit(numSub), lit(numCodes), lit(subDim))
  }
}
