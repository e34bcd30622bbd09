package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All random-hyperplane LSH band signatures of a vector in ONE pass:
  * band b's value is the `rowsPerBand` sign bits of planes
  * `b*rowsPerBand .. b*rowsPerBand+rowsPerBand-1` packed little-endian.
  *
  * The column-expression formulation (numBands × rowsPerBand separate
  * `graft_dot(v, plane_literal)` CASE branches OR-ed together) works, but at
  * 48×3 planes the generated projection is a janino monster — seconds of
  * compile time per query and a correspondingly huge interpreted fallback.
  * Here the planes live in ONE flat `double[]` reference and codegen is a
  * three-level primitive loop: compile is instant, evaluation touches each
  * (plane, dim) weight exactly once, and the whole signature stays inside
  * whole-stage codegen.
  *
  * Sign convention matches the composed formulation: bit r set iff
  * `dot(v, plane) >= 0`, dots summed left-to-right (same order as
  * [[DotProduct]] and DuckDB's `list_inner_product`).
  *
  * `planesFlat` layout: plane p occupies `[p*dim, (p+1)*dim)`;
  * `numBands = planesFlat.length / (rowsPerBand * dim)`.
  */
case class LshSigs(child: Expression, planesFlat: Array[Double],
                   rowsPerBand: Int, dim: Int) extends UnaryExpression {

  require(rowsPerBand >= 1 && rowsPerBand <= 30, "rowsPerBand out of range")
  require(dim >= 1 && planesFlat.length % (rowsPerBand * dim) == 0,
    "planesFlat length must be a multiple of rowsPerBand*dim")

  private val numBands = planesFlat.length / (rowsPerBand * dim)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Int](numBands)
    var b = 0
    while (b < numBands) {
      var bits = 0
      var r = 0
      while (r < rowsPerBand) {
        val off = (b * rowsPerBand + r) * dim
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * planesFlat(off + i); i += 1 }
        if (s >= 0) bits |= (1 << r)
        r += 1
      }
      out(b) = bits
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planesFlat", planesFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bits = ctx.freshName("bits")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $out = new int[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  int $bits = 0;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    int $off = ($b * $rowsPerBand + $r) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $v.getDouble($i) * $planesRef[$off + $i];
         |    }
         |    if ($s >= 0) $bits |= (1 << $r);
         |  }
         |  $out[$b] = $bits;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSigs {
  val FunctionName = "graft_lsh_sigs"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 4 && exprs.tail.forall(_.foldable),
        s"$FunctionName(v, planes_flat, rows_per_band, dim): trailing args must be literals")
      val planes = exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray()
      LshSigs(exprs.head,
        planes,
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue())
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Band signature array of `v` for `numBands × rowsPerBand` seeded
    * hyperplanes of dimension `dim` (planes from [[graft.ops.Similarity.planeVec]]). */
  def lshSigs(v: Column, planesFlat: Array[Double], rowsPerBand: Int, dim: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, v, typedlit(planesFlat), lit(rowsPerBand), lit(dim))
  }
}
