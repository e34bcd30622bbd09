package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Literal matrix × vector column as ONE native codegen loop — the dense
  * projection kernel (Johnson–Lindenstrauss random projection, PCA
  * component projection, any fixed linear map of an embedding column).
  *
  * The column formulation (`array(dot(v, row0), dot(v, row1), …)`) builds
  * an expression tree linear in `nRows` and falls off the whole-stage
  * codegen path as the map widens — the same failure
  * [[NearestCell]] fixed for argmin. Here the matrix lives in one flat
  * `double[]` reference; evaluation touches each weight exactly once and
  * each output component is a left-to-right sum, matching DuckDB's
  * `list_inner_product(v, [row literals])` bit-for-bit.
  *
  * `matFlat` layout: output row r occupies `[r·dim, (r+1)·dim)`. Input
  * shorter than `dim` is treated as zero-padded (the loop stops at the
  * vector's end).
  */
case class MatVec(child: Expression, matFlat: Array[Double],
                  nRows: Int, dim: Int) extends UnaryExpression {
  require(nRows >= 1 && dim >= 1 && matFlat.length == nRows * dim,
    "matFlat length must be nRows*dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ne = math.min(v.numElements(), dim)
    val out = new Array[Double](nRows)
    var r = 0
    while (r < nRows) {
      var s = 0.0
      var i = 0
      while (i < ne) { s += v.getDouble(i) * matFlat(r * dim + i); i += 1 }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matFlat", matFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ne = ctx.freshName("ne")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $ne = java.lang.Math.min($v.numElements(), $dim);
         |double[] $out = new double[$nRows];
         |for (int $r = 0; $r < $nRows; $r++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $ne; $i++) {
         |    $s += $v.getDouble($i) * $matRef[$r * $dim + $i];
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

object MatVec {
  val FunctionName = "graft_matvec"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 4 && exprs.tail.forall(_.foldable),
        s"$FunctionName(v, mat_flat, n_rows, dim): trailing args must be literals")
      MatVec(exprs.head,
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue())
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column builder: `rows` × `v` as an array<double> of length |rows|. */
  def of(v: Column, rows: Array[Array[Double]]): Column = {
    val dim = rows.head.length
    require(rows.forall(_.length == dim), "ragged projection matrix")
    register(SparkSession.active)
    call_function(FunctionName, v, typedlit(rows.flatten),
      lit(rows.length), lit(dim))
  }
}
