package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid assignment as ONE native codegen loop — the coarse
  * quantizer under semDedup/cellEdges/IVF.
  *
  * The column-expression formulation (`least` over k literal (dist², cid)
  * struct candidates, one [[DotProduct]] per centroid) is correct but
  * collapses outside whole-stage codegen as k grows: at the sf1x probe's
  * k = 71 the assignment pass alone measured 8.8 s for 20k rows×64 dims
  * (~91 M flops — interpreted-speed, dominated by per-row struct churn),
  * and it runs TWICE per pair query (both join sides re-derive the cell
  * table). Here the centroid matrix lives in one flat `double[]` reference
  * and codegen is a two-level primitive loop (the [[PqEncode]] idiom):
  * compile time is independent of k and evaluation is a dense flop loop.
  *
  * FP-order parity with the DuckDB oracle's ROW_NUMBER form is preserved
  * bit-for-bit: d = (vv − 2·s) + cc with vv, s, cc all summed
  * left-to-right, ranked by strict `<` so ties keep the SMALLEST cid —
  * exactly `ORDER BY (lip(v,v) − 2.0·lip(v,cv) + cc), cid`.
  *
  * `centersFlat` layout: centroid c occupies `[c·dim, (c+1)·dim)`.
  */
case class NearestCell(child: Expression, centersFlat: Array[Double],
                       numCells: Int, dim: Int) extends UnaryExpression {
  require(numCells >= 1 && dim >= 1 && centersFlat.length == numCells * dim,
    "centersFlat length must be numCells*dim")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_cell"

  // squared centroid norms, left-to-right like the oracle's cc literals
  private lazy val ccs: Array[Double] = Array.tabulate(numCells) { c =>
    var s = 0.0
    var i = 0
    while (i < dim) { s += centersFlat(c * dim + i) * centersFlat(c * dim + i); i += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ne = math.min(v.numElements(), dim)
    var vv = 0.0
    var i = 0
    while (i < ne) { val x = v.getDouble(i); vv += x * x; i += 1 }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < numCells) {
      var s = 0.0
      var j = 0
      while (j < ne) { s += v.getDouble(j) * centersFlat(c * dim + j); j += 1 }
      val d = (vv - 2.0 * s) + ccs(c)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("centersFlat", centersFlat, "double[]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val ne = ctx.freshName("ne")
      val vv = ctx.freshName("vv")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $ne = java.lang.Math.min($v.numElements(), $dim);
         |double $vv = 0.0;
         |for (int $i = 0; $i < $ne; $i++) {
         |  double $x = $v.getDouble($i); $vv += $x * $x;
         |}
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $numCells; $c++) {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $ne; $j++) {
         |    $s += $v.getDouble($j) * $centersRef[$c * $dim + $j];
         |  }
         |  double $d = ($vv - 2.0 * $s) + $ccsRef[$c];
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  val FunctionName = "graft_nearest_cell"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 4 && exprs.tail.forall(_.foldable),
        s"$FunctionName(v, centers_flat, num_cells, dim): trailing args must be literals")
      NearestCell(exprs.head,
        exprs(1).eval().asInstanceOf[ArrayData].toDoubleArray(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue())
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column builder: nearest centroid id of `v` against literal `centers`. */
  def of(v: Column, centers: Array[Array[Double]]): Column = {
    val dim = centers.head.length
    require(centers.forall(_.length == dim), "ragged centroid matrix")
    register(SparkSession.active)
    call_function(FunctionName, v, typedlit(centers.flatten),
      lit(centers.length), lit(dim))
  }
}
