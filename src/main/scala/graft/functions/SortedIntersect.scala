package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact distinct-intersection count of two SORTED `array<bigint>` columns
  * as a primitive merge scan.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side, probes the
  * other, materializes the common elements as a NEW array, then takes its
  * size — per-row allocation plus hashed probes. For similarity-join
  * verification the intersect runs once per CANDIDATE pair (9.8M pairs for
  * 3k true matches at the 10x stretch fixture — see BASELINE.md round 9),
  * so the constant factor IS the verify stage. A two-pointer merge over
  * pre-sorted arrays is branch-cheap, allocation-free, and stays inside
  * whole-stage codegen.
  *
  * Semantics match `size(array_intersect(a, b))` exactly: equal runs are
  * skipped so duplicate elements count once (array_intersect returns
  * distinct elements). Inputs MUST be sorted ascending (the cached
  * `sort_array` shingle arrays); unsorted input silently undercounts.
  * Null array → null; null ELEMENTS are not supported (xxhash64 output is
  * never null).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1
        // skip equal runs on both sides: distinct-count semantics
        val v = xv
        while (i < nx && x.getLong(i) == v) i += 1
        while (j < ny && y.getLong(j) == v) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++;
         |    while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $ny && $b.getLong($j) == $xv) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  val FunctionName = "graft_sorted_inter"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2,
        s"$FunctionName(a, b): expects 2 arguments, got ${exprs.length}")
      SortedIntersectCount(exprs.head, exprs(1))
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def count(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, a, b)
  }
}
