package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The `functions.aggregate(zip_with(...))` formulation evaluates its lambda
  * per element through the interpreter — fine for one vector, hot-spot for
  * N×M candidate pairs in similarity search. This expression compiles to a
  * tight primitive loop inside whole-stage codegen (`doGenCode`), keeping
  * brute-force cosine scans CPU-bound instead of interpreter-bound.
  *
  * Summation is sequential left-to-right — the same order as the
  * higher-order-function fold and DuckDB's list_inner_product, so oracle
  * results are unchanged.
  *
  * Null handling: null input array → null result. Null elements are not
  * expected (embedding vectors); `getDouble` on a null element is undefined,
  * matching the built-in higher-order behavior.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val FunctionName = "graft_dot"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, s"$FunctionName(a, b): expects 2 arguments, got ${exprs.length}")
      DotProduct(exprs.head, exprs(1))
    }

  /** Idempotent per-session registration; exposes the expression through the
    * public `call_function` API (and to SQL as `graft_dot(a, b)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def dot(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, a, b)
  }
}
