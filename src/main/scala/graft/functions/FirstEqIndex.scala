package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}

/** First index at which two `array<int>` columns hold the same value
  * (-1 when they disagree everywhere; comparison stops at the shorter
  * length).
  *
  * Purpose-built for banded-LSH candidate generation: a pair of vectors
  * sharing several band buckets would be emitted once per shared band by
  * the band equi-join, forcing a `distinct()` shuffle over the full
  * candidate volume. Filtering the join output to rows where the joined
  * band equals `firstEqIndex(sig_a, sig_b)` keeps exactly ONE row per
  * candidate pair — the duplicate suppression happens inside the join
  * stage, pipelined, and the candidate volume never hits an exchange.
  *
  * Codegen is a primitive loop with early exit (`doGenCode`), so the check
  * costs ~numBands int compares per joined row inside whole-stage codegen.
  */
case class FirstEqIndex(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getInt(i) == y.getInt(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getInt($i) == $b.getInt($i)) { ${ev.value} = $i; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FirstEqIndex {
  val FunctionName = "graft_first_eq"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2, s"$FunctionName(a, b): expects 2 arguments, got ${exprs.length}")
      FirstEqIndex(exprs.head, exprs(1))
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def firstEqIndex(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, a, b)
  }
}
