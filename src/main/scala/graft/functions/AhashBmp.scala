package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 8×8 average-hash of a BMP payload:
  * `graft_ahash(content: binary) → array<long>` (the four 16-bit chunks of
  * [[graft.ops.Multimodal.ahashBits]], or NULL when the image has no full
  * 8×8 block grid).
  *
  * The `mapPartitions` codec path ([[graft.ops.Multimodal.ahashBmpAssets]])
  * is the batch-decode shape for external codec libraries; THIS expression
  * is the composable form — it stays inside whole-stage codegen (the decode
  * + hash is one static JVM call per row, no Dataset boundary, no encoder
  * round-trip), filters/projections around it keep fusing, and the hash is
  * callable from pure SQL (`SELECT graft_ahash(content) FROM assets`).
  * Spec-proven equal to the mapPartitions path on the fixture corpus.
  *
  * Decode errors (malformed container) THROW, matching the batch path —
  * corrupt binaries are a data-contract violation surfaced loudly, not a
  * silent null (dead-lettering belongs to the source tier, which validates
  * before handing payloads to analytics).
  */
case class AhashBmp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    AhashBmp.hashOrNull(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.AhashBmp.hashOrNull($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhashBmp {
  val FunctionName = "graft_ahash"

  /** Static entry point shared by interpreted eval and generated code. */
  def hashOrNull(bytes: Array[Byte]): GenericArrayData = {
    val (w, h, px) = graft.ops.Multimodal.decodeBmp24(bytes)
    graft.ops.Multimodal.ahashBits(w, h, px) match {
      case Some(cs) => new GenericArrayData(cs)
      case None => null
    }
  }

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, s"$FunctionName(content): expects 1 argument, got ${exprs.length}")
      AhashBmp(exprs.head)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def ahash(content: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, content)
  }
}
