package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable 4×16-bit SimHash of a shingle array in ONE native pass: for
  * each shingle, the 64 signature bits come from the first 8 bytes of its
  * md5 (two 32-bit halves — identical to `('0x'||substr(md5(s),1,8))` /
  * `substr(..,9,8)` in the oracle SQL); each bit votes ±1 and chunk c packs
  * the signs of bits c*16..c*16+15. Replaces the exploded-shingle
  * 64-sum-aggregate shuffle of the relational formulation with a per-row
  * loop (asserted bit-equal in DedupSpec). Returns [c0, c1, c2, c3]. */
case class Md5SimHashChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(Md5SimHashChunks.chunks(
      input.asInstanceOf[ArrayData].toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[UTF8String].toString)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = Md5SimHashChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.chunksFromArrayData($s));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SimHashChunks {
  def chunksFromArrayData(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val ss = new Array[String](n)
    var i = 0
    while (i < n) { ss(i) = arr.getUTF8String(i).toString; i += 1 }
    chunks(ss)
  }

  def chunks(shingles: Array[String]): Array[Long] = {
    val sums = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < shingles.length) {
      md.reset()
      val d = md.digest(shingles(i).getBytes("UTF-8"))
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var g = 0
      while (g < 64) {
        val h = if (g < 32) h1 else h2
        if (((h >>> (g % 32)) & 1L) == 1L) sums(g) += 1 else sums(g) -= 1
        g += 1
      }
      i += 1
    }
    Array.tabulate(4) { c =>
      var v = 0L
      var k = 0
      while (k < 16) {
        if (sums(c * 16 + k) > 0) v |= (1L << k)
        k += 1
      }
      v
    }
  }
}


object SimHash {
  val FunctionName = "graft_simhash_md5"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, exprs => Md5SimHashChunks(exprs.head), "scala_udf")

  /** [c0,c1,c2,c3] portable SimHash chunks of a shingle-array column. */
  def chunksMd5(shingles: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, shingles)
  }
}
