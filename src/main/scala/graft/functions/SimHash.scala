package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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
    new GenericArrayData(
      Md5SimHashChunks.chunksFromArrayData(input.asInstanceOf[ArrayData]))

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
  /** Empty input -> EMPTY output (never a colliding all-zero sentinel);
    * callers must still drop shingle-less docs to mirror the relational
    * groupBy's absent-group semantics. Single conversion path shared by
    * the interpreted and codegen routes; md5 input bytes come straight
    * from the UTF8String (no UTF-16 round trip). */
  def chunksFromArrayData(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.empty
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val d = Md5Bits.digest(arr.getUTF8String(i).getBytes)
      val h1 = Md5Bits.half(d, 0)
      val h2 = Md5Bits.half(d, 1)
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

/** Packed 64-bit xxhash64-family SimHash of a shingle array in ONE native
  * pass — the engine-hash twin of [[Md5SimHashChunks]]. Per shingle the 64
  * signature bits come from `xxhash64(s)` (seed 42, bit-identical to the
  * `functions.xxhash64` column it replaces — asserted in
  * XxKernelParitySpec); each bit votes ±1 and the result sets bit k iff
  * its vote sum is positive, exactly the relational
  * `sum(when(shiftright(h,k)&1===1,1).otherwise(-1)) > 0` formulation.
  * Replaces the exploded-shingle 64-sum-aggregate shuffle. Callers must
  * drop shingle-less docs (filter size > 0) to mirror the relational
  * groupBy's absent-group semantics — an empty array returns 0L, which
  * must never reach the banding join. */
case class XxSimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash.xxSim64FromArrayData(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = SimHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.xxSim64FromArrayData($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  val FunctionName = "graft_simhash_md5"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1, s"$FunctionName(shingles): expects 1 argument, got ${exprs.length}")
      Md5SimHashChunks(exprs.head)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** [c0,c1,c2,c3] portable SimHash chunks of a shingle-array column. */
  def chunksMd5(shingles: Column): Column = {
    register(SparkSession.active)
    call_function(FunctionName, shingles)
  }

  // --- xxhash64 family (engine-hash tier) -------------------------------

  /** See [[XxSimHash64]]; empty input → 0L (callers filter size > 0). */
  def xxSim64FromArrayData(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var v = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) > 0) v |= (1L << k)
      k += 1
    }
    v
  }

  val XxFunctionName = "graft_simhash_xx64"

  val xxBuilder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 1,
        s"$XxFunctionName(shingles): expects 1 argument, got ${exprs.length}")
      XxSimHash64(exprs.head)
    }

  /** Packed 64-bit xxhash64-family SimHash of a shingle-array column. */
  def sim64Xx(shingles: Column): Column = {
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(XxFunctionName, xxBuilder, "scala_udf")
    call_function(XxFunctionName, shingles)
  }
}
