package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): Rabin-Karp rolling hashes of all character k-grams,
  * then one representative hash per sliding window of `w` hashes (the
  * rightmost minimum), consecutive duplicates collapsed.
  *
  * Guarantees: any shared substring of length >= w + k - 1 between two
  * documents yields at least one shared fingerprint, making the selected
  * set a position-robust containment signature — unlike a whole-document
  * hash, which only catches exact duplicates.
  *
  * Native expression with `doGenCode` for the same reason as
  * [[DotProduct]]: the rolling loop runs per document over the full text —
  * interpreter dispatch per character would dominate at corpus scale.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WinnowFingerprints.winnow(input.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new ${classOf[GenericArrayData].getName}($cls.winnow($s.toString(), $k, $w));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  private final val Base = 257L
  private final val Mod = 0x7FFFFFFFL // 2^31-1 (Mersenne), keeps hashes positive

  /** Rolling-hash + winnow; also the test oracle (shared by interpreted and
    * codegen paths, so both are exercised against it). */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    // Rabin-Karp: h(i) = sum text(i+j) * Base^(k-1-j) mod Mod
    val hashes = new Array[Long](n - k + 1)
    var pow = 1L // Base^(k-1)
    var j = 1
    while (j < k) { pow = pow * Base % Mod; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + text.charAt(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i <= n - k) {
      h = ((h - text.charAt(i - 1) * pow % Mod + Mod * Base) % Mod * Base
        + text.charAt(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }
    if (hashes.length <= w) {
      var m = 0
      i = 1
      while (i < hashes.length) { if (hashes(i) <= hashes(m)) m = i; i += 1 }
      return Array(hashes(m))
    }
    // winnow: rightmost min of each w-window, collapse repeats
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    var lastIdx = -1
    var start = 0
    while (start <= hashes.length - w) {
      var m = start
      i = start + 1
      while (i < start + w) { if (hashes(i) <= hashes(m)) m = i; i += 1 }
      if (m != lastIdx) { out += hashes(m); lastIdx = m }
      start += 1
    }
    out.toArray
  }
}

object Winnow {
  val FunctionName = "graft_winnow"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName,
      exprs => WinnowFingerprints(exprs.head,
        k = exprs(1).eval().asInstanceOf[Int], w = exprs(2).eval().asInstanceOf[Int]),
      "scala_udf")

  /** Winnowed fingerprint set of a text column. */
  def fingerprints(text: Column, k: Int = 5, w: Int = 4): Column = {
    register(SparkSession.active)
    call_function(FunctionName, text,
      org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(w))
  }
}
