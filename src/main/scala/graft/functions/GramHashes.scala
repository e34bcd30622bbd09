package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL character k-gram hashes of a document in one rolling pass —
  * `hashes(t, k)(i)` is a 64-bit hash of `t.substring(i, i + k)`, for
  * every i in [0, len − k].
  *
  * The column formulation (`explode(sequence(...))` + `substr` +
  * `xxhash64`) copies k characters and re-hashes them from scratch at
  * EVERY position — O(len·k) with allocation per gram. This expression is
  * the Rabin–Karp shape ([[WinnowFingerprints]]'s loop): O(len) wrapping
  * 64-bit polynomial rolling, finalized per position with a splitmix64
  * mix so the raw polynomial's structure (low characters only touch low
  * bits) never reaches the join/groupBy key space.
  *
  * Used by substring-level dedup, where only DUP VERDICTS reach the
  * output: the hash family is engine-internal (the DuckDB oracle uses
  * md5), so equality holds absent collisions (~n_grams²/2⁶⁴, the same
  * accepted bound as the xxhash64 formulation it replaces).
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(GramHashes.hashAll(input.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cls = GramHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = new ${classOf[GenericArrayData].getName}($cls.hashAll($s.toString(), $k));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {
  private final val Base = 0x100000001B3L // FNV-ish odd multiplier, wraps mod 2^64

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Rolling pass; also the test oracle shared by interpreted + codegen. */
  def hashAll(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty
    val out = new Array[Long](n - k + 1)
    // pow = Base^(k-1) mod 2^64 (wrapping)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + text.charAt(i); i += 1 }
    out(0) = mix(h)
    i = 0
    while (i < n - k) {
      h = (h - text.charAt(i) * pow) * Base + text.charAt(i + k)
      out(i + 1) = mix(h)
      i += 1
    }
    out
  }

  val FunctionName = "graft_gram_hashes"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2,
        s"$FunctionName(text, k): expects 2 arguments, got ${exprs.length}")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"$FunctionName: k must be an integer literal, got $other")
      }
      require(k > 0, s"$FunctionName: k must be positive, got $k")
      GramHashes(exprs.head, k)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def hashes(text: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, text, org.apache.spark.sql.functions.lit(k))
  }
}
