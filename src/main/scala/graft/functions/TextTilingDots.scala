package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-gap TextTiling block-cohesion dot products in ONE pass over the
  * document (Hearst 1997): tokenize (maximal `[a-z0-9]+` runs of the
  * lowercased text — exactly `TextOps.tokens`), group tokens into
  * `w`-token pseudo-sentences, and for every gap `g` (between segments
  * g−1 and g) emit the exact integer dot product of the term-count
  * vectors of the `k` segments on each side. Element `i` of the result is
  * the dot for gap `i+1`; a document with fewer than two segments yields
  * an empty array.
  *
  * Why native: the relational form explodes every term occurrence into
  * its ≤ 2k contributing gaps and shuffles the (doc, gap, term) rows —
  * nearly unique keys, so map-side combine buys nothing and the shuffle
  * carries ~2k× the corpus token count (measured 1060% at the 10× probe).
  * Here the whole cohesion computation is a scan-side projection with
  * O(tokens · k) work and O(tokens) transient memory per document; only
  * the tiny (doc, gap) rows reach the depth/cutoff windows.
  */
case class TextTilingDots(child: Expression, w: Int, k: Int)
    extends UnaryExpression {
  require(w >= 2, s"graft_texttiling_dots: bad segment size $w")
  require(k >= 1 && k <= 4, s"graft_texttiling_dots: bad block size $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_texttiling_dots"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextTilingDots.dots(input.asInstanceOf[UTF8String], w, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextTilingDots.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.dots($s, $w, $k));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TextTilingDots =
    copy(child = newChild)
}

object TextTilingDots {

  /** One pass: tokenize, bucket into w-token segments with per-segment
    * term-count maps, then dot adjacent k-blocks per gap. */
  def dots(text: UTF8String, w: Int, k: Int): Array[Long] = {
    val str = text.toLowerCase.toString
    val n = str.length
    val addFn = new java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] {
      def apply(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
        java.lang.Long.valueOf(a.longValue + b.longValue)
    }
    // per-segment term counts; segment of token t is t / w
    val segs = new java.util.ArrayList[java.util.HashMap[String, java.lang.Long]]()
    var tok = 0
    var i = 0
    var start = -1
    while (i <= n) {
      val word =
        i < n && {
          val c = str.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }
      if (word) { if (start < 0) start = i }
      else if (start >= 0) {
        val term = str.substring(start, i)
        val s = tok / w
        if (segs.size <= s) segs.add(new java.util.HashMap[String, java.lang.Long]())
        segs.get(s).merge(term, java.lang.Long.valueOf(1L), addFn)
        tok += 1
        start = -1
      }
      i += 1
    }
    val nseg = segs.size
    if (nseg < 2) return Array.emptyLongArray
    val out = new Array[Long](nseg - 1)
    var g = 1
    while (g < nseg) {
      // left block: segments [g-k, g-1]; right block: [g, g+k-1] (clipped)
      val left = new java.util.HashMap[String, java.lang.Long]()
      var p = math.max(0, g - k)
      while (p <= g - 1) {
        segs.get(p).forEach((t, c) => left.merge(t, c, addFn))
        p += 1
      }
      var dot = 0L
      var q = g
      val qEnd = math.min(nseg - 1, g + k - 1)
      while (q <= qEnd) {
        segs.get(q).forEach { (t, c) =>
          val l = left.get(t)
          if (l != null) dot += l.longValue * c.longValue
        }
        q += 1
      }
      out(g - 1) = dot
      g += 1
    }
    out
  }

  val FunctionName = "graft_texttiling_dots"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        s"$FunctionName(text, w, k): w and k must be literals")
      TextTilingDots(exprs.head,
        exprs(1).eval().toString.toInt, exprs(2).eval().toString.toInt)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  def of(text: Column, w: Int, k: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, text, lit(w), lit(k))
  }
}
