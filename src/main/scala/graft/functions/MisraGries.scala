package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a NATIVE
  * mergeable aggregate: at most `k` (term, count) counters, with the
  * deterministic guarantee that after ANY stream order and ANY merge tree
  * (Agarwal et al. 2012, "Mergeable Summaries"), every term's estimate
  * satisfies `exact − n/(k+1) ≤ est ≤ exact` — so every term with
  * frequency above n/(k+1) is PRESENT in the summary. The counter VALUES
  * depend on partitioning (only the bounds are invariant), which is why
  * the declared query reports exact counts plus guarantee booleans, the
  * same discipline as the other sketch tiers.
  *
  * vs count-min (`Sketch.countMin`): CM is a hash matrix that answers
  * point queries about any term but can only overcount; MG is a bounded
  * counter SET that can only undercount, carries the candidate terms
  * itself (no second pass to enumerate), and for the same heavy-hitter
  * threshold needs k counters instead of depth×width cells.
  *
  * Scale shape: partial aggregation bounds state at k counters per group
  * per mapper; the exchange carries ≤ k counters per partition — the
  * heavy-hitter analogue of the KMV/Bloom/HLL partial-agg sketches.
  *
  * update: hit → increment; miss with spare room → insert at 1; miss when
  * full → decrement ALL counters, dropping zeros (the arriving item's
  * implicit +1 cancels against the global −1).
  * merge: add counters pointwise; if over k survive, subtract the
  * (k+1)-th largest count from every counter and drop non-positives.
  */
case class MisraGries(
    termExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "summary size must be >= 1")

  override def child: Expression = termExpr
  override def dataType: DataType = ArrayType(
    new StructType().add("term", StringType, nullable = false)
      .add("est", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = MisraGries.FunctionName

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val t = termExpr.eval(input)
    if (t != null) {
      val s = t.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None if buf.size < k => buf(s) = 1L
        case None => // decrement-all; the new item cancels against it
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (t2, c) => if (c <= 0) dead += t2 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf(t) = buf.getOrElse(t, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - m)
      buf.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(termExpr = newChild)
}

object MisraGries {
  val FunctionName = "graft_mg"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        s"$FunctionName(term, k): k must be a literal")
      MisraGries(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** The ≤ k-counter Misra–Gries summary of a STRING column, as a
    * term-sorted `array<struct<term, est>>`. */
  def mg(term: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, term, lit(k))
  }
}
