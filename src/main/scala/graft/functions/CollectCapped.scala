package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group buffer bound.
  *
  * The bucket-then-pair dedup tiers group ids per (band, bucket) key and
  * drop buckets larger than a cap — but `collect_list` + `filter(size(..)
  * <= cap)` only bounds the DOWNSTREAM fan-out: the aggregation buffer
  * itself still materializes every element of a mega-bucket before the
  * filter discards it. On a duplicate-heavy corpus (exactly the workload
  * dedup targets) one hot bucket key means one task holding an m-element
  * array for m in the millions.
  *
  * This aggregate stops accumulating at `cap` elements — `update` and
  * `merge` both truncate — so memory per group is O(cap) regardless of the
  * group's true size. Callers that drop over-full buckets pass `cap + 1`
  * and filter `size(ids) <= cap`: a retained (cap+1)-element buffer is the
  * over-full marker, and truncation can only affect buckets the filter
  * discards anyway, so results are bit-identical to the unbounded
  * formulation (asserted in DedupSpec).
  *
  * Partial aggregation applies as usual (map-side combine ships at most
  * `cap` elements per group per mapper). Which elements survive truncation
  * is arrival-order-dependent, like `collect_list` order itself — callers
  * must be insensitive to element choice above the cap.
  *
  * Serialization mirrors the pattern of Spark's own `Collect` aggregate
  * (UnsafeProjection of a single-array row).
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, "collect cap must be >= 1")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = CollectCapped.FunctionName

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    if (buffer.length < cap) {
      val v = child.eval(input)
      if (v != null) buffer += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val room = cap - buffer.length
    if (room >= other.length) buffer ++= other
    else if (room > 0) buffer ++= other.take(room)
    buffer
  }

  override def eval(buffer: ArrayBuffer[Any]): Any = new GenericArrayData(buffer.toArray)

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: ArrayBuffer[Any]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buffer.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val buf = ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buf += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

object CollectCapped {
  val FunctionName = "graft_collect_capped"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 2 && exprs(1).foldable,
        s"$FunctionName(col, cap): cap must be a literal")
      CollectCapped(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())
    }

  /** Idempotent per-session registration (the analyzer wraps the returned
    * AggregateFunction in an AggregateExpression automatically). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Collect at most `cap` values of `c` per group (nulls skipped). */
  def collectCapped(c: Column, cap: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, c, lit(cap))
  }
}
