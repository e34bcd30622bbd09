package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Bounded per-group top-k as a NATIVE aggregate: keep the `k` smallest
  * `(ord, id)` pairs per group, emitted as a sorted `array<struct<ord, id>>`.
  *
  * Spark has no partial top-k-per-group: the idiomatic
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` must shuffle and
  * SORT every input row of every group before discarding all but k — at
  * corpus scale that is a full-data exchange for a k·|groups|-row answer
  * (and for few/skewed groups, a skew cliff; see the salted two-phase
  * workaround in `Cluster.clusterExemplars`). This aggregate is the
  * operator Spark is missing: partial aggregation bounds state at k pairs
  * per group per mapper, the exchange carries at most k pairs per group
  * per partition, and no sort of the input ever happens — the same
  * asymmetry `TakeOrderedAndProject` exploits for global ORDER BY+LIMIT,
  * applied per group.
  *
  * Determinism: the order is the total lexicographic order on
  * `(ord, id)` — callers pass a unique id (tie-break), so the result set
  * is partitioning-invariant (spec-asserted). Descending ranks are ord
  * negation at the call site. Buffers compact lazily (sort+truncate at
  * 4k entries) so update cost is amortized O(1) per row.
  */
case class TopKPairs(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with BinaryLike[Expression] {

  require(k >= 1, "top-k bound must be >= 1")

  override def left: Expression = ordExpr
  override def right: Expression = idExpr
  override def dataType: DataType = ArrayType(
    new StructType().add("ord", LongType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = TopKPairs.FunctionName

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  /** Sort the flattened pair pool by (ord, id) and keep the smallest k. */
  private def compact(buf: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    if (buf.length <= 2 * k) return buf
    val pairs = Array.ofDim[(Long, Long)](buf.length / 2)
    var i = 0
    while (i < pairs.length) { pairs(i) = (buf(2 * i), buf(2 * i + 1)); i += 1 }
    java.util.Arrays.sort(pairs, Ordering.Tuple2[Long, Long])
    buf.clear()
    var j = 0
    while (j < k && j < pairs.length) { buf += pairs(j)._1 += pairs(j)._2; j += 1 }
    buf
  }

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val o = ordExpr.eval(input)
    val d = idExpr.eval(input)
    if (o != null && d != null) {
      buf += o.asInstanceOf[Long] += d.asInstanceOf[Long]
      if (buf.length > 8 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    buf ++= other
    if (buf.length > 8 * k) compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val pairs = Array.ofDim[(Long, Long)](buf.length / 2)
    var i = 0
    while (i < pairs.length) { pairs(i) = (buf(2 * i), buf(2 * i + 1)); i += 1 }
    java.util.Arrays.sort(pairs, Ordering.Tuple2[Long, Long])
    val n = math.min(k, pairs.length)
    val rows = Array.tabulate[Any](n) { j =>
      new GenericInternalRow(Array[Any](pairs(j)._1, pairs(j)._2))
    }
    new GenericArrayData(rows)
  }

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](ArrayType(LongType, containsNull = false)))

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(compact(buf).toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    ArrayBuffer.from(row.getArray(0).toLongArray())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKPairs =
    copy(ordExpr = newLeft, idExpr = newRight)
}

object TopKPairs {
  val FunctionName = "graft_topk"

  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 3 && exprs(2).foldable,
        s"$FunctionName(ord, id, k): k must be a literal")
      TopKPairs(exprs.head, exprs(1), exprs(2).eval().asInstanceOf[Number].intValue())
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** The k smallest `(ord, id)` pairs per group, sorted; negate `ord` for
    * descending ranks. Both inputs must be LONG. */
  def topK(ord: Column, id: Column, k: Int): Column = {
    register(SparkSession.active)
    call_function(FunctionName, ord, id, lit(k))
  }
}
