package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.RubyStrftime
import graft.sources.{KeysetScan, Serialize}

/** Structured Streaming keyset-tail source (`format("keyset-tail")`):
  * the reference's poll loop (`in_sql.rb:129-135, 255-278`) as a DSv2
  * `MicroBatchStream`.
  *
  *   - Offset = the SERIALIZED update-column value of the last emitted row
  *     (mirrors the YAML state file, `in_sql.rb:269-271, 280-307`; timestamps
  *     round-trip through their formatted string, `in_sql.rb:131, 141`).
  *   - Each micro-batch is one keyset page: `upd > last ORDER BY upd LIMIT n`
  *     with `maxRowsPerBatch` ≙ `select_limit` and the trigger interval ≙
  *     `select_interval`.
  *   - Offsets commit to the checkpoint log AFTER the batch is processed —
  *     the same at-least-once contract as the reference.
  *
  * Pages are materialized on the driver (bounded by `maxRowsPerBatch`,
  * exactly like the reference's one-page-per-poll loop — the source is a
  * low-rate tail; scale comes from many tables, not page size), then shipped
  * to executors as `ceil(page / maxRowsPerPartition)` value-contiguous
  * InputPartitions so per-batch processing fans out across cores instead of
  * running in one task (the scan itself is already a distributed job).
  *
  * Options: `path` (parquet table), `updateColumn`, `maxRowsPerBatch`
  * (default 500), `timeFormat` (Ruby strftime, reference default),
  * `maxRowsPerPartition` (default 250).
  */
class KeysetTailProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "keyset-tail"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SparkSession.active.read.parquet(options.get("path")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KeysetTailTable(schema, properties.asScala.toMap)
}

final class KeysetTailTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  private val ci: Map[String, String] = props.map { case (k, v) => k.toLowerCase -> v }
  override def name(): String = s"keyset-tail(${ci.getOrElse("path", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new KeysetMicroBatchStream(schema,
          ci("path"),
          ci.getOrElse("updatecolumn", sys.error("keyset-tail requires updateColumn")),
          ci.getOrElse("maxrowsperbatch", "500").toInt,
          ci.getOrElse("timeformat", RubyStrftime.DefaultRubyFormat),
          ci.getOrElse("maxrowsperpartition", "250").toInt)
    }
}

/** Offset = serialized last update-column value (None before the first row). */
final case class KeysetOffset(last: Option[String]) extends Offset {
  override def json(): String = last match {
    case Some(v) => "{\"last\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}"
    case None    => "{\"last\":null}"
  }
}
object KeysetOffset {
  def fromJson(s: String): KeysetOffset = {
    val m = "\"last\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(s)
    KeysetOffset(m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")))
  }
}

final class KeysetMicroBatchStream(schema: StructType, path: String,
    updateColumn: String, maxRowsPerBatch: Int, rubyTimeFormat: String,
    maxRowsPerPartition: Int = 250)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active
  private def table: DataFrame = spark.read.schema(schema).parquet(path)

  override def initialOffset(): Offset = KeysetOffset(None)
  override def deserializeOffset(json: String): Offset = KeysetOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // checkpoint log is the state store

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxRowsPerBatch)

  /** One poll from the engine-provided committed offset: the serialized
    * boundary of the next page. Stateless — restart-safe by construction
    * (the checkpoint log's offset IS the resume point, like the reference's
    * state file). Unchanged offset → empty poll cycle. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KeysetOffset]
    val page = pageAfter(s.last)
    serializedBoundary(page).map(b => KeysetOffset(Some(b))).getOrElse(s)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("uses latestOffset(start, limit)")

  private def pageAfter(last: Option[String]): Array[Row] =
    KeysetScan.scan(table, updateColumn, last, maxRowsPerBatch,
      rubyTimeFormat = rubyTimeFormat).collect()

  private def serializedBoundary(rows: Array[Row]): Option[String] =
    rows.lastOption.flatMap(r =>
      Serialize.rowToStringMap(schema, r, rubyTimeFormat).get(updateColumn))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KeysetOffset]
    val e = end.asInstanceOf[KeysetOffset]
    if (s == e || e.last.isEmpty) return Array.empty
    val upper = KeysetScan.lowerBound(table, updateColumn, e.last.get, rubyTimeFormat)
    // page = (start, end]: strict > start (keyset resume), <= end boundary
    val page = KeysetScan.scan(table, updateColumn, s.last, limit = 0,
        rubyTimeFormat = rubyTimeFormat)
      .filter(!upper) // NOT(upd > endBoundary)  ⇒  upd <= endBoundary
      .collect()
    // The page's parquet scan + filter already ran distributed (it is a
    // Spark job); what used to be serial was DOWNSTREAM processing: one
    // InputPartition meant every per-batch transform ran in ONE task. The
    // page comes back sorted by the update column, so contiguous slices
    // ARE value-range partitions — splitting at maxRowsPerPartition
    // (default 250 = half the reference's 500-row page) fans the batch out
    // across executor cores while keeping offset semantics byte-identical
    // (the offset is still the last row's serialized boundary, and a
    // tie-heavy value-delimited page now also fans out instead of landing
    // on one task). Driver transit stays bounded by maxRowsPerBatch plus
    // end-boundary ties, faithful to the reference's one-page poll.
    if (page.isEmpty) Array.empty
    else page.grouped(math.max(1, maxRowsPerPartition))
      .map(KeysetPartition(_)).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new KeysetReaderFactory(schema)

  override def stop(): Unit = ()
}

final case class KeysetPartition(rows: Array[Row]) extends InputPartition

/** External Row → InternalRow via the schema's row encoder — covers every
  * Catalyst type (Date, Decimal, Binary, arrays, nested structs), not just
  * the Timestamp/String pair a hand-rolled converter would. */
final class KeysetReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[KeysetPartition].rows
    new PartitionReader[InternalRow] {
      private val toInternal = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)).createSerializer()
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = toInternal(rows(i)).copy()
      override def close(): Unit = ()
    }
  }
}
