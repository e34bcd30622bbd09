package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter, GreaterThan, LessThanOrEqual}
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
  * NO page row ever materializes on the driver. The driver keeps only
  * BOUNDARY VALUES: `latestOffset` reduces the page to its max update value
  * (one row, one column), and `planInputPartitions` collects the page's
  * distinct-value (value, count) histogram — a partial-aggregable groupBy,
  * no global sort — and walks it to cut the page into ~`maxRowsPerPartition`
  * value sub-ranges. The keyset predicate composes per sub-range
  * — `upd > lo AND upd <= hi`, exactly the reference's query shape
  * (`in_sql.rb:129-135`) — and each `PartitionReader` runs its OWN scan of
  * that sub-range executor-side through Spark's parquet reader
  * (`ParquetFileFormat.buildReaderWithPartitionValues`, the same machinery
  * `FileSourceScanExec` ships to tasks: vectorized read, row-group pruning
  * from the pushed range filter, full Catalyst type fidelity). A tie-heavy
  * boundary page with `limit <= 0` therefore streams through executor
  * readers instead of buffering its tie count on the driver.
  *
  * Sub-range cuts are EXACT row values (no serialization round-trip), kept
  * strictly increasing inside the typed (start, end] interval, so the
  * ranges are disjoint and tile the batch exactly; a replayed batch always
  * re-reads the same (start, end] content even if the cut positions differ.
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
  private val updType: DataType = schema(updateColumn).dataType

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
    pageBoundary(s.last).map(b => KeysetOffset(Some(b))).getOrElse(s)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("uses latestOffset(start, limit)")

  /** Serialized boundary of the next page: the page's max update value,
    * reduced executor-side — the driver receives ONE scalar, never rows.
    * (The page scan is ordered asc and limited, so its max IS the last
    * emitted row's value — byte-identical to the collected-page boundary.) */
  private def pageBoundary(last: Option[String]): Option[String] = {
    val page = KeysetScan.scan(table, updateColumn, last, maxRowsPerBatch,
      rubyTimeFormat = rubyTimeFormat)
    val one = page.agg(max(col(updateColumn)).as(updateColumn)).collect().head
    if (one.isNullAt(0)) None
    else Serialize.rowToStringMap(StructType(Seq(schema(updateColumn))), one,
      rubyTimeFormat).get(updateColumn)
  }

  /** Parse a serialized boundary to its EXTERNAL typed value with the same
    * expression `KeysetScan.lowerBound` filters with (to_timestamp with the
    * table's time format for timestamps, a cast otherwise) — evaluated over
    * a local one-row relation, so no job runs and parity is exact. */
  private def parseExternal(serialized: String): Any = {
    val bound = KeysetScan.typedBound(updType, serialized, rubyTimeFormat)
    spark.sql("SELECT 1").select(bound.as("v")).head.get(0)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KeysetOffset]
    val e = end.asInstanceOf[KeysetOffset]
    if (s == e || e.last.isEmpty) return Array.empty
    val hiExt = parseExternal(e.last.get)
    if (hiExt == null)
      sys.error(s"keyset-tail: end boundary '${e.last.get}' does not parse as $updType")
    val loExt = s.last.map(parseExternal)
    val toInternal = CatalystTypeConverters.createToCatalystConverter(updType)
    val ord = TypeUtils.getInterpretedOrdering(updType)
    val hiInt = toInternal(hiExt)
    val loInt = loExt.filter(_ != null).map(toInternal)
    // Sub-range cuts from the page's DISTINCT-VALUE histogram: one
    // partial-aggregable groupBy (no global sort, no single-partition
    // window) whose driver result is (value, count) pairs — bounded by
    // the page row count for limit > 0 polls, and by the batch's distinct
    // values (small by definition for a tie-heavy page) otherwise. The
    // driver walks the sorted histogram and cuts wherever the cumulative
    // count reaches maxRowsPerPartition — exact row values (no string
    // round-trip), then kept strictly increasing inside the typed
    // (start, end] interval, so the resulting ranges are disjoint and
    // tile the batch exactly even when ties or coarse time formats
    // collapse cuts.
    val pageDf = KeysetScan.scan(table, updateColumn, s.last, limit = 0,
        rubyTimeFormat = rubyTimeFormat)
      .filter(!KeysetScan.lowerBound(table, updateColumn, e.last.get, rubyTimeFormat))
    val hist = pageDf.groupBy(col(updateColumn).as("u"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("u"))
      .collect().filter(!_.isNullAt(0))
    val cutsExt = {
      val cuts = Vector.newBuilder[Any]
      var acc = 0L
      hist.foreach { r =>
        acc += r.getLong(1)
        if (acc >= maxRowsPerPartition) { cuts += r.get(0); acc = 0L }
      }
      cuts.result()
    }
    val interior = cutsExt.map(toInternal).foldLeft(Vector.empty[Any]) { (acc, c) =>
      val inRange = loInt.forall(l => ord.gt(c, l)) && ord.lt(c, hiInt)
      if (inRange && (acc.isEmpty || ord.gt(c, acc.last))) acc :+ c else acc
    }
    // The executor-side read function: Spark's own parquet reader with the
    // PAGE range pushed down (row-group pruning skips everything outside
    // (start, end]); each reader adds its sub-range residual per record.
    val pushed: Seq[Filter] =
      loExt.filter(_ != null).map(v => GreaterThan(updateColumn, v)).toSeq :+
        LessThanOrEqual(updateColumn, hiExt)
    val hadoopConf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, schema, StructType(Nil), schema, pushed,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"), hadoopConf)
    val files = table.inputFiles.toSeq.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hadoopConf).getFileStatus(p)
      (f, st.getLen, st.getModificationTime)
    }
    val his = interior :+ hiInt
    val los: Seq[Option[Any]] = loInt +: his.init.map(Some(_))
    los.zip(his).map { case (lo, hi) =>
      KeysetRangePartition(files, lo, hi, readFunc): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetReaderFactory(schema, updateColumn)

  override def stop(): Unit = ()
}

/** A value sub-range of one micro-batch: `(lo, hi]` in the update column's
  * INTERNAL type (micros Long for timestamps, UTF8String for strings, …)
  * plus the table's file inventory and the serialized parquet read
  * function. Carries NO rows — the reader fetches them executor-side. */
final case class KeysetRangePartition(
    files: Seq[(String, Long, Long)],
    lo: Option[Any], hi: Any,
    readFunc: PartitionedFile => Iterator[InternalRow]) extends InputPartition

/** Executor-side reader: scans the table's parquet files through the
  * shipped read function (vectorized, page-filter row-group pruning) and
  * keeps rows in this partition's `(lo, hi]` update-column sub-range.
  * Iterators auto-close at exhaustion (RecordReaderIterator semantics);
  * rows follow the DSv2 contract (valid until the next `next()`). */
final class KeysetReaderFactory(schema: StructType, updateColumn: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KeysetRangePartition]
    val ordinal = schema.fieldIndex(updateColumn)
    val dt = schema(updateColumn).dataType
    val ord = TypeUtils.getInterpretedOrdering(dt)
    val it = p.files.iterator.flatMap { case (f, len, mod) =>
      p.readFunc(PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f),
        0L, len, Array.empty[String], mod, len))
    }.filter { row =>
      !row.isNullAt(ordinal) && {
        val v = row.get(ordinal, dt)
        p.lo.forall(l => ord.gt(v, l)) && ord.lteq(v, p.hi)
      }
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        val h = it.hasNext
        if (h) current = it.next()
        h
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
