package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.core.RubyStrftime
import graft.sources.{JdbcSource, Serialize}

/** Multi-table keyset tail (`format("keyset-tail-multi")`): the reference's
  * ONE input plugin tailing ALL configured tables in one poll loop
  * (`in_sql.rb:233-243, 255-278`) as ONE Structured Streaming source —
  * one query, one checkpoint, one trigger, with PER-TABLE FAULT ISOLATION:
  *
  *   - a table whose schema cannot be reflected at stream construction is
  *     DROPPED from the set with a logged warning (`in_sql.rb:233-243`,
  *     `tables.reject!`) — the stream starts with the survivors;
  *   - a table whose poll fails mid-stream (dropped table, revoked grant,
  *     transient DB error) is logged and SKIPPED for that cycle while the
  *     other tables advance (`in_sql.rb:272-275`); its offset is held, so
  *     a recovered table resumes from where it stopped;
  *   - offsets are a per-tag map ([[KeysetMultiOffset]]) committed to the
  *     one checkpoint log — restart resumes EVERY table from its own
  *     boundary.
  *
  * Because the tables have heterogeneous schemas, rows are emitted in the
  * reference's own event shape (`in_sql.rb:139-158`): `tag STRING` +
  * `record MAP<STRING,STRING>` with the §1.2 serialization applied per
  * field (timestamps through the table's `time_format`, everything else
  * stringified; NULL fields absent from the map — `Serialize
  * .rowToStringMap` semantics). Event-time extraction / typed projection
  * are downstream concerns, exactly as in the reference where the router
  * consumes serialized records.
  *
  * Each poll issues one tiny driver-side JDBC aggregate per LIVE table
  * (`SELECT MAX(upd) FROM <page>` — constant driver state, no Spark job,
  * the reference's own poll-thread shape), and each advanced table
  * becomes ONE executor-side partition reading its (lo, hi] range over
  * its own connection. Scale note: this source is the MANY-TABLES
  * coordinator (its per-table page is `select_limit`-bounded); a single
  * huge table wanting sub-range parallel reads is the single-table
  * `keyset-tail` source's job (percentile-cut partition planner).
  *
  * Options: `url` (+ `user`/`password`/`driver`/`sessionInitStatement`/
  * `fetchFirst`), `maxRowsPerBatch` (per table per poll; `<= 0` reads all
  * available), and per-table blocks `tables.N.tag`, `tables.N.dbtable`,
  * `tables.N.updateColumn`, optional `tables.N.timeFormat` for contiguous
  * N starting at 0 (built by [[KeysetTail.multiReader]] from the parsed
  * reference config).
  */
class KeysetTailMultiProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "keyset-tail-multi"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeysetTailMulti.EventSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KeysetTailMultiTable(properties.asScala.toMap)
}

object KeysetTailMulti {
  /** The tagged-event shape (`in_sql.rb:139-158`): NULL record fields are
    * absent from the map, so values never carry null. */
  val EventSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("record",
      MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))

  /** One configured table, parsed from the `tables.N.*` option block. */
  final case class TableSpec(tag: String, dbtable: String,
                             updateColumn: String, timeFormat: String)

  /** One LIVE table after driver-side schema reflection. */
  final case class ResolvedTable(spec: TableSpec, schema: StructType,
                                 updCol: String, updType: DataType)

  def parseSpecs(ci: Map[String, String]): Seq[TableSpec] = {
    val specs = Iterator.from(0)
      .map(i => (i, ci.get(s"tables.$i.tag"), ci.get(s"tables.$i.dbtable"),
        ci.get(s"tables.$i.updatecolumn")))
      .takeWhile { case (_, t, d, u) => t.isDefined || d.isDefined || u.isDefined }
      .map { case (i, t, d, u) =>
        TableSpec(
          t.getOrElse(sys.error(s"keyset-tail-multi: tables.$i.tag missing")),
          d.getOrElse(sys.error(s"keyset-tail-multi: tables.$i.dbtable missing")),
          u.getOrElse(sys.error(s"keyset-tail-multi: tables.$i.updateColumn missing")),
          ci.getOrElse(s"tables.$i.timeformat", RubyStrftime.DefaultRubyFormat))
      }.toVector
    require(specs.nonEmpty, "keyset-tail-multi: no tables.N.* blocks configured")
    require(specs.map(_.tag).distinct.size == specs.size,
      s"keyset-tail-multi: duplicate tags in ${specs.map(_.tag).mkString(",")}")
    specs
  }
}

final class KeysetTailMultiTable(props: Map[String, String])
    extends Table with SupportsRead {
  private val ci: Map[String, String] = props.map { case (k, v) => k.toLowerCase -> v }
  override def name(): String =
    s"keyset-tail-multi(${KeysetTailMulti.parseSpecs(ci).map(_.tag).mkString(",")})"
  override def schema(): StructType = KeysetTailMulti.EventSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = KeysetTailMulti.EventSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val url = ci.getOrElse("url", sys.error("keyset-tail-multi requires url"))
        val ff = ci.get("fetchfirst").map(_.toBoolean).getOrElse(
          Seq("jdbc:derby", "jdbc:oracle", "jdbc:db2").exists(url.startsWith))
        new KeysetMultiMicroBatchStream(url,
          KeysetTailTable.jdbcProps(ci).asScala.toMap.map {
            case (k, v) => (k.toString, v.toString) },
          KeysetTailMulti.parseSpecs(ci),
          ci.getOrElse("maxrowsperbatch", "500").toInt, ff)
      }
    }
}

/** Offset = per-tag serialized boundary map, one JSON line, tag-sorted for
  * determinism. A tag absent from the map has not emitted yet (≙ the
  * reference's state file holding no entry for the table). */
final case class KeysetMultiOffset(last: Map[String, Option[String]]) extends Offset {
  override def json(): String =
    last.toSeq.sortBy(_._1).map { case (tag, v) =>
      "\"" + KeysetOffset.escape(tag) + "\":" +
        v.map(s => "\"" + KeysetOffset.escape(s) + "\"").getOrElse("null")
    }.mkString("{", ",", "}")
}
object KeysetMultiOffset {
  private val Pair =
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*(null|\"(?:[^\"\\\\]|\\\\.)*\")".r
  def fromJson(s: String): KeysetMultiOffset =
    KeysetMultiOffset(Pair.findAllMatchIn(s).map { m =>
      val tag = KeysetOffset.unescape(m.group(1))
      val v = m.group(2) match {
        case "null" => None
        case quoted => Some(KeysetOffset.unescape(quoted.substring(1, quoted.length - 1)))
      }
      tag -> v
    }.toMap)
}

final class KeysetMultiMicroBatchStream(url: String, connProps: Map[String, String],
    specs: Seq[KeysetTailMulti.TableSpec], maxRowsPerBatch: Int, fetchFirst: Boolean)
    extends MicroBatchStream with SupportsAdmissionControl {
  import KeysetTailMulti._

  private def spark = SparkSession.active
  private def warn(msg: String): Unit =
    System.err.println(s"[graft.keyset-tail-multi] $msg")

  private def jprops: java.util.Properties = {
    val p = new java.util.Properties()
    connProps.foreach { case (k, v) => p.put(k, v) }
    p
  }

  private def quoted(name: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(name)

  // the multi source emits ONE partition per advanced table per batch —
  // right for the reference's select_limit-bounded poll loop, but a
  // `limit <= 0` poll reads a table's WHOLE remainder through one reader.
  // Backlog-sized tables belong on the single-table source (sub-range
  // percentile planner); say so once at stream construction.
  if (maxRowsPerBatch <= 0)
    warn("maxRowsPerBatch <= 0: each poll reads every table's full " +
      "remainder as ONE partition; for backlog-sized tables use the " +
      "single-table keyset-tail source (sub-range partition planner)")

  /** Driver-side schema reflection per table; failures DROP the table from
    * this run's set (`in_sql.rb:233-243` `tables.reject!`), logged. */
  private val live: Seq[ResolvedTable] = {
    val resolved = specs.flatMap { s =>
      try {
        val sch = spark.read.jdbc(url, s.dbtable, jprops).schema
        val upd = sch.fields
          .collectFirst { case f if f.name.equalsIgnoreCase(s.updateColumn) => f.name }
          .getOrElse(sys.error(
            s"updateColumn '${s.updateColumn}' not in ${sch.fieldNames.mkString(",")}"))
        Some(ResolvedTable(s, sch, upd, sch(upd).dataType))
      } catch {
        case scala.util.control.NonFatal(e) =>
          warn(s"table '${s.tag}' (${s.dbtable}) failed to initialize and is " +
            s"DROPPED from this run (in_sql.rb:233-243): ${e.getMessage}")
          None
      }
    }
    require(resolved.nonEmpty,
      "keyset-tail-multi: every configured table failed to initialize")
    resolved
  }

  override def initialOffset(): Offset =
    KeysetMultiOffset(live.map(_.spec.tag -> (None: Option[String])).toMap)
  override def deserializeOffset(json: String): Offset = KeysetMultiOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The page's max update value via ONE driver-side JDBC scalar per table
    * (the reference's poll-thread shape — no Spark job per poll): bounded
    * by the page subquery when `maxRowsPerBatch > 0`, the whole remainder
    * otherwise. */
  private def pollBoundary(t: ResolvedTable, last: Option[String]): Option[String] = {
    val u = quoted(t.updCol)
    val where = last.map(v => s"WHERE $u > ${JdbcSource.sqlLiteral(v)}").getOrElse("")
    val sql =
      if (maxRowsPerBatch <= 0)
        s"SELECT MAX($u) FROM ${t.spec.dbtable} $where"
      else {
        val lim = if (fetchFirst) s"FETCH FIRST $maxRowsPerBatch ROWS ONLY"
                  else s"LIMIT $maxRowsPerBatch"
        s"SELECT MAX(page_u) FROM (SELECT $u AS page_u FROM ${t.spec.dbtable} " +
          s"$where ORDER BY $u ASC $lim) page"
      }
    val conn = JdbcSource.connect(url, jprops)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        try {
          if (!rs.next()) None
          else {
            val v = t.updType match {
              case TimestampType => rs.getTimestamp(1)
              case DateType      => rs.getDate(1)
              case _             => rs.getObject(1)
            }
            if (rs.wasNull() || v == null) None
            else Some(Serialize.valueToString(t.updType, v, t.spec.timeFormat))
          }
        } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[KeysetMultiOffset].last
    var advanced = false
    val next = live.map { t =>
      val prev = s.getOrElse(t.spec.tag, None)
      val nxt =
        try pollBoundary(t, prev) match {
          case Some(b) if !prev.contains(b) => advanced = true; Some(b)
          case _ => prev
        } catch {
          case scala.util.control.NonFatal(e) =>
            // per-cycle per-table fault isolation (in_sql.rb:272-275): log,
            // hold this table's offset, let the others advance
            warn(s"table '${t.spec.tag}' poll failed (skipped this cycle, " +
              s"offset held): ${e.getMessage}")
            prev
        }
      t.spec.tag -> nxt
    }.toMap
    if (advanced) KeysetMultiOffset(next) else start
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("uses latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KeysetMultiOffset].last
    val e = end.asInstanceOf[KeysetMultiOffset].last
    live.flatMap { t =>
      val lo = s.getOrElse(t.spec.tag, None)
      val hi = e.getOrElse(t.spec.tag, None)
      hi match {
        case Some(h) if lo != hi =>
          Some(KeysetMultiPartition(t.spec.tag, url, t.spec.dbtable, connProps,
            t.schema, t.schema.fieldNames.toSeq.map(quoted),
            quoted(t.updCol), lo, h, t.spec.timeFormat): InputPartition)
        case _ => None // table did not advance this batch
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KeysetMultiReaderFactory

  override def stop(): Unit = ()
}

/** One advanced table's (lo, hi] page of one micro-batch: bounds travel as
  * serialized strings (the single-table JDBC mode's contract) and the
  * reader serializes each row to the tagged-event shape executor-side. */
final case class KeysetMultiPartition(
    tag: String, url: String, dbtable: String, props: Map[String, String],
    schema: StructType, quotedColumns: Seq[String], quotedUpdCol: String,
    lo: Option[String], hi: String, timeFormat: String) extends InputPartition {
  def query: String = {
    val bounds = lo.map(v =>
      s"${JdbcSource.sqlLiteral(v)} < $quotedUpdCol AND ").getOrElse("") +
      s"$quotedUpdCol <= ${JdbcSource.sqlLiteral(hi)}"
    s"SELECT ${quotedColumns.mkString(", ")} FROM $dbtable WHERE $bounds"
  }
}

final class KeysetMultiReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KeysetMultiReader(partition.asInstanceOf[KeysetMultiPartition])
}

/** Executor-side reader: one connection, one range query, each row
  * serialized per §1.2 (`Serialize.valueToString` field-wise; NULL fields
  * absent) into `(tag, record)`. */
final class KeysetMultiReader(p: KeysetMultiPartition)
    extends PartitionReader[InternalRow] {
  private val props = {
    val pr = new java.util.Properties()
    p.props.foreach { case (k, v) => pr.put(k, v) }
    pr
  }
  Option(props.getProperty("driver")).foreach(java.lang.Class.forName)
  private val conn = JdbcSource.connect(p.url, props)
  conn.setAutoCommit(false) // cursor-mode fetch, same as KeysetJdbcReader
  private val stmt = conn.createStatement()
  stmt.setFetchSize(1000)
  private val rs = stmt.executeQuery(p.query)
  private val fields = p.schema.fields
  private val tagU = UTF8String.fromString(p.tag)

  private def readField(i: Int): Any = {
    val v = fields(i).dataType match {
      case TimestampType  => rs.getTimestamp(i + 1)
      case DateType       => rs.getDate(i + 1)
      case _: DecimalType => rs.getBigDecimal(i + 1)
      case BinaryType     => rs.getBytes(i + 1)
      case _              => rs.getObject(i + 1)
    }
    if (rs.wasNull()) null else v
  }

  private var current: InternalRow = _
  override def next(): Boolean = {
    val h = rs.next()
    if (h) {
      val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < fields.length) {
        val v = readField(i)
        if (v != null) { // NULL fields absent, rowToStringMap semantics
          keys += UTF8String.fromString(fields(i).name)
          vals += UTF8String.fromString(
            Serialize.valueToString(fields(i).dataType, v, p.timeFormat))
        }
        i += 1
      }
      current = new GenericInternalRow(
        Array[Any](tagU, ArrayBasedMapData(keys.toArray, vals.toArray)))
    }
    h
  }
  override def get(): InternalRow = current
  override def close(): Unit = {
    graft.sinks.JdbcSink.cleanupQuietly(rs.close())
    graft.sinks.JdbcSink.cleanupQuietly(stmt.close())
    graft.sinks.JdbcSink.cleanupQuietly(conn.close())
  }
}
