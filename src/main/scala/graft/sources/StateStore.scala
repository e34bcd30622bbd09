package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Checkpoint state for keyset tailing: `{table → last serialized record}`,
  * the Spark-side equivalent of the reference's YAML state file
  * (reference `in_sql.rb:269-271, 280-307`).
  *
  * Delivery contract is at-least-once, exactly like the reference: the state
  * write happens AFTER the batch is emitted (`in_sql.rb:270-271`), so a crash
  * between emit and update replays the last page.
  *
  * The file form rewrites the whole map after each table's emit
  * (`in_sql.rb:302-306`), tolerates an empty/missing file and rejects
  * non-map content (`in_sql.rb:288-301`). The memory form is the no-op
  * store used when no state_file is configured (`in_sql.rb:186, 309-320`).
  */
trait StateStore {
  def lastRecord(table: String): Option[Map[String, String]]
  /** Record the last emitted row, then persist. Call AFTER emit. */
  def update(table: String, record: Map[String, String]): Unit
  def snapshot: Map[String, Map[String, String]]
}

final class MemoryStateStore extends StateStore {
  private val state = mutable.LinkedHashMap.empty[String, Map[String, String]]
  override def lastRecord(table: String): Option[Map[String, String]] = state.get(table)
  override def update(table: String, record: Map[String, String]): Unit =
    state.update(table, record)
  override def snapshot: Map[String, Map[String, String]] = state.toMap
}

final class FileStateStore(path: String) extends StateStore {
  private val mapper = new ObjectMapper()
  private val file: Path = Paths.get(path)
  private val state = mutable.LinkedHashMap.empty[String, Map[String, String]]
  load()

  private def load(): Unit = {
    if (Files.exists(file)) {
      val text = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      if (text.trim.nonEmpty) {
        val parsed = mapper.readValue(text, classOf[java.util.Map[String, java.util.Map[String, String]]])
        if (parsed == null)
          throw new IllegalStateException(s"state file $path is broken (not a map)")
        parsed.asScala.foreach { case (t, rec) =>
          state.update(t, Option(rec).map(_.asScala.toMap).getOrElse(Map.empty))
        }
      }
    }
  }

  override def lastRecord(table: String): Option[Map[String, String]] = state.get(table)

  override def update(table: String, record: Map[String, String]): Unit = {
    state.update(table, record)
    persist()
  }

  /** Full rewrite via temp file + atomic move (crash-safe variant of the
    * reference's truncate-and-write, `in_sql.rb:302-306`). */
  private def persist(): Unit = {
    val jmap = new java.util.LinkedHashMap[String, java.util.Map[String, String]]()
    state.foreach { case (t, rec) =>
      val m = new java.util.LinkedHashMap[String, String]()
      rec.foreach { case (k, v) => m.put(k, v) }
      jmap.put(t, m)
    }
    val tmp = file.resolveSibling(file.getFileName.toString + ".tmp")
    Files.write(tmp, mapper.writeValueAsString(jmap).getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, file, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  override def snapshot: Map[String, Map[String, String]] = state.toMap
}
