package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's `column_mapping` config: `"from1:to1,from2:to2,key"`
  * (reference `out_sql.rb:48, 61-72`; a bare `key` maps to itself,
  * `out_sql.rb:66-69`). Applying a mapping projects the record through it —
  * renaming mapped fields, pruning everything unlisted, and producing NULL
  * for sources absent from the record (`out_sql.rb:140-148`).
  *
  * Spark-side this is a plain `select` of aliased columns: fully codegen'd,
  * prunable, and pushdown-friendly (Catalyst collapses it into the scan).
  */
final case class ColumnMapping(pairs: Seq[(String, String)]) extends Serializable {
  require(pairs.nonEmpty, "column_mapping must list at least one column")

  def apply(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(pairs.map { case (from, to) =>
      if (present(from)) col(from).as(to)
      else lit(null).cast("string").as(to) // absent source → NULL column
    }: _*)
  }

  def projection(present: Set[String]): Seq[Column] =
    pairs.map { case (from, to) =>
      if (present(from)) col(from).as(to) else lit(null).cast("string").as(to)
    }

  /** The mapping applied to a serialized-record MAP column (the
    * `keyset-tail-multi` event shape, ≙ the reference mapping a record
    * hash, `out_sql.rb:140-148`): `element_at` yields NULL for absent
    * keys — exactly the "unmapped source → NULL column" rule — and the
    * source name `tag` reads the event's tag (the `inject` overwrite,
    * `out_sql.rb:10, 96, 156`). Key match is exact-case, like the Ruby
    * hash lookup (a JDBC dialect that upper-cases identifiers produces
    * upper-case record keys; write the mapping accordingly). */
  def fromMap(record: Column, tag: Column): Seq[Column] =
    pairs.map { case (from, to) =>
      (if (from == "tag") tag else element_at(record, from)).as(to)
    }
}

object ColumnMapping {
  def parse(spec: String): ColumnMapping = ColumnMapping(
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split(":", 2) match {
        case Array(k, v) => (k.trim, v.trim)
        case Array(k)    => (k.trim, k.trim)
      }
    }
  )
}
