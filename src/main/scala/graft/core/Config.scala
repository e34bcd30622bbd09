package graft.core

/** Engine configuration model, mirroring the reference's plugin config
  * surface (reference `in_sql.rb:43-66`, `out_sql.rb:22-56`) with eager
  * validation at construction (the reference validates in `#configure`).
  */

/** One tailed source table (reference `<table>` section, `in_sql.rb:55-66`). */
final case class SourceTableConfig(
    table: String,
    tag: Option[String] = None,
    updateColumn: Option[String] = None,
    timeColumn: Option[String] = None,
    primaryKey: Option[String] = None,
    timeFormat: String = RubyStrftime.DefaultRubyFormat
) {
  /** README-documented behavior: tag defaults to the table name. (The
    * reference code leaves explicit-section tags nil — `in_sql.rb:58,71` —
    * but its README.md:93 documents table-name defaulting, which `all_tables`
    * discovery also applies, `in_sql.rb:224`. We implement the documented
    * behavior; divergence noted in SURVEY §2.1.) */
  def resolvedTag(tagPrefix: Option[String]): String =
    (tagPrefix.toSeq :+ tag.getOrElse(table)).mkString(".")
}

/** Input plugin config (`in_sql.rb:43-66`). */
final case class InputConfig(
    tables: Seq[SourceTableConfig],
    tagPrefix: Option[String] = None,
    selectIntervalSec: Long = 60,   // in_sql.rb:49-50
    selectLimit: Int = 500,         // in_sql.rb:51-52; <=0 disables the LIMIT
    stateFile: Option[String] = None,
    allTables: Boolean = false      // in_sql.rb:53-54
) {
  require(tables.nonEmpty || allTables, "at least one <table> or all_tables required")
}

/** One sink route (reference `<table pattern>` section, `out_sql.rb:44-56`). */
final case class SinkTableConfig(
    pattern: String,
    table: String,
    columnMapping: String
) {
  val compiledPattern: TagPattern = TagPattern(pattern)
  val mapping: ColumnMapping = ColumnMapping.parse(columnMapping)
}

/** Output plugin config (`out_sql.rb:22-56`). A pattern-less default table is
  * required (`out_sql.rb:183-185`); first matching pattern wins, top to
  * bottom (`out_sql.rb:226-237`). */
final case class OutputConfig(
    routes: Seq[SinkTableConfig],
    defaultTable: SinkTableConfig,
    removeTagPrefix: Option[String] = None,
    /** `enable_fallback` (`out_sql.rb:31`): true (default) degrades a
      * deterministic bulk failure to the row-wise path; false re-raises so
      * the buffer's retry mechanism owns the chunk (`out_sql.rb:107-113`). */
    enableFallback: Boolean = true
) {
  /** Anchored prefix strip, dual of the input's tag_prefix
    * (`out_sql.rb:160-162, 253-259`). */
  def stripPrefix(tag: String): String = removeTagPrefix match {
    case Some(p) if tag == p              => ""
    case Some(p) if tag.startsWith(p + ".") => tag.substring(p.length + 1)
    case _                                => tag
  }

  def routeFor(tag: String): SinkTableConfig =
    routes.collectFirst { case r if r.compiledPattern.matches(tag) => r }
      .getOrElse(defaultTable)
}

object SystemTables {
  /** Discovery skips framework system tables (`in_sql.rb:183, 217-219`). */
  private val SkipRe = "(?i)^schema_migrations$".r
  def isSystemTable(name: String): Boolean = SkipRe.matches(name)
}
