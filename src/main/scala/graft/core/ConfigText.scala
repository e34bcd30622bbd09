package graft.core

import scala.collection.mutable

/** Parser for the reference's Fluentd-style config text (the `<source>` /
  * `<match>` blocks of `in_sql.rb:43-66` / `out_sql.rb:22-56`, structure per
  * its README examples) into the engine's config model — so an existing
  * fluent-plugin-sql deployment's table/tag/mapping configuration carries
  * over without rewriting.
  *
  * Grammar subset: nested `<name arg>` ... `</name>` sections containing
  * `key value` lines; `#` comments; blank lines ignored. Unknown keys are
  * retained in `Section.params` but ignored by the mappers (the reference's
  * DB connection params are handled by the JDBC url/properties instead).
  */
object ConfigText {

  final case class Section(name: String, arg: Option[String],
                           params: Map[String, String], children: Seq[Section])

  def parseSections(text: String): Seq[Section] = {
    val open = "<([\\w@]+)(?:\\s+([^>]*?))?>".r
    def build(lines: List[String]): (Seq[Section], Map[String, String], List[String]) = {
      val sections = mutable.ListBuffer.empty[Section]
      val params = mutable.LinkedHashMap.empty[String, String]
      var rest = lines
      while (rest.nonEmpty) {
        val line = rest.head.trim
        rest = rest.tail
        if (line.isEmpty || line.startsWith("#")) ()
        else if (line.startsWith("</")) return (sections.toSeq, params.toMap, rest)
        else open.findFirstMatchIn(line) match {
          case Some(m) =>
            val (kids, ps, remaining) = build(rest)
            sections += Section(m.group(1), Option(m.group(2)).map(_.trim).filter(_.nonEmpty), ps, kids)
            rest = remaining
          case None =>
            val idx = line.indexWhere(_.isWhitespace)
            if (idx < 0) params(line) = "true"
            else params(line.substring(0, idx)) = line.substring(idx).trim
        }
      }
      (sections.toSeq, params.toMap, Nil)
    }
    build(text.linesIterator.toList)._1
  }

  /** `<source>` → InputConfig (`in_sql.rb:43-66`). Durations accept the
    * reference's `60s` style (its `:time` type) or bare seconds. */
  def parseInput(text: String): InputConfig = {
    val src = parseSections(text).find(_.name == "source")
      .getOrElse(sys.error("no <source> section"))
    val p = src.params
    val tables = src.children.filter(_.name == "table").map { t =>
      SourceTableConfig(
        table = t.params.getOrElse("table", sys.error("<table> requires `table`")),
        tag = t.params.get("tag"),
        updateColumn = t.params.get("update_column"),
        timeColumn = t.params.get("time_column"),
        primaryKey = t.params.get("primary_key"),
        timeFormat = t.params.getOrElse("time_format", RubyStrftime.DefaultRubyFormat))
    }
    InputConfig(
      tables = tables,
      tagPrefix = p.get("tag_prefix"),
      selectIntervalSec = p.get("select_interval").map(parseSeconds).getOrElse(60L),
      selectLimit = p.get("select_limit").map(parseSeconds(_).toInt).getOrElse(500),
      stateFile = p.get("state_file"),
      allTables = p.get("all_tables").exists(_.toBoolean))
  }

  /** `<match>` → OutputConfig (`out_sql.rb:22-56`): `<table>` without a
    * pattern arg is the required default; first pattern wins in file order. */
  def parseOutput(text: String): OutputConfig = {
    val m = parseSections(text).find(_.name == "match")
      .getOrElse(sys.error("no <match> section"))
    val all = m.children.filter(_.name == "table").map { t =>
      val cfg = SinkTableConfig(
        pattern = t.arg.getOrElse(""),
        table = t.params.getOrElse("table", sys.error("<table> requires `table`")),
        columnMapping = t.params.getOrElse("column_mapping", sys.error("<table> requires `column_mapping`")))
      (t.arg.isEmpty, cfg)
    }
    val defaults = all.collect { case (true, c) => c }
    require(defaults.nonEmpty, "There must be one <table> without pattern (out_sql.rb:183-185)")
    OutputConfig(
      routes = all.collect { case (false, c) => c },
      // Duplicate pattern-less <table>s: the LAST wins — the reference warns
      // and then reassigns `@default_table = te` on every pattern-less
      // section (out_sql.rb:171-173), so the final assignment survives.
      defaultTable = defaults.last,
      removeTagPrefix = m.params.get("remove_tag_prefix"),
      enableFallback = parseBool(m.params.get("enable_fallback"), default = true))
  }

  /** Connection params of a `<source>` (`in_sql.rb:28-43`) or `<match>`
    * (`out_sql.rb:14-27`) section → [[ConnectionConfig]], including the
    * `socket` and `schema_search_path` extras. */
  def parseConnection(p: Map[String, String]): ConnectionConfig = ConnectionConfig(
    adapter = p.getOrElse("adapter", sys.error("`adapter` required")),
    host = p.getOrElse("host", "localhost"),
    port = p.get("port").map(_.trim.toInt),
    database = p.getOrElse("database", ""),
    username = p.get("username"),
    password = p.get("password"),
    socket = p.get("socket"),
    schemaSearchPath = p.get("schema_search_path"),
    // reference default: 5000 ms (out_sql.rb:34-35)
    timeoutMs = Some(p.get("timeout").map(_.trim.toInt).getOrElse(5000)),
    // reference default: 5 connections (out_sql.rb:32-33)
    pool = p.get("pool").map(_.trim.toInt).getOrElse(5))

  /** `<source>` connection params → ConnectionConfig. */
  def parseInputConnection(text: String): ConnectionConfig =
    parseConnection(parseSections(text).find(_.name == "source")
      .getOrElse(sys.error("no <source> section")).params)

  /** `<match>` connection params → ConnectionConfig. */
  def parseOutputConnection(text: String): ConnectionConfig =
    parseConnection(parseSections(text).find(_.name == "match")
      .getOrElse(sys.error("no <match> section")).params)

  /** Fluentd `:bool` config type: true/yes, false/no, bare key → true;
    * anything else is a config error (not silently coerced). */
  private[graft] def parseBool(v: Option[String], default: Boolean): Boolean =
    v.map(_.trim.toLowerCase) match {
      case None                  => default
      case Some("") | Some("true") | Some("yes") => true
      case Some("false") | Some("no")            => false
      case Some(bad) => sys.error(s"invalid :bool value '$bad'")
    }

  /** The reference's `:time` config type: `500` → 500, `75s` → 75,
    * `2m` → 120, `1h` → 3600. */
  private[graft] def parseSeconds(s: String): Long = {
    val t = s.trim
    t.lastOption match {
      case Some('s') => t.dropRight(1).trim.toLong
      case Some('m') => t.dropRight(1).trim.toLong * 60
      case Some('h') => t.dropRight(1).trim.toLong * 3600
      case Some('d') => t.dropRight(1).trim.toLong * 86400
      case _         => t.toLong
    }
  }
}
