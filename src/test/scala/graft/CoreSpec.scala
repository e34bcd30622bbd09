package graft

import org.scalatest.funsuite.AnyFunSuite


import graft.core._

class RubyStrftimeSpec extends AnyFunSuite {
  test("default reference format translates (in_sql.rb:62)") {
    assert(RubyStrftime.toSparkPattern("%Y-%m-%d %H:%M:%S.%6N%z") ===
      "yyyy'-'MM'-'dd' 'HH':'mm':'ss'.'SSSSSSZ")
  }
  test("width variants of %N") {
    assert(RubyStrftime.toSparkPattern("%3N") === "SSS")
    assert(RubyStrftime.toSparkPattern("%9N") === "SSSSSSSSS")
    assert(RubyStrftime.toSparkPattern("%N") === "SSSSSSSSS")
  }
  test("colon zone modifier") {
    assert(RubyStrftime.toSparkPattern("%:z") === "xxx")
    assert(RubyStrftime.toSparkPattern("%z") === "Z")
  }
  test("literal text with letters is quoted") {
    assert(RubyStrftime.toSparkPattern("at %H o'clock") === "'at 'HH' o''clock'")
  }
  test("%% is a literal percent") {
    assert(RubyStrftime.toSparkPattern("%d%%") === "dd'%'")
  }
}

class TagPatternSpec extends AnyFunSuite {
  private def m(p: String, tag: String) = TagPattern(p).matches(tag)

  test("* matches exactly one tag part") {
    assert(m("a.*", "a.b"))
    assert(!m("a.*", "a.b.c"))
    assert(!m("a.*", "a"))
  }
  test("** matches zero or more parts") {
    assert(m("a.**", "a"))
    assert(m("a.**", "a.b"))
    assert(m("a.**", "a.b.c"))
    assert(!m("a.**", "x.b"))
    assert(m("**", "anything.at.all"))
    assert(m("**.c", "c"))
    assert(m("**.c", "a.b.c"))
    assert(m("a.**.c", "a.c"))
    assert(m("a.**.c", "a.b.c"))
    assert(!m("a.**.c", "a.b"))
  }
  test("{a,b} alternation (README.md:126-146)") {
    assert(m("db.{click,view}", "db.click"))
    assert(m("db.{click,view}", "db.view"))
    assert(!m("db.{click,view}", "db.other"))
    assert(m("{a.**,b.*}", "a.x.y"))
    assert(m("{a.**,b.*}", "b.x"))
    assert(!m("{a.**,b.*}", "b.x.y"))
  }
  test("partial wildcards within a part") {
    assert(m("db.ev*", "db.event"))
    assert(!m("db.ev*", "db.other"))
  }
  test("regex metacharacters in tags are literal") {
    assert(m("a+b.c", "a+b.c"))
    assert(!m("a+b.c", "aab.c"))
  }
  test("first-match-wins routing with required default (out_sql.rb:226-237)") {
    val routes = Seq(TagPattern("a.**") -> "t1", TagPattern("a.b") -> "t2")
    assert(TagPattern.route(routes, "dflt")("a.b") === "t1") // top-to-bottom
    assert(TagPattern.route(routes, "dflt")("z.z") === "dflt")
  }
}

class ColumnMappingSpec extends AnyFunSuite {
  test("parse from:to pairs and identity shorthand (out_sql.rb:61-72)") {
    val cm = ColumnMapping.parse("timestamp:created_at,host:host,message")
    assert(cm.pairs === Seq("timestamp" -> "created_at", "host" -> "host", "message" -> "message"))
  }
  test("empty segments are ignored") {
    assert(ColumnMapping.parse("a:b,,c").pairs === Seq("a" -> "b", "c" -> "c"))
  }
}

class ConfigSpec extends AnyFunSuite {
  test("tag defaults to table name, optional prefix (README.md:93)") {
    val t = SourceTableConfig(table = "logs")
    assert(t.resolvedTag(Some("db")) === "db.logs")
    assert(t.resolvedTag(None) === "logs")
    assert(t.copy(tag = Some("custom")).resolvedTag(Some("db")) === "db.custom")
  }
  test("output prefix strip is anchored (out_sql.rb:253-259)") {
    val cfg = OutputConfig(Nil, SinkTableConfig("**", "dflt", "a"), removeTagPrefix = Some("db"))
    assert(cfg.stripPrefix("db.logs") === "logs")
    assert(cfg.stripPrefix("db") === "")
    assert(cfg.stripPrefix("xdb.logs") === "xdb.logs")
  }
  test("system table skip (in_sql.rb:183)") {
    assert(SystemTables.isSystemTable("schema_migrations"))
    assert(SystemTables.isSystemTable("SCHEMA_MIGRATIONS"))
    assert(!SystemTables.isSystemTable("events"))
  }
}
