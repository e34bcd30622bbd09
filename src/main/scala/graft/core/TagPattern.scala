package graft.core

import java.util.regex.Pattern

/** Fluentd-style tag match pattern, as used by the reference's `<table>`
  * routing sections (reference `out_sql.rb:56, 226-237`; pattern language
  * documented in its `README.md:126-146`):
  *
  *   - `*`  matches exactly one tag part (no dots)
  *   - `**` matches zero or more tag parts
  *   - `{a,b}` matches alternatives (each may itself contain wildcards/dots)
  *   - patterns are dot-separated, e.g. `db.{click,view}.**`
  *
  * Compiled once to an anchored Java regex so DataFrame routing can use
  * `col("tag").rlike(p.regexString)` (codegen'd, no UDF).
  */
final class TagPattern private (val source: String, compiled: Pattern) extends Serializable {
  def matches(tag: String): Boolean = compiled.matcher(tag).matches()
  /** Anchored regex string suitable for `Column.rlike`. */
  def regexString: String = compiled.pattern()
  override def toString: String = s"TagPattern($source)"
}

object TagPattern {

  def apply(pattern: String): TagPattern =
    new TagPattern(pattern, Pattern.compile(toRegex(pattern)))

  def toRegex(pattern: String): String = {
    val alts = expandBraces(pattern.trim).map(partsRegex)
    if (alts.lengthCompare(1) == 0) "^" + alts.head + "$"
    else "^(?:" + alts.mkString("|") + ")$"
  }

  /** Expand `{a,b}` groups (recursively, cartesian over multiple groups)
    * into brace-free glob patterns. Unbalanced braces are left literal. */
  private[core] def expandBraces(p: String): List[String] = {
    val open = p.indexOf('{')
    if (open < 0) return List(p)
    var depth = 0
    var close = -1
    var i = open
    while (i < p.length && close < 0) {
      p.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) close = i
        case _   =>
      }
      i += 1
    }
    if (close < 0) return List(p)
    val head = p.substring(0, open)
    val body = p.substring(open + 1, close)
    val tail = p.substring(close + 1)
    for {
      alt <- splitTopLevel(body).flatMap(expandBraces)
      t   <- expandBraces(tail)
    } yield head + alt + t
  }

  private def splitTopLevel(s: String): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '{'            => depth += 1; cur.append('{')
      case '}'            => depth -= 1; cur.append('}')
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c              => cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  /** Brace-free glob → regex, respecting tag-part (dot) boundaries. */
  private def partsRegex(p: String): String = {
    if (p == "**") return ".*"
    val parts = p.split("\\.", -1)
    val sb = new StringBuilder
    var sepPending = false
    var idx = 0
    while (idx < parts.length) {
      val part = parts(idx)
      if (part == "**") {
        if (idx == 0) {
          sb.append("(?:[^.]+\\.)*") // `**.b` matches `b`, `x.b`, `x.y.b`
          sepPending = false
        } else {
          sb.append("(?:\\.[^.]+)*") // `a.**` matches `a`, `a.x`, ... ; `a.**.b` → `a(\.x)*\.b`
          sepPending = true
        }
      } else {
        if (sepPending) sb.append("\\.")
        part.foreach {
          case '*' => sb.append("[^.]*")
          case c if "\\^$.|?+()[]{}".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
          case c => sb.append(c)
        }
        sepPending = true
      }
      idx += 1
    }
    sb.toString
  }

  /** First-match-wins routing over an ordered pattern list, falling back to a
    * default — mirrors `out_sql.rb:226-237` (`return` on first match; required
    * default table `out_sql.rb:183-185, 235`). */
  def route[T](patterns: Seq[(TagPattern, T)], default: T)(tag: String): T =
    patterns.collectFirst { case (p, t) if p.matches(tag) => t }.getOrElse(default)
}
