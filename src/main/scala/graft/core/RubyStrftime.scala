package graft.core

/** Ruby strftime → Spark datetime-pattern translation.
  *
  * The reference formats Time values with a per-table Ruby strftime pattern,
  * default `"%Y-%m-%d %H:%M:%S.%6N%z"` (reference `in_sql.rb:62`, used by the
  * row-serialization path `in_sql.rb:91-92`). Spark's `date_format` speaks
  * Spark/Java `DateTimeFormatter` patterns, so engine configs written against
  * the reference's syntax are translated here once at config time; the hot
  * path stays a codegen'd `date_format` projection.
  *
  * Unknown directives pass through as literals (Ruby's own behavior).
  */
object RubyStrftime {

  /** Spark timestamps are microsecond-precision; `%N` (ns) can emit at most
    * 6 significant fractional digits, padded with zeros beyond that. */
  private def fractionDigits(width: Int): String = "S" * math.max(1, math.min(width, 9))

  def toSparkPattern(rb: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        // Quote literal runs so alphabetic chars aren't read as directives.
        out.append('\'').append(lit.toString.replace("'", "''")).append('\'')
        lit.clear()
      }
    }
    var i = 0
    while (i < rb.length) {
      val c = rb.charAt(i)
      if (c == '%' && i + 1 < rb.length) {
        var j = i + 1
        // optional width (%3N / %6N / %9N) and the ':' modifier (%:z)
        var width = 0
        var hasWidth = false
        var colon = false
        while (j < rb.length && rb.charAt(j).isDigit) {
          width = width * 10 + (rb.charAt(j) - '0'); hasWidth = true; j += 1
        }
        if (j < rb.length && rb.charAt(j) == ':') { colon = true; j += 1 }
        val conv = if (j < rb.length) rb.charAt(j) else '%'
        val mapped: Option[String] = conv match {
          case 'Y' => Some("yyyy")
          case 'y' => Some("yy")
          case 'C' => None // century: no Spark equivalent → literal passthrough
          case 'm' => Some("MM")
          case 'd' => Some("dd")
          case 'e' => Some("d")
          case 'j' => Some("DDD")
          case 'H' => Some("HH")
          case 'k' => Some("H")
          case 'I' => Some("hh")
          case 'l' => Some("h")
          case 'M' => Some("mm")
          case 'S' => Some("ss")
          case 'L' => Some("SSS")
          case 'N' => Some(fractionDigits(if (hasWidth) width else 9))
          case 'z' => Some(if (colon) "xxx" else "Z") // +0000 / +00:00
          case 'Z' => Some("zzz")
          case 'a' => Some("EEE")
          case 'A' => Some("EEEE")
          case 'b' | 'h' => Some("MMM")
          case 'B' => Some("MMMM")
          case 'p' => Some("a")
          // ISO week-based fields: Spark BANS the pattern letters since 3.0
          // (DateTimeFormatterHelper.weekBasedLetters = e,Y,u,w,c,W throw
          // DATETIME_WEEK_BASED_PATTERN). Mapping them would crash deep in
          // date_format at runtime; fail loudly at config time instead.
          case 'u' | 'G' | 'V' => throw new IllegalArgumentException(
            s"strftime %$conv (ISO week-based field) has no Spark datetime-pattern " +
              "equivalent — week-based pattern letters are unsupported since Spark 3.0")
          case 'F' => Some("yyyy-MM-dd")
          case 'T' | 'X' => Some("HH:mm:ss")
          case 'R' => Some("HH:mm")
          case 'D' => Some("MM/dd/yy")
          case '%' => None
          case _   => None
        }
        mapped match {
          case Some(p) => flushLit(); out.append(p); i = j + 1
          case None =>
            if (conv == '%') { lit.append('%'); i = j + 1 }
            else { lit.append(rb.substring(i, math.min(j + 1, rb.length))); i = j + 1 }
        }
      } else {
        lit.append(c); i += 1
      }
    }
    flushLit()
    out.toString
  }

  /** True when the format emits a timezone suffix — numeric `%z` (any `:`
    * variant) OR zone-name `%Z` (→ `zzz`, e.g. " UTC"). Scans the format the
    * way [[toSparkPattern]] tokenizes it, so `%%z` (escaped percent followed
    * by a literal `z`) is NOT a zone directive while `%%%z` is. Used by the
    * keyset providers' config-time guard: dialects whose string→TIMESTAMP
    * cast rejects ANY zone suffix (Derby) fail on both forms the moment the
    * serialized boundary re-enters the page query (ADVICE r13). */
  def hasZoneDirective(rb: String): Boolean = {
    var i = 0
    while (i < rb.length) {
      if (rb.charAt(i) == '%' && i + 1 < rb.length) {
        var j = i + 1
        while (j < rb.length && rb.charAt(j).isDigit) j += 1 // width (%6N)
        while (j < rb.length && rb.charAt(j) == ':') j += 1  // %:z / %::z
        if (j < rb.length) {
          val conv = rb.charAt(j)
          if (conv == 'z' || conv == 'Z') return true
          i = j + 1 // %% consumes both chars: a following 'z' is a literal
        } else i = j
      } else i += 1
    }
    false
  }

  /** The reference's default serialization format (`in_sql.rb:62`). */
  val DefaultRubyFormat = "%Y-%m-%d %H:%M:%S.%6N%z"
  lazy val DefaultSparkPattern: String = toSparkPattern(DefaultRubyFormat)
}
