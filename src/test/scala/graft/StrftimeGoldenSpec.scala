package graft

import org.apache.spark.sql.functions._

import graft.core.RubyStrftime
import graft.sources.Serialize

/** Golden table for the Ruby strftime → Spark pattern translator.
  *
  * Expected strings follow Ruby's documented `Time#strftime` semantics
  * (ruby-doc.org, the reference's serializer `in_sql.rb:91-92`), computed
  * for four fixed UTC instants chosen to exercise padding, fractional
  * widths, noon/midnight 12-hour wrap, day-of-year boundaries, and zone
  * forms. Each row is asserted against BOTH rendering paths — the
  * executor-side `date_format` projection and the driver-side
  * `Serialize.valueToString` — so the two can never diverge at a resume
  * boundary.
  *
  * Documented divergences from Ruby (asserted explicitly below so a silent
  * change is caught): `%e/%k/%l` print single digits UNPADDED where Ruby
  * blank-pads ("7" vs " 7") — Spark patterns have no blank-pad; `%C` and
  * other unmapped directives pass through as literals; ISO week-based
  * `%u/%G/%V` throw at translation time (Spark bans the letters since 3.0).
  */
class StrftimeGoldenSpec extends SparkSpecBase {

  // (label, timestamp literal) — all interpreted in the UTC session zone
  private val T1 = "2024-03-07 09:05:03.123456" // Thursday, doy 067
  private val T2 = "1999-12-31 23:59:59.987654" // Friday, doy 365
  private val T3 = "2024-01-01 00:00:00.000001" // Monday, doy 001, midnight
  private val T4 = "2024-07-04 15:30:45.5"      // Thursday, doy 186, pm

  private val golden: Seq[(String, String, String)] = Seq(
    // ---- year / month / day ----
    ("%Y", T1, "2024"), ("%Y", T2, "1999"),
    ("%y", T1, "24"), ("%y", T2, "99"),
    ("%m", T1, "03"), ("%m", T2, "12"),
    ("%d", T1, "07"), ("%d", T4, "04"),
    ("%j", T1, "067"), ("%j", T2, "365"), ("%j", T3, "001"), ("%j", T4, "186"),
    // ---- clock fields ----
    ("%H", T1, "09"), ("%H", T3, "00"), ("%H", T4, "15"),
    ("%I", T1, "09"), ("%I", T2, "11"), ("%I", T3, "12"), ("%I", T4, "03"),
    ("%M", T1, "05"), ("%M", T2, "59"),
    ("%S", T1, "03"), ("%S", T2, "59"),
    ("%p", T1, "AM"), ("%p", T2, "PM"), ("%p", T3, "AM"), ("%p", T4, "PM"),
    // ---- fractional seconds (%N default width 9 = ns, zero-padded) ----
    ("%L", T1, "123"), ("%L", T4, "500"),
    ("%N", T1, "123456000"),
    ("%3N", T1, "123"), ("%3N", T2, "987"),
    ("%6N", T1, "123456"), ("%6N", T2, "987654"), ("%6N", T3, "000001"),
    ("%9N", T1, "123456000"),
    // ---- zone (UTC session) ----
    ("%z", T1, "+0000"), ("%:z", T1, "+00:00"), ("%Z", T1, "UTC"),
    // ---- names ----
    ("%a", T1, "Thu"), ("%a", T2, "Fri"), ("%a", T3, "Mon"),
    ("%A", T1, "Thursday"), ("%A", T2, "Friday"),
    ("%b", T1, "Mar"), ("%b", T2, "Dec"), ("%h", T4, "Jul"),
    ("%B", T1, "March"), ("%B", T4, "July"),
    // ---- composites ----
    ("%F", T1, "2024-03-07"),
    ("%T", T1, "09:05:03"), ("%X", T4, "15:30:45"),
    ("%R", T1, "09:05"), ("%D", T1, "03/07/24"), ("%D", T4, "07/04/24"),
    // ---- literals and escapes ----
    ("%%", T1, "%"),
    ("at %H o'clock", T1, "at 09 o'clock"),
    ("%Y-%m-%dT%H:%M:%S", T1, "2024-03-07T09:05:03"),
    // ---- the reference's default serialization format (in_sql.rb:62) ----
    (RubyStrftime.DefaultRubyFormat, T1, "2024-03-07 09:05:03.123456+0000"),
    (RubyStrftime.DefaultRubyFormat, T2, "1999-12-31 23:59:59.987654+0000"),
    (RubyStrftime.DefaultRubyFormat, T3, "2024-01-01 00:00:00.000001+0000"),
    (RubyStrftime.DefaultRubyFormat, T4, "2024-07-04 15:30:45.500000+0000")
  )

  private def sparkSide(fmt: String, ts: String): String =
    spark.sql(s"SELECT timestamp'$ts' t")
      .select(date_format(col("t"), RubyStrftime.toSparkPattern(fmt)).as("v"))
      .head.getString(0)

  private def driverSide(fmt: String, ts: String): String = {
    val t = spark.sql(s"SELECT timestamp'$ts' v").head.getTimestamp(0)
    Serialize.valueToString(org.apache.spark.sql.types.TimestampType, t, fmt)
  }

  test("golden table: translated patterns reproduce Ruby strftime output on both render paths") {
    val failures = golden.flatMap { case (fmt, ts, expect) =>
      val viaSpark = sparkSide(fmt, ts)
      val viaDriver = driverSide(fmt, ts)
      Seq(
        Option.when(viaSpark != expect)(s"date_format('$fmt', $ts) = '$viaSpark', Ruby: '$expect'"),
        Option.when(viaDriver != expect)(s"valueToString('$fmt', $ts) = '$viaDriver', Ruby: '$expect'")
      ).flatten
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("documented divergences: blank-padded %e/%k/%l render unpadded; two-digit values agree") {
    // Ruby: ' 7' / ' 0' / ' 3' — Spark patterns cannot blank-pad
    assert(sparkSide("%e", T1) === "7")   // Ruby: " 7"
    assert(sparkSide("%k", T3) === "0")   // Ruby: " 0"
    assert(sparkSide("%l", T4) === "3")   // Ruby: " 3"
    // where the value has two digits, the forms agree with Ruby exactly
    assert(sparkSide("%e", T2) === "31")
    assert(sparkSide("%k", T4) === "15")
    assert(sparkSide("%l", T3) === "12")
  }

  test("unmapped directives pass through as literals; week-based fields fail at translation") {
    assert(sparkSide("%C", T1) === "%C") // century: documented passthrough
    Seq("%u", "%G", "%V").foreach { f =>
      val e = intercept[IllegalArgumentException](RubyStrftime.toSparkPattern(f))
      assert(e.getMessage.contains("week-based"), s"$f: ${e.getMessage}")
    }
  }
}
