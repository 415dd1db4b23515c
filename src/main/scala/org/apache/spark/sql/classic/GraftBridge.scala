package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge exposing Spark's private[sql] Expression ↔ Column conversions to the
 * graft library (needed to wrap custom Catalyst expressions as user-facing
 * Columns in Spark 4's split Column/ColumnNode API).
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /**
   * EAGER Column → Expression conversion. `expression` returns a lazy
   * `ColumnNodeExpression` placeholder whose `resolved` is TRUE and whose
   * `dataType` is `NullType` until the analyzer swaps it out — any caller
   * that pattern-matches the tree or gates on `resolved && dataType` sees
   * a lie (r16: `fusedJson`'s unsupported-type gate read NullType,
   * classified every unresolved payload struct as unsupported, and
   * silently routed the whole CDC-synth payload family to builtin
   * `to_json`). This converts the ColumnNode immediately, yielding the
   * real (possibly unresolved) Catalyst tree, e.g.
   * `UnresolvedFunction(struct, ...)` for `functions.struct(...)`.
   */
  def eagerExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /**
   * The EXACT timestamp/date formatters `to_json` (JacksonGenerator) uses
   * for write, so the fused JSON encoder's temporal leaves are
   * byte-identical to the builtin by construction: (timestampWriter(µs),
   * timestampNtzWriter(µs), dateWriter(days)). Built from a default
   * JSONOptions at `timeZoneId` — the same construction path
   * JacksonGenerator takes (catalyst/json/JacksonGenerator.scala).
   */
  def jsonTemporalWriters(timeZoneId: String)
      : (Long => String, Long => String, Int => String) = {
    import org.apache.spark.sql.catalyst.json.JSONOptions
    import org.apache.spark.sql.catalyst.util.{DateFormatter, TimestampFormatter}
    import org.apache.spark.sql.catalyst.util.LegacyDateFormats.FAST_DATE_FORMAT
    val opts = new JSONOptions(Map.empty[String, String], timeZoneId, "")
    val ts = TimestampFormatter(opts.timestampFormatInWrite, opts.zoneId,
      opts.locale, legacyFormat = FAST_DATE_FORMAT, isParsing = false)
    val ntz = TimestampFormatter(opts.timestampNTZFormatInWrite, opts.zoneId,
      legacyFormat = FAST_DATE_FORMAT, isParsing = false, forTimestampNTZ = true)
    val date = DateFormatter(opts.dateFormatInWrite)
    (ts.format(_: Long), ntz.format(_: Long), date.format(_: Int))
  }

  /** The session time zone id at plan time (what a TimeZoneAwareExpression
   * would resolve to). */
  def sessionTimeZone: String =
    org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone

  /**
   * The EXACT timestamp-string parse `from_json` (JacksonParser) applies to
   * a string token in a TimestampType field: the default-JSONOptions
   * TimestampFormatter, with the 2.x-compat fallback through
   * `cleanLegacyTimestampStr` + `stringToTimestamp` — so the fused decoder's
   * timestamp leaves are parse-identical to the builtin by construction.
   * Throws on unparseable input (the caller maps that to a null FIELD,
   * PERMISSIVE partial-results semantics).
   */
  def jsonTimestampParser(timeZoneId: String): String => Long = {
    import org.apache.spark.sql.catalyst.json.JSONOptions
    import org.apache.spark.sql.catalyst.util.{DateTimeUtils, TimestampFormatter}
    import org.apache.spark.sql.catalyst.util.LegacyDateFormats.FAST_DATE_FORMAT
    val opts = new JSONOptions(Map.empty[String, String], timeZoneId, "")
    val fmt = TimestampFormatter(opts.timestampFormatInRead, opts.zoneId,
      opts.locale, legacyFormat = FAST_DATE_FORMAT, isParsing = true)
    (s: String) =>
      try fmt.parse(s)
      catch {
        case e if scala.util.control.NonFatal(e) =>
          val str = DateTimeUtils.cleanLegacyTimestampStr(
            org.apache.spark.unsafe.types.UTF8String.fromString(s))
          DateTimeUtils.stringToTimestamp(str, opts.zoneId).getOrElse(throw e)
      }
  }

  /**
   * The EXACT date-string parse `from_json` (JacksonParser) applies to a
   * string token in a DateType field (dates are zone-less): the
   * default-JSONOptions DateFormatter, then the 2.x-compat fallback through
   * `cleanLegacyTimestampStr` + `stringToDate`, then the 1.5-compat
   * days-as-string fallback with the Julian→Gregorian rebase — verified
   * against the 4.1.2 bytecode (JacksonParser makeConverter, DateType arm).
   * Throws on unparseable input (caller maps to a null FIELD).
   */
  def jsonDateParser(): String => Int = {
    import org.apache.spark.sql.catalyst.json.JSONOptions
    import org.apache.spark.sql.catalyst.util.{DateFormatter, DateTimeUtils, RebaseDateTime}
    import org.apache.spark.sql.catalyst.util.LegacyDateFormats.FAST_DATE_FORMAT
    val opts = new JSONOptions(Map.empty[String, String], "UTC", "")
    val fmt = DateFormatter(opts.dateFormatInRead, opts.locale,
      legacyFormat = FAST_DATE_FORMAT, isParsing = true)
    (s: String) =>
      try fmt.parse(s)
      catch {
        case e if scala.util.control.NonFatal(e) =>
          val str = DateTimeUtils.cleanLegacyTimestampStr(
            org.apache.spark.unsafe.types.UTF8String.fromString(s))
          DateTimeUtils.stringToDate(str).getOrElse {
            try RebaseDateTime.rebaseJulianToGregorianDays(s.toInt)
            catch { case _: NumberFormatException => throw e }
          }
      }
  }
}
