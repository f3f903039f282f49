package graft.rdf

import java.time._
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Re-format a date/dateTime lexical form the way the reference's repair
  * stage does (lib/fixTriple.js:148-162, 197-214): parse with JS
  * `new Date(value)`, then emit
  *
  *   - date:      `${year}-${month}-${day}`            (fixTriple.js:156)
  *   - dateTime:  `${year}-${month}-${day}T${h}:${m}:${s}` (fixTriple.js:208)
  *
  * with the reference's quirk preserved exactly: the month is zero-padded
  * only for January–September (`date.getMonth() < 9 ? pad : raw`,
  * fixTriple.js:153-154) while day/hour/minute/second are never padded —
  * so `2023-05-04` repairs to `2023-05-4`.
  *
  * JS `Date` parsing is emulated for the formats that actually occur in
  * harvested data: ISO 8601 (date-only, and date-time with optional zone)
  * plus the common legacy forms (`yyyy/M/d`, `M/d/yyyy`, English month
  * names). Deviation (documented): the reference renders fields in the
  * container's local time zone; we pin to UTC for determinism.
  *
  * Not codegen'd (CodegenFallback) — this only runs on the small `invalid`
  * partition, never in the bulk path.
  */
case class JsDateReformat(child: Expression, withTime: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (withTime) "js_datetime_reformat" else "js_date_reformat"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    JsDateReformat.parse(s) match {
      case Some(zdt) =>
        // fixTriple.js:152-156 / 201-208 — month padded iff getMonth() < 9.
        val month =
          if (zdt.getMonthValue <= 9) f"0${zdt.getMonthValue}%d"
          else zdt.getMonthValue.toString
        val out =
          if (withTime)
            s"${zdt.getYear}-$month-${zdt.getDayOfMonth}T" +
              s"${zdt.getHour}:${zdt.getMinute}:${zdt.getSecond}"
          else s"${zdt.getYear}-$month-${zdt.getDayOfMonth}"
        UTF8String.fromString(out)
      case None => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): JsDateReformat =
    copy(child = newChild)
}

object JsDateReformat {
  def date(c: Column): Column = toColumn(JsDateReformat(toExpr(c), withTime = false))
  def dateTime(c: Column): Column = toColumn(JsDateReformat(toExpr(c), withTime = true))

  private val legacyFormats: Seq[DateTimeFormatter] = Seq(
    // V8's fallback parser also takes unpadded dash dates ('2023-5-4')
    "yyyy-M-d",
    "yyyy/M/d", "M/d/yyyy",
    "MMMM d, yyyy", "MMMM d yyyy", "MMM d, yyyy", "MMM d yyyy",
    "d MMMM yyyy", "d MMM yyyy")
    .map(p => DateTimeFormatter.ofPattern(p, Locale.ENGLISH))

  private val legacyDateTimeFormats: Seq[DateTimeFormatter] = Seq(
    // V8 accepts a space in place of the ISO 'T', with optional seconds
    "yyyy-M-d H:m:s", "yyyy-M-d H:m", "yyyy-M-d'T'H:m:s", "yyyy-M-d'T'H:m",
    "yyyy/M/d H:m:s", "M/d/yyyy H:m:s",
    "MMMM d, yyyy H:m:s", "MMM d yyyy H:m:s")
    .map(p => DateTimeFormatter.ofPattern(p, Locale.ENGLISH))

  /** Emulates `new Date(value)` for the supported subset; fields are read
    * in UTC (see class doc). Returns None for JS "Invalid Date". */
  def parse(raw: String): Option[ZonedDateTime] = {
    val s = raw.trim
    if (s.isEmpty) return None
    def attempt[A](f: => ZonedDateTime): Option[ZonedDateTime] =
      try Some(f) catch { case _: Exception => None }

    // ISO date-only — JS treats as UTC midnight.
    attempt(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC))
      // ISO instant with zone/offset.
      .orElse(attempt(OffsetDateTime.parse(s).atZoneSameInstant(ZoneOffset.UTC)))
      .orElse(attempt(Instant.parse(s).atZone(ZoneOffset.UTC)))
      // ISO local date-time, no zone.
      .orElse(attempt(LocalDateTime.parse(s).atZone(ZoneOffset.UTC)))
      .orElse(legacyDateTimeFormats.view.flatMap(f =>
        attempt(LocalDateTime.parse(s, f).atZone(ZoneOffset.UTC))).headOption)
      .orElse(legacyFormats.view.flatMap(f =>
        attempt(LocalDate.parse(s, f).atStartOfDay(ZoneOffset.UTC))).headOption)
  }
}
