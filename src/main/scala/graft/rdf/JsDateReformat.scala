package graft.rdf

import java.time._
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

  // V8 `new Date(string)` numeric rules, established by differential
  // probes against node v20 (JsDateReformatSpec pins the corpus):
  //   - month is STRICT 1-12 (no rollover: "2023-13-01" → Invalid Date);
  //   - day is syntactically 1-31, but overflow within that range ROLLS
  //     into the next month ("2023-02-30" → Mar 2, "2023-11-31" → Dec 1,
  //     "2023-1-40" → Invalid);
  //   - hour 0-24 where 24 requires :00(:00) and rolls to the next day
  //     ("2023-1-1 24:00" → Jan 2); minute/second are strict 0-59
  //     ("23:60" → Invalid);
  //   - year-only ("2023") and year-month ("2023-05") parse to Jan 1 /
  //     the 1st; an English weekday prefix ("Sat May 4 2023") is
  //     ignored; separators -, /, . are interchangeable in y-m-d forms.
  private def build(y: Int, m: Int, d: Int, h: Int, mi: Int, sec: Int,
      offset: Option[ZoneOffset]): Option[ZonedDateTime] = {
    if (m < 1 || m > 12 || d < 1 || d > 31 || h < 0 || h > 24 ||
        mi < 0 || mi > 59 || sec < 0 || sec > 59) None
    else if (h == 24 && (mi != 0 || sec != 0)) None
    else {
      val local = LocalDate.of(y, m, 1).plusDays(d - 1L)
        .atStartOfDay.plusHours(h).plusMinutes(mi).plusSeconds(sec)
      val zoned = offset match {
        case Some(off) => local.atOffset(off).atZoneSameInstant(ZoneOffset.UTC)
        case None      => local.atZone(ZoneOffset.UTC)
      }
      // JS Date range: ±1e8 days (8.64e15 ms) from the epoch —
      // "275761-01-01" is Invalid Date while 275760 still parses
      if (math.abs(zoned.toInstant.toEpochMilli) > 8_640_000_000_000_000L) None
      else Some(zoned)
    }
  }

  private def zoneOf(z: String): Option[ZoneOffset] =
    Option(z).filter(_.nonEmpty).map {
      case "Z" => ZoneOffset.UTC
      case s   => ZoneOffset.of(if (s.contains(":")) s
        else s.substring(0, 3) + ":" + s.substring(3))
    }

  private val monthNum: Map[String, Int] = {
    val full = Seq("january", "february", "march", "april", "may", "june",
      "july", "august", "september", "october", "november", "december")
    (full.zipWithIndex.map { case (n, i) => n -> (i + 1) } ++
      full.zipWithIndex.map { case (n, i) => n.take(3) -> (i + 1) } :+
      ("sept" -> 9)).toMap
  }

  private val weekdayPrefix =
    "(?i)^(?:sun|mon|tue|wed|thu|fri|sat)[a-z]*,?\\s+".r
  // year-first forms take 3-6 year digits ("999-01-01" and
  // "12023-01-01" both parse; 7 digits is Invalid) and tolerate
  // leading-zero field padding ("2023-005-04"); 1-2 leading digits flip
  // V8 into month-first parsing ("99-01-01" → 1999, "9-01-01" → Sep 1
  // 2001) — out of scope, documented residual (never a harvested form)
  private val ymdRe =
    "^(\\d{3,6})(?:[-/.](\\d{1,3})(?:[-/.](\\d{1,3}))?)?$".r
  private val ymdTimeRe =
    ("^(\\d{3,6})[-/.](\\d{1,3})[-/.](\\d{1,3})[T ]" +
      "(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.\\d+)?)?\\s*" +
      "(Z|[+-]\\d{2}:?\\d{2})?$").r
  private val mdyRe =
    "^(\\d{1,2})/(\\d{1,2})/(\\d{4})(?:[ ](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}))?)?$".r
  private val nameDayRe =
    ("^([A-Za-z]+)\\.? (\\d{1,2}),? (\\d{4})" +
      "(?: (\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}))?)?$").r
  private val dayNameRe =
    ("^(\\d{1,2}) ([A-Za-z]+),? (\\d{4})" +
      "(?: (\\d{1,2}):(\\d{1,2})(?::(\\d{1,2}))?)?$").r

  private def num(s: String, default: Int = 0): Int =
    if (s == null || s.isEmpty) default else s.toInt

  /** Emulates `new Date(value)` for the supported subset; fields are read
    * in UTC (see class doc). Returns None for JS "Invalid Date". */
  def parse(raw: String): Option[ZonedDateTime] = {
    val s = weekdayPrefix.replaceFirstIn(raw.trim, "")
    if (s.isEmpty) return None
    def month(name: String): Option[Int] =
      monthNum.get(name.toLowerCase(Locale.ENGLISH))
    try s match {
      case ymdTimeRe(y, m, d, h, mi, sec, z) =>
        build(num(y), num(m), num(d), num(h), num(mi), num(sec), zoneOf(z))
      case ymdRe(y, m, d) =>
        build(num(y), num(m, 1), num(d, 1), 0, 0, 0, None)
      case mdyRe(m, d, y, h, mi, sec) =>
        build(num(y), num(m), num(d), num(h), num(mi), num(sec), None)
      case nameDayRe(name, d, y, h, mi, sec) =>
        month(name).flatMap(m =>
          build(num(y), m, num(d), num(h), num(mi), num(sec), None))
      case dayNameRe(d, name, y, h, mi, sec) =>
        month(name).flatMap(m =>
          build(num(y), m, num(d), num(h), num(mi), num(sec), None))
      case _ => None
    } catch { case _: Exception => None } // out-of-range ZoneOffset etc.
  }
}
