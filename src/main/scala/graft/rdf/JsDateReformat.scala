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
  * JS `Date` parsing is emulated from differential probes against node
  * v20 (`scripts/probe-jsdate.js` regenerates the expectation table;
  * JsDateReformatSpec pins it). V8 layers two parsers and the emulation
  * mirrors both:
  *
  *   - the STRICT ES5/ISO parser runs first and is the only one that
  *     takes a `T` separator: padded 4-digit year (or signed 6-digit
  *     expanded year), padded 2-digit fields, zone attached with no
  *     intervening space ("2023-5-4T3:7", "2023-05-04T9:20",
  *     "2023-05-04T10:20:30 Z" are Invalid Date), lowercase `t`/`z`
  *     accepted, offsets `±HH:MM`/`±HHMM` with hour ≤ 23, minute ≤ 59.
  *     Its DATE-ONLY form (`YYYY-MM[-DD]`, dashes, padded, no zone) also
  *     wins over the legacy parser: years are literal there, which is
  *     observable for zero-padded small years — "0099-01-01" is year 99
  *     but "0099-1" or "0099-01-01Z" fall through to the legacy parser
  *     and map to 1999, and "0013-01-02" is year 13 while any non-ES5
  *     spelling of it ("0013-1-2", "0013/01/02", "0013-01-02Z") is
  *     Invalid because legacy routes leading 13 to a month.
  *   - the LEGACY parser handles everything else. A leading numeric
  *     field routes by VALUE (leading zeros ignored — "0000012-01-01"
  *     is Dec 1): 1-12 → month-first (day next, then an optional year,
  *     default 2001 — "12-01" is Dec 1 2001, "12" alone is Dec 2001);
  *     0 or ≥ 32 → year-first (month, day optional); 13-31 → Invalid
  *     ("13-01-02", "31" alone). Years map by value ONLY here: 0-49 →
  *     2000s, 50-99 → 1900s, ≥ 100 literal ("5/4/23" and "5/4/0023" →
  *     2023, "99-01-01" → 1999, "999-01-01" → 999). Date fields join on
  *     exactly one of `-`/`/`/`.` (mixing allowed) or any run of
  *     space/comma ("2023 05 04", "12,01" parse; "5--4--2023" doesn't);
  *     non-leading fields take unlimited leading zeros
  *     ("5/0000004/2023"). English month names take the same value
  *     routing for their companion numbers in first-wins order
  *     ("May 4" → day 4 year 2001, "May 32" → May 2032 day 1,
  *     "May 2023 4" → year 2023 day 4, "May 0023" → day 23, "32 May" →
  *     2032, "12-May-2023" → May 12); a missing year defaults to 2001.
  *     The time needs a whitespace/comma junction ("May 4,10:20",
  *     "2023-05-04, 10:20" parse; "2023-05-04-10:20" is Invalid) and
  *     takes a detached case-insensitive am/pm suffix with hour 0-12
  *     ("10:20 pm" is 22:20, "12:20 am" is 0:20, "0:20 pm" is 12:20;
  *     "10:20pm" and "13:20 pm" are Invalid). Times are 1-2-digit
  *     fields with optional fraction. Zones: `Z`/`z` attach anywhere;
  *     the zone WORDS (GMT/UT/UTC and the US abbreviations
  *     EST/EDT/CST/CDT/MST/MDT/PST/PDT, any case, with their real
  *     offsets) attach after a bare date ("2023-05-04PST") but need a
  *     space after a time ("...10:20:30GMT" is Invalid); numeric
  *     offsets `±H[H][:M[M]]` / `±HMM` / `±HHMM` (unbounded hours,
  *     minute ≤ 59) attach freely but require a time to be present
  *     ("2023-05-04 +02:00" is Invalid, "2023-05-04 Z" parses).
  *
  * Deviation (documented): the reference renders fields in the
  * container's local time zone; we pin to UTC for determinism.
  *
  * Documented residuals (machine-checked in JsDateReformatSpec): node
  * tolerates leading separator garbage ("- 2023-05-04"), a LEADING
  * am/pm keyword ("pm May 4 2023") and a duplicated one
  * ("... 10:20 pm pm") — all Invalid here; under-acceptance, the safe
  * direction. The fuzz band in scripts/probe-jsdate.js is the
  * watchlist for forms outside the corpus.
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
  //     ("2023-1-1 24:00" → Jan 2, "2023-05-04T24:00" → May 5);
  //     minute/second are strict 0-59 ("23:60" → Invalid).
  private def build(y: Int, m: Int, d: Int, h: Int, mi: Int, sec: Int,
      offsetMin: Option[Int]): Option[ZonedDateTime] = {
    if (m < 1 || m > 12 || d < 1 || d > 31 || h < 0 || h > 24 ||
        mi < 0 || mi > 59 || sec < 0 || sec > 59) None
    else if (h == 24 && (mi != 0 || sec != 0)) None
    else {
      val local = LocalDate.of(y, m, 1).plusDays(d - 1L)
        .atStartOfDay.plusHours(h).plusMinutes(mi).plusSeconds(sec)
      // an offset of +HH:MM means instant = local - offset; legacy offsets
      // exceed ZoneOffset's ±18h range ("-99" parses), so shift directly
      val zoned = local.minusMinutes(offsetMin.getOrElse(0).toLong)
        .atZone(ZoneOffset.UTC)
      // JS Date range: ±1e8 days (8.64e15 ms) from the epoch —
      // "275761-01-01" is Invalid Date while 275760 still parses
      if (math.abs(zoned.toInstant.toEpochMilli) > 8_640_000_000_000_000L) None
      else Some(zoned)
    }
  }

  /** Legacy-parser numeric offset: `±H[H][:M[M]]` (hour unbounded,
    * minute ≤ 59: "+2:3" → +02:03, "-99" parses) or colon-less `±HMM` /
    * `±HHMM` ("+020" → +00:20, "+2459" → +24:59). None = Invalid Date. */
  private def legacyOffset(tok: String): Option[Int] = {
    val sign = if (tok.head == '-') -1 else 1
    val body = tok.tail
    val (h, m) =
      if (body.contains(":")) {
        val Array(a, b) = body.split(":")
        (a.toInt, b.toInt)
      } else if (body.length <= 2) (body.toInt, 0)
      else (body.toInt / 100, body.toInt % 100)
    if (m > 59) None else Some(sign * (h * 60 + m))
  }

  /** Zone words the legacy parser resolves, with real offsets in
    * minutes (probe-verified: "... 10:20:30 EST" lands at UTC-5). */
  private val namedZoneMin: Map[String, Int] = Map(
    "Z" -> 0, "GMT" -> 0, "UT" -> 0, "UTC" -> 0,
    "EST" -> -300, "EDT" -> -240, "CST" -> -360, "CDT" -> -300,
    "MST" -> -420, "MDT" -> -360, "PST" -> -480, "PDT" -> -420)

  /** V8's keyword table matches a month word by its FIRST THREE letters
    * alone (probe-verified: "Juneish 4 2023", "mayonnaise 4 2023" and
    * "Janz 4 2023" all parse — whatever follows the 3-letter prefix is
    * ignored; 1-2-letter words never match: "Ma 4 2023" is Invalid). */
  private val monthNum: Map[String, Int] =
    Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
      .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap

  /** Legacy-parser year mapping, by value: 0-49 → 2000s, 50-99 → 1900s,
    * ≥ 100 literal. Never applies inside the strict ES5 branch. */
  private def legacyYear(y: Int): Int =
    if (y < 50) 2000 + y else if (y < 100) 1900 + y else y

  /** Leading weekday tokens (probe-pinned): any word starting with a
    * weekday abbreviation, separated by `.`/`,`/whitespace in any mix
    * ("Sat,May", "Sat. May", "sat,sun,May" all strip; "SatMay"/"Sat4"
    * have no separator and stay, parsing as Invalid like node). Bare
    * leading commas are tolerated too (",May 4 2023" parses in node). */
  private val weekdayPrefix =
    ("(?i)^[\\s,]*(?:(?:sun|mon|tue|wed|thu|fri|sat)[a-z]*" +
      "(?:[.,][\\s,]*|[\\s,]+))*").r

  // --- strict ES5/ISO parser (the only branch that takes a T separator;
  //     its date-only form wins over legacy for exact YYYY-MM[-DD]) ---
  private val isoTimeRe =
    ("^([+-]\\d{6}|\\d{4})-(\\d{2})-(\\d{2})[Tt](\\d{2}):(\\d{2})" +
      "(?::(\\d{2})(?:\\.\\d+)?)?(?:([Zz])|([+-]\\d{2}):?(\\d{2}))?$").r
  private val isoDateRe =
    "^([+-]\\d{6}|\\d{4})(?:-(\\d{2})(?:-(\\d{2}))?)?$".r

  // --- legacy parser ---
  private val zoneWords = "GMT|UTC|UT|EST|EDT|CST|CDT|MST|MDT|PST|PDT"
  // Z/z attach anywhere; zone words capture their leading whitespace so
  // the attach-after-time rule can be enforced in code ("...30GMT" is
  // Invalid, "2023-05-04GMT" parses); numeric offsets attach freely but
  // require a time (enforced in code), lenient widths (see legacyOffset)
  private val zoneTail =
    s"(?:\\s*([Zz])|(\\s*(?i:$zoneWords))|\\s*([+-]\\d{1,2}:\\d{1,2}|[+-]\\d{1,4}))?"
  // the time needs a whitespace/comma junction ("2023-05-04-10:20" is
  // Invalid while "2023-05-04, 10:20" and "May 4,10:20" parse); an
  // optional DETACHED am/pm suffix follows ("10:20 pm" parses,
  // "10:20pm" and "10 pm" don't) — hour bound and mapping in legacy()
  private val timePat =
    "[\\s,]+(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(?:\\.\\d+)?)?" +
      "(?:\\s+([AaPp][Mm]))?"
  // date fields join on exactly ONE of -/. or any RUN of space/comma
  // ("2023 05 04", "12,01" and "May-4-2023" parse; "5--4--2023" and
  // "May 4 - 2023" are Invalid)
  private val junction = "(?:[-/.]|[\\s,]+)"

  // numeric date: 1-3 fields; the leading field routes by VALUE in code
  // (month-first 1-12, year-first 0 / ≥32, Invalid 13-31), non-leading
  // fields take unlimited leading zeros ("2023-0000000001-01" parses)
  private val numRe =
    ("^([+-]\\d{6}|\\d{1,10})(?:" + junction + "(\\d{1,10})(?:" + junction +
      "(\\d{1,10}))?)?(?:" + timePat + ")?" + zoneTail + "$").r
  // month-name forms: companion numbers route by value in code
  // (1-31 → day, else a year); missing year defaults to 2001
  private val nameDayRe =
    ("^([A-Za-z]+)\\.?" + junction + "(\\d{1,9})(?:" + junction +
      "(\\d{1,9}))?(?:" + timePat + ")?" + zoneTail + "$").r
  private val dayNameRe =
    ("^(\\d{1,9})" + junction + "([A-Za-z]+)\\.?(?:" + junction +
      "(\\d{1,9}))?(?:" + timePat + ")?" + zoneTail + "$").r

  /** Parse a captured numeric field; values beyond Int range clamp high
    * so the month/day/year bound checks reject them. */
  private def num(s: String, default: Int = 0): Int =
    if (s == null || s.isEmpty) default
    else {
      val v = s.toLong
      if (v > Int.MaxValue) Int.MaxValue else v.toInt
    }

  /** Resolve the three zoneTail captures (Z/z, word with its leading
    * whitespace, numeric offset) plus time-presence into
    * Right(Some(offset-minutes)) / Right(None) (no zone), or Left(()) =
    * Invalid Date: a numeric offset without a time, a zone WORD attached
    * directly after a time, or an out-of-range offset. */
  private def legacyZone(zl: String, zw: String, zn: String,
      hasTime: Boolean): Either[Unit, Option[Int]] =
    if (zn != null && zn.nonEmpty) {
      if (!hasTime) Left(())
      else legacyOffset(zn).toRight(()).map(Some(_))
    } else if (zw != null && zw.nonEmpty) {
      if (hasTime && !zw.head.isWhitespace) Left(())
      else Right(Some(namedZoneMin(zw.trim.toUpperCase(Locale.ROOT))))
    } else if (zl != null && zl.nonEmpty) Right(Some(0))
    else Right(None)

  /** Resolve a month-name form's two companion numbers to (year, day) by
    * value: with both present the 1-31 one is the day and the other the
    * (mapped) year in first-wins order ("May 4 01" → day 4 year 2001,
    * "May 2023 4" and "May 32 4" → year first, day second); with one, a
    * 1-31 value is a day in 2001, anything else a year with day 1
    * ("May 4" → 2001-05-04, "May 32" → 2032-05-01, "May 0" → 2000). */
  private def nameFields(v2: Int, f3: String): (Int, Int) =
    if (f3 != null) {
      if (v2 >= 1 && v2 <= 31) (legacyYear(num(f3)), v2)
      else (legacyYear(v2), num(f3))
    } else if (v2 >= 1 && v2 <= 31) (2001, v2)
    else (legacyYear(v2), 1)

  /** Emulates `new Date(value)` for the supported subset; fields are read
    * in UTC (see class doc). Returns None for JS "Invalid Date". */
  def parse(raw: String): Option[ZonedDateTime] = {
    val s = weekdayPrefix.replaceFirstIn(raw.trim, "")
    if (s.isEmpty) return None
    def month(name: String): Option[Int] =
      if (name.length < 3) None
      else monthNum.get(name.take(3).toLowerCase(Locale.ENGLISH))
    def legacy(y: Int, m: Int, d: Int, h: String, mi: String, sec: String,
        ap: String, zl: String, zw: String, zn: String): Option[ZonedDateTime] =
      legacyZone(zl, zw, zn, hasTime = h != null && h.nonEmpty) match {
        case Left(_) => None
        case Right(off) =>
          // am/pm (probe-pinned): hour must be 0-12 ("13:20 pm" and
          // "24:00 am" are Invalid); pm maps h%12+12 ("0:20 pm" and
          // "12:20 pm" are 12:20), am maps h%12 ("12:20 am" is 0:20)
          val h0 = num(h)
          val hAdj =
            if (ap == null || ap.isEmpty) Some(h0)
            else if (h0 > 12) None
            else if (ap.charAt(0) == 'p' || ap.charAt(0) == 'P') Some(h0 % 12 + 12)
            else Some(h0 % 12)
          hAdj.flatMap(hv => build(y, m, d, hv, num(mi), num(sec), off))
      }
    try s match {
      case isoTimeRe(y, m, d, h, mi, sec, zl, offH, offM) =>
        // ES5 offsets: hour ≤ 23, minute ≤ 59 ("+24:00" is Invalid)
        val off: Either[Unit, Option[Int]] =
          if (offH != null && offH.nonEmpty) {
            val oh = num(offH.substring(1))
            val om = num(offM)
            if (oh > 23 || om > 59) Left(())
            else Right(Some((if (offH.head == '-') -1 else 1) * (oh * 60 + om)))
          } else if (zl != null && zl.nonEmpty) Right(Some(0))
          else Right(None)
        off match {
          case Left(_)  => None
          case Right(o) => build(num(y), num(m), num(d), num(h), num(mi), num(sec), o)
        }
      case isoDateRe(y, m, d) => // literal year — no legacy mapping
        build(num(y), num(m, 1), num(d, 1), 0, 0, 0, None)
      case numRe(f1, f2, f3, h, mi, sec, ap, zl, zw, zn) =>
        if (f1.head == '+' || f1.head == '-') // signed expanded year
          legacy(f1.toInt, num(f2, 1), num(f3, 1), h, mi, sec, ap, zl, zw, zn)
        else {
          val v1 = num(f1)
          if (v1 >= 1 && v1 <= 12) { // month-first: M[-d[-y]]
            val y = if (f3 == null) 2001 else legacyYear(num(f3))
            legacy(y, v1, num(f2, 1), h, mi, sec, ap, zl, zw, zn)
          } else if (v1 == 0 || v1 >= 32) // year-first: y[-m[-d]]
            legacy(legacyYear(v1), num(f2, 1), num(f3, 1), h, mi, sec, ap, zl, zw, zn)
          else None // 13-31: a day with no month to attach to
        }
      case nameDayRe(name, f2, f3, h, mi, sec, ap, zl, zw, zn) =>
        month(name).flatMap { m =>
          val (y, d) = nameFields(num(f2), f3)
          legacy(y, m, d, h, mi, sec, ap, zl, zw, zn)
        }
      case dayNameRe(f1, name, f3, h, mi, sec, ap, zl, zw, zn) =>
        month(name).flatMap { m =>
          val (y, d) = nameFields(num(f1), f3)
          legacy(y, m, d, h, mi, sec, ap, zl, zw, zn)
        }
      case _ => None
    } catch { case _: Exception => None } // out-of-range fields etc.
  }
}
