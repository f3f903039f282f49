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
  *     fields with optional fraction; an out-of-range or 3+-digit
  *     minute/second/offset-minute DEMOTES to a date component
  *     ("May 4 10:20:60" is year 1960 at 10:20, "10:20 +02:60" is zone
  *     +02 with component 60) and a dot-number after a demoted field
  *     fills the next empty time slot ("10:123.5" is 10:05:00); a sign
  *     ATTACHED to a trailing component is a separator, not a zone
  *     ("Jan4 10:20 99-0500" has components 99/500). Zones: `Z`/`z`
  *     attach anywhere;
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
  * The standard JS serialization round-trips are covered: asctime
  * ("Sat May 4 10:20:30 2023" — ONE date component may follow the time
  * and fills the year slot; when the year is already present it is
  * ignored, mirroring V8's 3-slot composer, and a 4th component is
  * Invalid), Date.toString ("Thu Jan 01 1970 00:00:00 GMT+0000
  * (Coordinated Universal Time)" — zone words take an attached numeric
  * offset that OVERRIDES the word, even date-only, and trailing
  * parentheticals are skipped), and toUTCString/RFC-1123.
  *
  * Documented residuals (machine-checked in JsDateReformatSpec — each
  * listed form is Invalid here while node parses it; under-acceptance,
  * the safe direction): node additionally tolerates mid-string
  * parentheticals ("May 4 (x) 2023"), lets date components interleave
  * the time entirely freely ("05 10:20 04 2023", "10:20 May 4 2023"),
  * reassigns the month word mid-stream (last wins: "May 4 Jun 2023"),
  * chains dot-numbers after a demoted second ("10:20:60.5.3"), and
  * forgives separator edges around trailing components ("99--0500").
  * Leading garbage/keywords ("- 2023-05-04", "pm May 4 2023") and
  * repeated am/pm runs ("10:20 pm pm", last token wins) are
  * IMPLEMENTED, not residuals. The fuzz band in scripts/probe-jsdate.js
  * is the watchlist for forms outside the corpus.
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
  //     minute/second reaching build() are 0-59 — the legacy grammar
  //     DEMOTES out-of-range values to date components before this
  //     ("May 4 10:20:60" is year 1960; the strict T forms and
  //     3-component dates still reject: "2023-05-04T23:60" and
  //     "2023-05 10:20:60" are Invalid).
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
    * `±HHMM` ("+020" → +00:20, "+2459" → +24:59). An out-of-range or
    * 3+-digit colon-minute DEMOTES to a date component with the hour
    * part kept as the zone ("10:20 +02:60" is zone +02 with component
    * 60 → year 1960; "+02:123" yields component 123). Colon-less
    * minutes ROLL INTO HOURS instead ("+0160" is +120 minutes, "+2465"
    * is 25h05m — node-verified by the corpus rows). Total: every token
    * the zone regex admits resolves to (offset-minutes, demoted
    * component) — no input is Invalid at this stage. */
  private def parseOffset(tok: String): (Int, Option[String]) = {
    val sign = if (tok.head == '-') -1 else 1
    val body = tok.tail
    if (body.contains(":")) {
      val Array(a, b) = body.split(":")
      if (b.length > 2 || b.toInt > 59) (sign * a.toInt * 60, Some(b))
      else (sign * (a.toInt * 60 + b.toInt), None)
    } else {
      val (h, m) =
        if (body.length <= 2) (body.toInt, 0)
        else (body.toInt / 100, body.toInt % 100)
      // colon-less minutes roll into hours, unlike the colon form
      (sign * (h * 60 + m), None)
    }
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

  /** V8's legacy parser skips EVERYTHING before the first digit —
    * weekdays, unknown words, zone words (their offsets dropped:
    * "EST 2023-05-04 10:20" parses at 10:20 plain), am/pm keywords,
    * arbitrary symbols ("$ 2023-05-04", "-2023-05-04", "## ..." all
    * parse) and parenthesized spans, which may swallow digits
    * ("(x) May 4" parses, "(x May 4" and "(2023-05-04)" are Invalid) —
    * while remembering the LAST month-name word seen ("Xyz May 4 2023"
    * is May, "Jun 4" after a skipped "May" would be June). Exceptions:
    * a signed SIX-digit expanded year ("+012023-01-01") is a number,
    * not garbage, and a NON-month word attached directly to a digit is
    * Invalid ("Xyz4"/"Sat4" fail while "Jan4"/"Sept4 2023" parse).
    * Returns (rest-from-first-digit-or-signed-year, last month seen),
    * or None for the attached-word failure. */
  private def stripPrefix(s: String): Option[(String, Option[Int])] = {
    var i = 0
    var preMonth: Option[Int] = None
    while (i < s.length && !s.charAt(i).isDigit) {
      val c = s.charAt(i)
      if (c == '(') {
        val j = s.indexOf(')', i)
        i = if (j < 0) s.length else j + 1
      } else if (c.isLetter) {
        val j0 = i
        while (i < s.length && s.charAt(i).isLetter) i += 1
        val w = s.substring(j0, i)
        val m = if (w.length >= 3)
          monthNum.get(w.take(3).toLowerCase(Locale.ENGLISH)) else None
        if (m.isDefined) preMonth = m
        else if (i < s.length && s.charAt(i).isDigit) return None
      } else if ((c == '+' || c == '-') &&
          i + 6 < s.length && (i + 1 to i + 6).forall(k => s.charAt(k).isDigit) &&
          (i + 7 >= s.length || !s.charAt(i + 7).isDigit)) {
        return Some((s.substring(i), preMonth)) // signed expanded year
      } else i += 1
    }
    Some((s.substring(i), preMonth))
  }

  // --- strict ES5/ISO parser (the only branch that takes a T separator;
  //     its date-only form wins over legacy for exact YYYY-MM[-DD]) ---
  private val isoTimeRe =
    ("^([+-]\\d{6}|\\d{4})-(\\d{2})-(\\d{2})[Tt](\\d{2}):(\\d{2})" +
      "(?::(\\d{2})(?:\\.\\d+)?)?(?:([Zz])|([+-]\\d{2}):?(\\d{2}))?$").r
  private val isoDateRe =
    "^([+-]\\d{6}|\\d{4})(?:-(\\d{2})(?:-(\\d{2}))?)?$".r

  // --- legacy parser ---
  private val zoneWords = "GMT|UTC|UT|EST|EDT|CST|CDT|MST|MDT|PST|PDT"
  // date fields join on exactly ONE of -/. or any RUN of space/comma
  // ("2023 05 04", "12,01" and "May-4-2023" parse; "5--4--2023" and
  // "May 4 - 2023" are Invalid)
  private val junction = "(?:[-/.]|[\\s,]+)"
  // the time needs a whitespace/comma junction ("2023-05-04-10:20" is
  // Invalid while "2023-05-04, 10:20" and "May 4,10:20" parse). An
  // out-of-range or 3+-digit minute/second DEMOTES to a date component
  // instead of failing ("May 4 10:20:60" is year 1960 at 10:20,
  // "May 4 10:60" is 1960 at 10:00, "May 4 10:123" year 123), and a
  // dot-number after a demoted field fills the NEXT empty time slot
  // ("10:123.5" is 10:05:00, "10:20:60.5" is 10:20:05); the hour never
  // demotes ("May 4 60:20" is Invalid)
  private val timePat =
    "(?:(?:[\\s,]+|^)(?<h>\\d{1,2}):" +
      "(?:(?<mi>[0-5]?\\d)(?!\\d)" +
        "(?::(?:(?<sec>[0-5]?\\d)(?!\\d)(?<fr>\\.\\d+)?|" +
          "(?<secd>[6-9]\\d|\\d{3,9})(?:\\.(?:(?<fsec>[0-5]?\\d)(?!\\d)|(?<fsecd>[6-9]\\d|\\d{3,9})))?))?" +
      "|(?<mid>[6-9]\\d|\\d{3,9})(?:\\.(?:(?<fmin>[0-5]?\\d)(?!\\d)|(?<fmind>[6-9]\\d|\\d{3,9})))?))?"
  // post-time tokens: case-insensitive am/pm — possibly REPEATED, each
  // repeat joined by a space/comma run, with the LAST token winning
  // ("10:20 pm pm" is 22:20, "10:20 pm am" is 10:20, "10:20 pm,pm"
  // parses, "10:20 pmpm" is Invalid — node-verified; attachment and
  // hour rules in legacyTail: "10:20 pm" and "10:20:30.5pm" parse,
  // "10:20pm"/"10:20,pm" don't) and ONE more date component, in either
  // order — the year slot of asctime-style serializations
  // ("Sat May 4 10:20:30 2023", "May 4 10:20 2023 pm",
  // "12-01 10:20 2023" all parse; the component is IGNORED when the
  // date already carried its year, mirroring V8's 3-slot composer:
  // "May 4 2023 10:20 2024" parses as 2023). am/pm runs may straddle
  // the component ("10:20 am pm 2023" and "10:20 pm 2023 am" parse,
  // last token winning across both runs).
  // the post-time component may itself be a -/.-joined run: a sign
  // ATTACHED to a trailing component is a separator, not a zone
  // ("Jan4 10:20 99-0500" has components 99 and 500 — the named-month
  // composer ignores the third — while a DETACHED "-0500" stays a zone)
  private val apTok = "[AaPp][Mm]"
  private val postPat =
    s"(?<apA>\\s*$apTok(?:[\\s,]+$apTok)*)?" +
      s"(?:[\\s,]+(?<py>\\d{1,9}(?:[-/.]\\d{1,9}){0,2}))?" +
      s"(?<apB>\\s*$apTok(?:[\\s,]+$apTok)*)?"
  // Z/z attach anywhere; zone WORDS capture their leading whitespace so
  // the attach-directly-after-a-time rule can be enforced in code
  // ("...30GMT" is Invalid, "2023-05-04GMT" parses) and take an optional
  // attached numeric offset that OVERRIDES the word's own
  // ("GMT+0200"/"UTC+2"/"EST+2" are all +2h; "2023-05-04 GMT+2:3"
  // parses even date-only, while a BARE numeric offset still needs a
  // time); bare numeric offsets attach freely with lenient widths
  private val zonePat =
    s"(?:(?<zl>\\s*[Zz])|(?<zw>\\s*(?i:$zoneWords))" +
      "(?<zo>[+-]\\d{1,2}:\\d{1,9}|[+-]\\d{1,4})?|" +
      "\\s*(?<zn>[+-]\\d{1,2}:\\d{1,9}|[+-]\\d{1,4}))?"
  // trailing parentheticals, as in Date.prototype.toString's
  // "(Coordinated Universal Time)": any number at the END, last one may
  // be unclosed; content never nests ("(a) (b)" and "(x" parse,
  // "(foo) x" does not)
  private val parenPat = "(?:[\\s,]*\\([^()]*\\)?)*"
  private val tailPat = timePat + postPat + zonePat + parenPat + "$"

  // numeric date: 1-3 fields; the leading field routes by VALUE in code
  // (month-first 1-12, year-first 0 / >=32, Invalid 13-31), non-leading
  // fields take unlimited leading zeros ("2023-0000000001-01" parses);
  // the tail's post-time component is the third slot when only two
  // fields precede the time ("2023-05 10:20 04" is 2023-05-04)
  // the leading field is optional so a DEMOTED component can be the only
  // one ("10:20:60" is 1960-01-01, "10:20 2023" is 2023-01-01; a bare
  // "10:20" with no component at all stays Invalid — checked in code)
  private val numRe =
    ("^(?:(?<f1>[+-]\\d{6}|\\d{1,10})(?:" + junction + "(?<f2>\\d{1,10})(?:" +
      junction + "(?<f3>\\d{1,10}))?)?)?" + tailPat).r
  // day-first month-name form ("4 May 2023" — a month-led string is
  // instead consumed by [[stripPrefix]] and lands in [[bareMonthRe]]);
  // companion numbers route by value in code (1-31 -> day, else a
  // year); a missing year defaults to 2001
  private val dayNameRe =
    ("^(?<f2>\\d{1,9})" + junction + "(?<nm>[A-Za-z]+)\\.?(?:" + junction +
      "(?<f3>\\d{1,9}))?" + tailPat).r
  // the numeric remainder after a month name captured by [[stripPrefix]]
  // ("May 4 2023", "Sept4 2023", "x y z May 4 10:20")
  private val bareMonthRe =
    ("^(?:(?<f2>\\d{1,9})(?:" + junction + "(?<f3>\\d{1,9}))?)?" + tailPat).r

  /** Parse a captured numeric field; values beyond Int range clamp high
    * so the month/day/year bound checks reject them. */
  private def num(s: String, default: Int = 0): Int =
    if (s == null || s.isEmpty) default
    else {
      val v = s.toLong
      if (v > Int.MaxValue) Int.MaxValue else v.toInt
    }

  /** Resolve the shared legacy tail of a match — time (with fraction
    * and demoted fields), am/pm tokens, trailing date components, zone
    * — to (hour, minute, second, trailing-components-in-order,
    * offset-minutes), or None for Invalid Date: duplicate am/pm, am/pm
    * without a time or with hour > 12, an illegal attachment (see the
    * letter/sign token rules in the body), a bare numeric offset
    * without a time, or an out-of-range offset. */
  private def legacyTail(m: scala.util.matching.Regex.Match):
      Option[(Int, Int, Int, Seq[String], Option[Int])] = {
    val h = m.group("h")
    val hasTime = h != null
    // a demoted minute vacates the minute slot and its dot-number fills
    // it ("10:123.5" is 10:05:00); a demoted second likewise
    // ("10:20:60.5" is 10:20:05)
    val mid = m.group("mid")
    val secd = m.group("secd")
    val mi = if (mid != null) num(m.group("fmin")) else num(m.group("mi"))
    val sec = if (secd != null) num(m.group("fsec")) else num(m.group("sec"))
    val fracTrue = m.group("fr") != null
    // a dot-number that FILLS a time slot ("10:123.5" → minute 5) is a
    // time field for attachment purposes, unlike a true fraction
    val slotFill = m.group("fsec") != null || m.group("fmin") != null
    // a demoted number with no slot-filler is a date COMPONENT — letter
    // tokens attach to it ("10:20:60pm" and "10:20:60GMT" parse;
    // "10:123.5pm" and "10:123.5GMT" are Invalid)
    val demotedLast = (secd != null || mid != null) && !slotFill
    val py = Option(m.group("py"))
    val apA = m.group("apA")
    val apB = m.group("apB")
    // repeated am/pm tokens are tolerated and the LAST one (textually —
    // an apB run follows an apA run) decides the meridiem; tokens of a
    // run need a space/comma junction between them — with no component
    // in between, an attached apB is really "pmpm", which node rejects
    if (apA != null && py.isEmpty && apB != null && !apB.charAt(0).isWhitespace)
      return None
    val apRaw = if (apB != null) apB else apA
    if (apRaw != null && !hasTime) return None
    def attached(t: String) = t != null && !t.charAt(0).isWhitespace
    // LETTER tokens attach to date components and fractions but not to
    // time fields or other words; single-letter Z also attaches to time
    // fields; SIGN tokens attach anywhere (probe-pinned:
    // "10:20:30.5pm", "10:20 2023pm", "10:20:30Z", "pm+02" parse;
    // "10:20pm", "10:20:30GMT", "pmZ", "pmGMT" are Invalid)
    if (apA != null && attached(apA) && !fracTrue && !demotedLast)
      return None
    // am/pm (probe-pinned): hour must be 0-12 ("13:20 pm" and
    // "24:00 am" are Invalid); pm maps h%12+12 ("0:20 pm" and
    // "12:20 pm" are 12:20), am maps h%12 ("12:20 am" is 0:20)
    val h0 = num(h)
    val hAdj =
      if (apRaw == null) h0
      else if (h0 > 12) return None
      else {
        // each token is exactly two letters and a run ends with one, so
        // the last token's a/p sits at length-2
        val c = apRaw.charAt(apRaw.length - 2)
        if (c == 'p' || c == 'P') h0 % 12 + 12 else h0 % 12
      }
    // what the zone token would attach to: a word (am/pm), a date
    // component, or a bare time field
    val lastIsWord = apB != null || (apA != null && py.isEmpty)
    val lastIsTimeField = hasTime && apRaw == null && py.isEmpty &&
      (slotFill || (!fracTrue && secd == null && mid == null))
    val zl = m.group("zl")
    val zw = m.group("zw")
    val zn = m.group("zn")
    var zoneComp: Option[String] = None
    val off: Option[Int] =
      if (zl != null) {
        if (attached(zl) && lastIsWord) return None
        Some(0)
      } else if (zw != null) {
        if (attached(zw) && (lastIsWord || lastIsTimeField)) return None
        val zo = m.group("zo")
        if (zo != null) {
          val (o, d) = parseOffset(zo); zoneComp = d; Some(o)
        } else Some(namedZoneMin(zw.trim.toUpperCase(Locale.ROOT)))
      } else if (zn != null) {
        if (!hasTime) return None
        val (o, d) = parseOffset(zn); zoneComp = d; Some(o)
      } else None
    // trailing components in textual order: a demoted time field, then
    // the -/.-joined post-time run, then a zone-demoted minute
    val comps = Seq(Option(mid), Option(m.group("fmind")), Option(secd),
      Option(m.group("fsecd"))).flatten ++
      py.toSeq.flatMap(_.split("[-/.]").toSeq) ++ zoneComp.toSeq
    Some((hAdj, mi, sec, comps, off))
  }

  /** Resolve a month-name form's two companion numbers to (year, day) by
    * value: with both present the 1-31 one is the day and the other the
    * (mapped) year in first-wins order ("May 4 01" -> day 4 year 2001,
    * "May 2023 4" and "May 32 4" -> year first, day second); with one, a
    * 1-31 value is a day in 2001, anything else a year with day 1
    * ("May 4" -> 2001-05-04, "May 32" -> 2032-05-01, "May 0" -> 2000). */
  private def nameFields(v2: Int, f3: String): (Int, Int) =
    if (f3 != null) {
      if (v2 >= 1 && v2 <= 31) (legacyYear(num(f3)), v2)
      else (legacyYear(v2), num(f3))
    } else if (v2 >= 1 && v2 <= 31) (2001, v2)
    else (legacyYear(v2), 1)

  /** Emulates `new Date(value)` for the supported subset; fields are read
    * in UTC (see class doc). Returns None for JS "Invalid Date". */
  def parse(raw: String): Option[ZonedDateTime] = {
    val s = raw.trim
    if (s.isEmpty) return None
    def month(name: String): Option[Int] =
      if (name.length < 3) None
      else monthNum.get(name.take(3).toLowerCase(Locale.ENGLISH))
    // a regex match commits to its branch: a semantic failure inside it
    // is Invalid Date, never a fall-through to the next form
    // shared month-name composition: companion numbers in order; the
    // name takes the month slot so only two are used — a third is
    // IGNORED, as V8's 3-slot composer does ("May 4 2023 10:20 2024"
    // is 2023) — a FOURTH is one too many, and none at all is Invalid
    def monthComps(mo: Int, m: scala.util.matching.Regex.Match,
        h: Int, mi: Int, sec: Int, tail: Seq[String],
        off: Option[Int]): Option[ZonedDateTime] = {
      val comps = Option(m.group("f2")).toSeq ++ Option(m.group("f3")) ++ tail
      if (comps.isEmpty || comps.size > 3) None
      else {
        val (y, d) = nameFields(num(comps.head), comps.lift(1).orNull)
        build(y, mo, d, h, mi, sec, off)
      }
    }
    def numCase(m: scala.util.matching.Regex.Match): Option[ZonedDateTime] =
      legacyTail(m).flatMap { case (h, mi, sec, tail, off) =>
        val f1 = m.group("f1")
        if (f1 != null && (f1.charAt(0) == '+' || f1.charAt(0) == '-')) {
          // signed expanded year
          if (tail.nonEmpty) None
          else build(f1.toInt, num(m.group("f2"), 1), num(m.group("f3"), 1),
            h, mi, sec, off)
        } else {
          // positional components, the time transparent to them
          // ("2023-05 10:20 04" === "2023-05-04 10:20"); 4 of them are
          // one too many ("2023-05-04 10:20:30 2024" is Invalid) and
          // none at all is Invalid ("10:20" alone)
          val comps = Option(f1).toSeq ++ Option(m.group("f2")) ++
            Option(m.group("f3")) ++ tail
          if (comps.isEmpty || comps.size > 3) None
          else {
            val v1 = num(comps.head)
            val c2 = comps.lift(1)
            val c3 = comps.lift(2)
            if (v1 >= 1 && v1 <= 12) { // month-first: M[-d[-y]]
              val y = c3.map(c => legacyYear(num(c))).getOrElse(2001)
              build(y, v1, c2.map(num(_)).getOrElse(1), h, mi, sec, off)
            } else if (v1 == 0 || v1 >= 32) // year-first: y[-m[-d]]
              build(legacyYear(v1), c2.map(num(_)).getOrElse(1),
                c3.map(num(_)).getOrElse(1), h, mi, sec, off)
            else None // 13-31: a day with no month to attach to
          }
        }
      }
    def nameCase(m: scala.util.matching.Regex.Match): Option[ZonedDateTime] =
      month(m.group("nm")).flatMap { mo =>
        legacyTail(m).flatMap { case (h, mi, sec, tail, off) =>
          monthComps(mo, m, h, mi, sec, tail, off)
        }
      }
    try s match {
      case isoTimeRe(y, m, d, h, mi, sec, zl, offH, offM) =>
        // ES5 offsets: hour <= 23, minute <= 59 ("+24:00" is Invalid)
        val off: Either[Unit, Option[Int]] =
          if (offH != null && offH.nonEmpty) {
            val oh = num(offH.substring(1))
            val om = num(offM)
            if (oh > 23 || om > 59) Left(())
            else Right(Some((if (offH.charAt(0) == '-') -1 else 1) * (oh * 60 + om)))
          } else if (zl != null && zl.nonEmpty) Right(Some(0))
          else Right(None)
        off match {
          case Left(_)  => None
          case Right(o) => build(num(y), num(m), num(d), num(h), num(mi), num(sec), o)
        }
      case isoDateRe(y, m, d) => // literal year - no legacy mapping
        build(num(y), num(m, 1), num(d, 1), 0, 0, 0, None)
      case _ =>
        // the strict ES5 branches above see the ORIGINAL string (node:
        // "Xyz 2023-05-04T10:20:30" is Invalid); only the legacy parser
        // tolerates a garbage prefix
        stripPrefix(s).flatMap { case (rest, preMonth) =>
          if (rest.isEmpty) None
          else preMonth match {
            case Some(mo) =>
              bareMonthRe.findFirstMatchIn(rest).map { m =>
                legacyTail(m).flatMap { case (h, mi, sec, tail, off) =>
                  monthComps(mo, m, h, mi, sec, tail, off)
                }
              }.getOrElse(None)
            case None =>
              numRe.findFirstMatchIn(rest).map(numCase)
                .orElse(dayNameRe.findFirstMatchIn(rest).map(nameCase))
                .getOrElse(None)
          }
        }
    } catch { case _: Exception => None } // out-of-range fields etc.
  }
}
