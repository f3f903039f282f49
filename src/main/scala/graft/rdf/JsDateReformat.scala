package graft.rdf

import java.time._
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *   - the STRICT ES5/ISO parser runs first as a TOKEN-PREFIX parser
  *     over the same scanner the legacy loop uses: padded 4-digit year
  *     (or signed 6-digit expanded year), padded 2-digit fields, zone
  *     attached with no intervening space ("2023-5-4T3:7",
  *     "2023-05-04T10:20:30 Z" are Invalid Date), lowercase `t`/`z`
  *     accepted, offsets `±HH:MM`/`±HHMM` with hour ≤ 23, minute ≤ 59.
  *     A COMPLETE match is literal ISO ("0099-01-01" is year 99); a
  *     PARTIAL prefix does NOT restart — its numbers stay committed as
  *     legacy date components and the legacy loop continues at the
  *     first unusable token ("0099-01-01 10:20" maps to 1999,
  *     "2023-05:30" is May 30 2023, "0013-01-02 10:20" is Invalid
  *     because committed 13 routes to a day-without-month); any break
  *     AFTER a consumed `T` is a hard Invalid (see
  *     [[JsDateReformat.es5Prefix]]).
  *   - the LEGACY parser is a token scan, reimplemented
  *     decision-for-decision from differential probes (see
  *     [[JsDateReformat.runLegacy]] for the loop and the probe-pinned
  *     rules on each branch).
  *
  * Deviation (documented): the reference renders fields in the
  * container's local time zone; we pin to UTC for determinism.
  *
  * The standard JS serialization round-trips are covered: asctime
  * ("Sat May 4 10:20:30 2023"), Date.toString ("Thu Jan 01 1970
  * 00:00:00 GMT+0000 (Coordinated Universal Time)"), toUTCString /
  * RFC-1123. The r17 token-scan rewrite retired the previous regex
  * grammar's entire residual ledger: mid-string parentheticals, freely
  * interleaved date/time components, month-word reassignment
  * (last wins), chained dot-numbers after a demoted second, tokens
  * after the zone, and separator-edge forms are all parsed the way
  * node parses them, pinned by corpus rows.
  *
  * Codegen: [[JsDateReformat.reformat]] is a pure static function, so
  * `doGenCode` emits a one-line static call (same shape as
  * [[JsUrlParseable]]) and the expression stays inside whole-stage
  * codegen instead of falling back to interpreted eval.
  */
case class JsDateReformat(child: Expression, withTime: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (withTime) "js_datetime_reformat" else "js_date_reformat"

  override def nullSafeEval(input: Any): Any =
    JsDateReformat.reformat(input.asInstanceOf[UTF8String], withTime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.rdf.JsDateReformat.reformat($c, $withTime);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): JsDateReformat =
    copy(child = newChild)
}

object JsDateReformat {
  def date(c: Column): Column = toColumn(JsDateReformat(toExpr(c), withTime = false))
  def dateTime(c: Column): Column = toColumn(JsDateReformat(toExpr(c), withTime = true))

  /** Static entry for both interpreted eval and generated code: parse as
    * JS `new Date` would, format with the reference's field logic, null
    * for Invalid Date. */
  def reformat(input: UTF8String, withTime: Boolean): UTF8String =
    parse(input.toString) match {
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

  // V8 `new Date(string)` numeric rules, established by differential
  // probes against node v20 (JsDateReformatSpec pins the corpus):
  //   - month is STRICT 1-12 (no rollover: "2023-13-01" → Invalid Date);
  //   - day is syntactically 1-31, but overflow within that range ROLLS
  //     into the next month ("2023-02-30" → Mar 2, "2023-11-31" → Dec 1,
  //     "2023-1-40" → Invalid);
  //   - hour 0-24 where 24 requires :00(:00) and rolls to the next day
  //     ("2023-1-1 24:00" → Jan 2, "2023-05-04T24:00" → May 5).
  private def build(y: Int, m: Int, d: Int, h: Int, mi: Int, sec: Int,
      ms: Int, offsetSec: Option[Int]): Option[ZonedDateTime] = {
    if (m < 1 || m > 12 || d < 1 || d > 31 || h < 0 || h > 24 ||
        mi < 0 || mi > 59 || sec < 0 || sec > 59) None
    // hour 24 needs min, sec AND ms zero: "…T24:00:00.000" rolls to the
    // next day while "…T24:00:00.5" is Invalid Date (probe-pinned)
    else if (h == 24 && (mi != 0 || sec != 0 || ms != 0)) None
    else {
      val local = LocalDate.of(y, m, 1).plusDays(d - 1L)
        .atStartOfDay.plusHours(h).plusMinutes(mi).plusSeconds(sec)
      // an offset of +HH:MM means instant = local - offset; legacy offsets
      // exceed ZoneOffset's ±18h range ("-99" parses), so shift directly
      val zoned = local.minusSeconds(offsetSec.getOrElse(0).toLong)
        .atZone(ZoneOffset.UTC)
      // JS Date range: ±1e8 days (8.64e15 ms) from the epoch — INCLUDING
      // the parsed milliseconds: "+275760-09-13T00:00:00.5Z" is Invalid
      // Date in node (the .5 tips it over) while "…T00:00:00.000Z" still
      // parses; output formatting keeps dropping the sub-second part
      if (math.abs(zoned.toInstant.toEpochMilli + ms.toLong) >
          8_640_000_000_000_000L) None
      else Some(zoned)
    }
  }

  /** Zone words the legacy parser resolves, with real offsets in
    * minutes (probe-verified: "... 10:20:30 EST" lands at UTC-5).
    * Matched against the WHOLE lowercased letter run — "GMTx"/"UTCish"
    * are garbage words, unlike month names' 3-letter-prefix rule. */
  private val namedZoneMin: Map[String, Int] = Map(
    "z" -> 0, "gmt" -> 0, "ut" -> 0, "utc" -> 0,
    "est" -> -300, "edt" -> -240, "cst" -> -360, "cdt" -> -300,
    "mst" -> -420, "mdt" -> -360, "pst" -> -480, "pdt" -> -420)

  /** V8's keyword table matches a month word by its FIRST THREE letters
    * alone (probe-verified: "Juneish 4 2023", "mayonnaise 4 2023" and
    * "Janz 4 2023" all parse — whatever follows the 3-letter prefix is
    * ignored; 1-2-letter words never match: "Ma 4 2023" is Invalid). */
  private val monthNum: Map[String, Int] =
    Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
      .zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap

  /** Legacy-parser year mapping, by value: 0-49 → 2000s, 50-99 → 1900s,
    * everything else (≥ 100 and the NEGATIVE years an ES5 expanded-year
    * prefix can commit: "-012023-01-01 10:20" is literally −12023)
    * literal. Never applies to a COMPLETE ES5 match ("0049" is year 49
    * while "0049 10:20" is 2049). */
  private def legacyYear(y: Int): Int =
    if (y >= 0 && y < 50) 2000 + y else if (y >= 50 && y < 100) 1900 + y else y

  // ===================================================================
  // Legacy parser: a faithful token scan.
  //
  // V8's legacy `new Date` parser is a single pass over a token stream
  // (numbers, letter-runs, signs, parens, skippable symbols) feeding
  // three small composers (date components, time slots, zone). Every
  // rule below is pinned by rows in src/test/resources/jsdate/corpus.tsv
  // generated from node v20; the comments state the exposing inputs.
  // ===================================================================

  // token kinds
  private final val TEnd = 0
  private final val TWs = 1      // whitespace run
  private final val TNum = 2     // digit run (value clamped, raw length kept)
  private final val TWord = 3    // run of chars >= 'A' ("[","~","_" are
                                 // word chars: "May 4 ~ 2023" is Invalid
                                 // via the garbage-word rule while
                                 // "May 4 @ 2023" parses — '@' < 'A')
  private final val TSign = 4    // '+' or '-'
  private final val TColon = 5
  private final val TDot = 6
  private final val TRParen = 7  // unmatched ')' — fails once a number was read
  private final val TParen = 8   // '('-group, depth-tracked, swallowed
  private final val TSkip = 9    // every other char < 'A': , / ; % @ # ...

  private final class Tok(val kind: Int, val value: Int, val rawLen: Int,
      val sign: Int, val word: String)
  private val tokEnd = new Tok(TEnd, 0, 0, 0, null)

  /** Tokenizer with one-token lookahead. Whitespace runs are tokens, so
    * "directly follows" is expressible as token adjacency: `skipColon`
    * after "10" consumes the colon of "10:20" but not of "10 :20". */
  private final class Scanner(s: String) {
    private var pos = 0
    private var ahead: Tok = null

    def peek(): Tok = { if (ahead == null) ahead = scan(); ahead }
    def next(): Tok = { val t = peek(); ahead = null; t }
    def skipSym(kind: Int): Boolean =
      if (peek().kind == kind) { ahead = null; true } else false

    private def scan(): Tok = {
      if (pos >= s.length) return tokEnd
      val c = s.charAt(pos)
      if (c >= '0' && c <= '9') {
        val start = pos
        // V8's ReadUnsignedNumeral: digits stop ACCUMULATING once the
        // value reaches 1e8 (checked before each add — max 999999999);
        // the run is still consumed and its raw length kept. The freeze
        // is verdict-visible through the zone-offset wrap ("Z-123456789
        // ::" is the frozen 123456789 hours, int32-wrapped — below);
        // every other sink bounds the value far under the freeze line.
        var v = 0
        while (pos < s.length && s.charAt(pos) >= '0' && s.charAt(pos) <= '9') {
          if (v < 100000000) v = v * 10 + (s.charAt(pos) - '0')
          pos += 1
        }
        new Tok(TNum, v, pos - start, 0, null)
      } else if (JsDateReformat.isJsDateWs(c)) {
        while (pos < s.length && JsDateReformat.isJsDateWs(s.charAt(pos))) pos += 1
        new Tok(TWs, 0, 0, 0, null)
      } else if (c >= 'A') { // V8 scans any other char >= 'A' as a word char
        val start = pos
        while (pos < s.length && s.charAt(pos) >= 'A' &&
          !JsDateReformat.isJsDateWs(s.charAt(pos))) pos += 1
        new Tok(TWord, 0, pos - start, 0, s.substring(start, pos))
      } else if (c == '+' || c == '-') {
        pos += 1
        new Tok(TSign, 0, 0, if (c == '-') -1 else 1, null)
      } else if (c == ':') { pos += 1; new Tok(TColon, 0, 0, 0, null) }
      else if (c == '.') { pos += 1; new Tok(TDot, 0, 0, 0, null) }
      else if (c == ')') { pos += 1; new Tok(TRParen, 0, 0, 0, null) }
      else if (c == '(') {
        // a parenthesized span is swallowed whole, nesting tracked; an
        // unclosed '(' swallows the rest ("May 4 (x 2023" is May 4 2001,
        // "May 4 ((x)) 2023" is 2023, "(2023-05-04)" is Invalid)
        var depth = 1
        pos += 1
        while (pos < s.length && depth > 0) {
          val ch = s.charAt(pos)
          if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
          pos += 1
        }
        new Tok(TParen, 0, 0, 0, null)
      } else { pos += 1; new Tok(TSkip, 0, 0, 0, null) }
    }
  }

  /** Time slots h/m/s/ms in fill order. `add` is the "n:" path (more
    * fields announced), `addFinal` closes the time; out-of-range and
    * post-finalized adds fail the parse where V8's composer does:
    * "May 4 10:60:30" and "May 4 25:00" are Invalid, while a
    * NON-announced out-of-range number falls through to the date
    * components instead ("May 4 10:60" is year 1960). */
  private final class TimeAcc {
    val slot = Array(0, 0, 0, 0)
    var count = 0
    var finalized = false
    var hourOffset: Int = -1 // -1 none, 0 am, 12 pm

    private def max(i: Int): Int = i match {
      case 0 => 24
      case 3 => 999
      case _ => 59
    }
    def add(n: Int): Boolean =
      if (finalized || count >= 4 || n > max(count)) false
      else { slot(count) = n; count += 1; true }
    def isExpecting(n: Int): Boolean =
      count > 0 && !finalized && count < 4 && n <= max(count)
    def addFinal(n: Int): Boolean = { val ok = add(n); finalized = true; ok }
  }

  /** Date components (max 3) + the named month (last word wins:
    * "May 4 Jun 2023" is June) + the iso flag, set ONLY by a COMPLETE
    * ES5 match: components are then fixed Y-M-D and the year is literal
    * ("0099-01-01" is 99). A PARTIAL ES5 prefix commits its components
    * withOUT the flag — "0099-01-01 10:20" maps to 1999. */
  private final class DayAcc {
    val comp = new Array[Int](3)
    var count = 0
    var named: Int = 0
    var iso = false
    def add(n: Int): Boolean =
      if (count >= 3) false else { comp(count) = n; count += 1; true }
  }

  /** Zone state: a named word's offset vs a sign-built numeric offset;
    * the last one set wins ("Z +02:00" is +2, "+02:00 Z" is UTC).
    *
    * The sign-built total is SECONDS in wrapping int32 arithmetic,
    * exactly V8's composer: the ':'-routed hour is uncapped ("-0500::"
    * is −500 HOURS), so a frozen-reader hour wraps `hour*3600`
    * ("Z-05002023::" is +827413616 s ≈ 26 years, probe-pinned), and a
    * total that wraps NEGATIVE is Invalid Date ("Z-1000000001::",
    * "Z+99999999::") — unless a later zone word overwrites it
    * ("Z-99999999:: GMT" is UTC; a later sign-built offset can't, the
    * second sign already fails the sign rule). */
  private final class TzAcc {
    var named: Int = Int.MinValue // minutes, MinValue = unset
    var sign = 0
    var hour = 0
    var minute = 0
    var minutePending = false
    def wrappedNegative: Boolean = sign != 0 && hour * 3600 + minute * 60 < 0
    def offsetSec: Option[Int] =
      if (sign != 0) Some(sign * (hour * 3600 + minute * 60))
      else if (named != Int.MinValue) Some(named * 60)
      else None
  }

  /** Milliseconds from a fraction's digit run: the guarded-reader value
    * (leading zeros skipped, frozen at 9 significant digits) scaled to
    * three digits over an effective length of min(rawLen, 9) — V8's
    * ReadMilliseconds over its ReadUnsignedNumeral. Short runs pad
    * ("*.5" is 500 ms, "*.60" is 600); long runs divide down
    * ("*.123456" is 123). The freeze makes LEADING ZEROS drop out of
    * long runs — ".059999999999" is 599 (not 059) and ".009999999999"
    * is 999, while ".00000000059" is 0 — all probe-pinned. The value
    * matters only through the slot bounds: the scaled result never
    * exceeds 999, and "10:20.5" turns Invalid because the 500 lands on
    * the SECOND slot (max 59). */
  private def readMs(t: Tok): Int = {
    val effLen = math.min(t.rawLen, 9)
    if (effLen <= 3) t.value * math.pow(10, 3 - effLen).toInt
    else (t.value / math.pow(10, effLen - 3)).toInt
  }

  /** The legacy token loop. Each branch carries its probe-pinned rule:
    *
    *   - NUMBER directly followed by ':' announces a time field ("10:20";
    *     "10::30" is 10:00:30 and only legal while the time is empty);
    *     directly followed by '.' while a slot expects it, a fraction
    *     ("10:20:30.5"; the fraction MUST be a number: "10:20:30." and
    *     "10:20:30.(x)5" are Invalid). Otherwise the number fills, in
    *     order of priority: a pending zone minute ("+02:30", minute ≤ 59,
    *     pending survives an overflow: "+02:77 30" takes 30), an open
    *     time slot ("10: 20" — separators and even month words may
    *     intervene: "10:(x)20", "10:Jun20"), closing the time with the
    *     peek rule — only end, whitespace, Z or a sign may directly
    *     follow a closing time field ("10:20pm", "10:20(x)", "10:20,pm"
    *     are Invalid) — or else a date component, eating one directly
    *     trailing dash ("2023-05-04"; "2023(x)-05-04" is Invalid
    *     because the paren blocks the dash-eat and a bare '-' then
    *     fails). A 4th component fails ("May 4 2023 10:20 2024 2025").
    *   - WORD: months by 3-letter prefix (any trailing letters ignored),
    *     am/pm/zones/Z by whole-run match; anything else is a garbage
    *     word — legal only before the first number and never directly
    *     before one ("Xyz 1" parses, "May 4 Xyz" and "Xyz4" are
    *     Invalid). am/pm needs an open time ("May 4 pm 2023" Invalid,
    *     leading "pm May 4 2023" is garbage-skipped); last token wins.
    *   - SIGN with a time read or UTC zone set: numeric offset — value
    *     routing by ':' first ("+002:30" is +2:30), else by raw digit
    *     count (1-2 → hours; 3-4 → HMM with minutes rolling into hours:
    *     "+0160" is +120 min; 5+ Invalid). A sign elsewhere: legal
    *     garbage before the first number ("- 2023-05-04",
    *     "--2023-05-04"), Invalid after ("May 4 - 2023", "2023 -05-04")
    *     — except a directly-attached six-digit year at the front
    *     ("+012023-01-01 10:20").
    *   - ')' fails once a number was read; '(' swallows its group; every
    *     other sub-'A' char is skipped ("May 4 ; 2023", "2023/., 05 ./
    *     04", "May 4 10:. 20" all parse).
    *
    * The loop starts at `firstTok` — the token [[es5Prefix]] could not
    * use — with `day` possibly pre-filled ("has read number" then starts
    * true, and a committed number's symbol adjacency is gone while the
    * RETURNED token keeps its own: "2023-13:30" is 13:30 on Jan 1 2023
    * because the rejected month 13 still announces a time field, while
    * "2023-05-13:30" is Invalid — 13 was committed as the DAY, the
    * returned ':' is a skipped stray, and 30 is a fourth component).
    */
  private def runLegacy(sc: Scanner, firstTok: Tok, day: DayAcc,
      time: TimeAcc, tz: TzAcc): Boolean = {
    var hasNum = day.count > 0

    // V8's SkipSymbol('-') after a date component or month word: eats
    // ONE directly-trailing dash ("2023-05-04", "Jan-4", trailing
    // "...99-0500-"); a dash it can't reach is a sign token and fails
    // once a number was read ("2023 -05-04", "2023(x)-05-04" Invalid)
    def eatDash(): Unit = {
      val p = sc.peek()
      if (p.kind == TSign && p.sign == -1) { sc.next(); () }
    }
    // a number that isn't announcing a time field: pending zone minute
    // first, then an open time slot (with the closing peek rule), else
    // a date component
    def handleNonTime(n: Int): Boolean =
      if (tz.minutePending && n <= 59) { tz.minute = n; tz.minutePending = false; true }
      else if (time.isExpecting(n)) {
        time.addFinal(n) && (sc.peek().kind match {
          // V8: only end-of-input, whitespace, Z or a sign may directly
          // follow the token that closes the time ("10:20pm", "10:20(x)",
          // "10:20,pm", "10:20:30GMT" are Invalid; "10:20Z", "10:20+02" parse)
          case TEnd | TWs | TSign => true
          case TWord => sc.peek().word.equalsIgnoreCase("z")
          case _ => false
        })
      } else day.add(n) && { eatDash(); true }
    // garbage words are legal only before the first number and never
    // directly before one ("Xyz 1" parses; "May 4 Xyz", "Xyz4" Invalid)
    def garbageWord(): Boolean = !hasNum && sc.peek().kind != TNum

    var ok = true
    var done = false
    var t = firstTok
    while (ok && !done) {
      t.kind match {
        case TEnd => done = true
        case TWs | TSkip | TColon | TDot | TParen => ()
        case TRParen => if (hasNum) ok = false
        case TNum =>
          hasNum = true
          val n = t.value
          if (sc.skipSym(TColon)) {
            if (sc.skipSym(TColon)) {
              // "n::" — only while the time is empty ("10::30" is
              // 10:00:30, "10:20::30" Invalid)
              if (time.count > 0 || !time.add(n) || !time.add(0)) ok = false
            } else if (!time.add(n)) ok = false
          } else if (sc.skipSym(TDot)) {
            if (time.isExpecting(n)) {
              // fraction: fills the slot, then REQUIRES a number whose
              // millisecond value lands on the following slot, range-
              // checked — which is exactly why "10:20.5" is Invalid
              // (500 on the second slot) while "10:20:30.5" parses
              if (!time.add(n)) ok = false
              else if (sc.peek().kind != TNum) ok = false
              else if (!time.addFinal(readMs(sc.next()))) ok = false
            } else ok = handleNonTime(n) // '.' consumed, n demotes
          } else ok = handleNonTime(n)
        case TWord =>
          val lw = t.word.toLowerCase(Locale.ENGLISH)
          val mo = if (lw.length >= 3) monthNum.get(lw.substring(0, 3)) else None
          if (mo.isDefined) { day.named = mo.get; eatDash() }
          else if (lw == "am" || lw == "pm") {
            // needs an open time; a leading token is garbage-skipped
            // ("pm May 4 2023" parses, "May 4 pm 2023" Invalid); the
            // LAST token wins ("10:20 pm am" is 10:20)
            if (time.count > 0) time.hourOffset = if (lw == "pm") 12 else 0
            else ok = garbageWord()
          } else if (namedZoneMin.contains(lw)) {
            // zone words take effect only after a number; a LEADING one
            // is garbage-skipped with its offset dropped
            // ("EST 2023-05-04 10:20" is 10:20 plain, "GMT+0200
            // 2023-05-04" is Invalid via the stranded offset digits)
            if (hasNum) { tz.named = namedZoneMin(lw); tz.sign = 0; tz.minutePending = false }
            else ok = garbageWord()
          } else ok = garbageWord()
        case TSign =>
          if (tz.named == 0 || time.count > 0) {
            // numeric zone offset, enabled by a read time or a UTC word
            // ("2023-05-04 GMT+2:3" parses, "2023-05-04 +02:00" and
            // "2023-05-04 EST+2" don't); the sign must be DIRECTLY
            // followed by a number or a colon — anything else is
            // Invalid ("May 4 10:20 -", "10:20 -.30", "10:20 --2023")
            val p = sc.peek()
            if (p.kind == TNum) {
              sc.next()
              tz.sign = t.sign; tz.named = Int.MinValue; tz.minutePending = false
              if (sc.skipSym(TColon)) {
                // "+H[H]:" — minute pending, by value ("+002:30" is
                // +2:30); an out-of-range candidate demotes to a date
                // component and the wait continues ("+02:77 30" is
                // +2:30 with component 77)
                tz.hour = p.value; tz.minute = 0; tz.minutePending = true
              } else if (p.rawLen <= 2) { tz.hour = p.value; tz.minute = 0 }
              else if (p.rawLen <= 4) {
                // colon-less HMM/HHMM: minutes roll into hours
                // ("+0160" is +120 min); 5+ digits Invalid ("+02000")
                tz.hour = p.value / 100; tz.minute = p.value % 100
              } else ok = false
            } else if (sc.skipSym(TColon)) {
              // bare "±:" — a ZERO-hour offset with the minute pending
              // ("10:20 -:30" is −0:30 → 10:50, "10:-:20" is 10:20,
              // "10:-:61" demotes 61 and leaves −0:00)
              tz.sign = t.sign; tz.named = Int.MinValue
              tz.hour = 0; tz.minute = 0; tz.minutePending = true
            } else ok = false
          } else if (hasNum) ok = false
          // a pre-number sign is skipped garbage ("- 2023-05-04",
          // "--2023-05-04" parse). Legacy has NO signed years: the
          // six-digit expanded year belongs to the ES5 PREFIX alone —
          // "Xyz -012023" is +12023 while "-012023-..." is −12023.
      }
      if (ok && !done) t = sc.next()
    }
    ok
  }

  private def compose(day: DayAcc, time: TimeAcc, tz: TzAcc): Option[ZonedDateTime] = {
    if (day.count == 0) return None
    // time write: am/pm requires hour ≤ 12; pm is h%12+12, am h%12
    var h = time.slot(0)
    if (time.hourOffset >= 0) {
      if (h > 12) return None
      h = h % 12 + time.hourOffset
    }
    if (tz.wrappedNegative) return None
    val off: Option[Int] = tz.offsetSec
    val (y, m, d) =
      if (day.iso) {
        // complete ES5 match: fixed Y-M-D order, literal year
        (day.comp(0), if (day.count >= 2) day.comp(1) else 1,
          if (day.count >= 3) day.comp(2) else 1)
      } else if (day.named > 0) {
        val c0 = day.comp(0)
        if (day.count >= 2) {
          if (c0 >= 1 && c0 <= 31) (legacyYear(day.comp(1)), day.named, c0)
          else (legacyYear(c0), day.named, day.comp(1))
        } else if (c0 >= 1 && c0 <= 31) (2001, day.named, c0)
        else (legacyYear(c0), day.named, 1)
      } else {
        val v1 = day.comp(0)
        if (v1 >= 1 && v1 <= 12) // month-first: M[-d[-y]]
          (if (day.count >= 3) legacyYear(day.comp(2)) else 2001, v1,
            if (day.count >= 2) day.comp(1) else 1)
        else if (v1 <= 0 || v1 >= 32) // year-first: y[-m[-d]] — a NEGATIVE
          // leading component (ES5 expanded-year commit) routes here too:
          // "-012023:30" is year −12023 month 30 → Invalid, not a reparse
          (legacyYear(v1), if (day.count >= 2) day.comp(1) else 1,
            if (day.count >= 3) day.comp(2) else 1)
        else return None // 13-31: a day with no month to attach to
      }
    build(y, m, d, h, time.slot(1), time.slot(2), time.slot(3), off)
  }

  // es5Prefix result codes; the unhandled token rides in a var slot
  private final val EsComplete = 0
  private final val EsInvalid = 1
  private final val EsContinue = 2

  /** The strict ES5/ISO parser, mirrored as V8 layers it: a TOKEN PREFIX
    * parser sharing the scanner and the composers with the legacy loop.
    * Grammar: `[±YYYYYY|YYYY][-MM[-DD]][T HH:MM[:SS[.f*]][Z|±HH:MM|±HHMM]]`,
    * all fields fixed-width. Three outcomes, probe-pinned:
    *
    *   - COMPLETE (whole input consumed): components are literal ISO —
    *     "0099-01-01" is year 99, "+000000" is year 0.
    *   - CONTINUE: the prefix's numbers stay COMMITTED as date
    *     components (no iso flag — "0099-01-01 10:20" maps to 1999) and
    *     the legacy loop picks up at the first token the prefix could
    *     not use, with that token's own symbol adjacency intact
    *     ("2023-05:30" is May 30; "2023-13:30" is 13:30 on Jan 1).
    *   - INVALID (hard, no fallback): any break after a consumed
    *     [Tt] time separator — "2023-05-04T10", "2023-05-04T 10:20",
    *     "...T10:20 Z", "...T10:20+2:30" — because the T would be a
    *     garbage word in legacy anyway.
    *
    * Subtlety pinned by "-000000" (Invalid) vs "+000000" (year 0) vs
    * "- 012023" (+12023): the six-digit year is consumed BEFORE the
    * minus-zero check rejects, so the returned sign token is followed
    * by end-of-input in the legacy continuation. */
  private def es5Prefix(sc: Scanner, day: DayAcc, time: TimeAcc,
      tz: TzAcc): (Int, Tok) = {
    val p0 = sc.peek()
    if (p0.kind == TSign) {
      val signTok = sc.next()
      val p = sc.peek()
      if (p.kind != TNum || p.rawLen != 6) return (EsContinue, signTok)
      sc.next() // the year is consumed even when minus-zero rejects
      if (signTok.sign < 0 && p.value == 0) return (EsContinue, signTok)
      day.add(signTok.sign * p.value)
    } else if (p0.kind == TNum && p0.rawLen == 4) {
      day.add(sc.next().value)
    } else return (EsContinue, sc.next())
    // a consumed '-' that fails its field check is NOT given back — the
    // NEXT token is returned ("2023- 05" continues at the whitespace,
    // "2023-" continues at end-of-input and composes year 2023)
    if ({ val p = sc.peek(); p.kind == TSign && p.sign == -1 }) {
      sc.next()
      val p = sc.peek()
      if (p.kind != TNum || p.rawLen != 2 || p.value < 1 || p.value > 12)
        return (EsContinue, sc.next())
      day.add(sc.next().value)
      if ({ val p2 = sc.peek(); p2.kind == TSign && p2.sign == -1 }) {
        sc.next()
        val p2 = sc.peek()
        if (p2.kind != TNum || p2.rawLen != 2 || p2.value < 1 || p2.value > 31)
          return (EsContinue, sc.next())
        day.add(sc.next().value)
      }
    }
    val pt = sc.peek()
    val isT = pt.kind == TWord && pt.word.equalsIgnoreCase("t")
    if (!isT) {
      if (pt.kind != TEnd) return (EsContinue, sc.next())
      day.iso = true
      return (EsComplete, tokEnd)
    }
    sc.next()
    // mandatory HH:MM, fixed-2, hour ≤ 24 (24 only with all-zero rest)
    val h = sc.peek()
    if (h.kind != TNum || h.rawLen != 2 || h.value > 24) return (EsInvalid, tokEnd)
    val hour24 = h.value == 24
    time.add(sc.next().value)
    if (!sc.skipSym(TColon)) return (EsInvalid, tokEnd)
    val mi = sc.peek()
    if (mi.kind != TNum || mi.rawLen != 2 || mi.value > 59 ||
        (hour24 && mi.value > 0)) return (EsInvalid, tokEnd)
    time.add(sc.next().value)
    if (sc.skipSym(TColon)) {
      val se = sc.peek()
      if (se.kind != TNum || se.rawLen != 2 || se.value > 59 ||
          (hour24 && se.value > 0)) return (EsInvalid, tokEnd)
      time.add(sc.next().value)
      if (sc.skipSym(TDot)) {
        // fraction: any digit run, first three digits as milliseconds
        val f = sc.peek()
        if (f.kind != TNum || (hour24 && f.value > 0)) return (EsInvalid, tokEnd)
        time.add(readMs(sc.next()))
      }
    }
    // optional zone, directly attached: Z / ±HH:MM / ±HHMM (hour ≤ 23)
    val z = sc.peek()
    if (z.kind == TWord && z.word.equalsIgnoreCase("z")) {
      sc.next(); tz.named = 0
    } else if (z.kind == TSign) {
      val st = sc.next()
      val n = sc.peek()
      if (n.kind != TNum) return (EsInvalid, tokEnd)
      if (n.rawLen == 4) {
        sc.next()
        val oh = n.value / 100
        val om = n.value % 100
        if (oh > 23 || om > 59) return (EsInvalid, tokEnd)
        tz.sign = st.sign; tz.hour = oh; tz.minute = om
      } else if (n.rawLen == 2 && n.value <= 23) {
        sc.next()
        if (!sc.skipSym(TColon)) return (EsInvalid, tokEnd)
        val m2 = sc.peek()
        if (m2.kind != TNum || m2.rawLen != 2 || m2.value > 59)
          return (EsInvalid, tokEnd)
        sc.next()
        tz.sign = st.sign; tz.hour = n.value; tz.minute = m2.value
      } else return (EsInvalid, tokEnd)
    }
    if (sc.peek().kind != TEnd) return (EsInvalid, tokEnd)
    day.iso = true
    (EsComplete, tokEnd)
  }

  /** Emulates `new Date(value)` for the supported subset; fields are read
    * in UTC (see class doc). Returns None for JS "Invalid Date".
    *
    * The input is deliberately NOT trimmed: V8 never pre-trims, and the
    * ES5 prefix only engages at the very first token — " 0099-01-01"
    * is legacy-parsed to 1999 while "0099-01-01" is literal 99, and
    * " 1210:" is Invalid (hour 1210) while "1210:" is year 1210 with a
    * stray colon (probe-pinned). */
  /** V8's date-scanner whitespace, probe-pinned: \t\n\u000b\f\r,
    * space, the Zs category (NBSP, ideographic space, thin spaces —
    * scraped pages carry literal NBSP inside dates), and ZWNBSP/BOM.
    * NOT the other C0 controls (skip symbols — they fail the time-close
    * adjacency rule where whitespace passes: "...10:20<U+0001>" is
    * Invalid, "...10:20<NBSP>" parses), NOT U+2028/U+2029 or Cf formats
    * (word chars: "2023<U+2028>" is Invalid). */
  private[rdf] def isJsDateWs(c: Char): Boolean =
    (c >= 0x09 && c <= 0x0d) || c == ' ' || c == '\ufeff' ||
      (c >= 0xa0 && Character.getType(c) == Character.SPACE_SEPARATOR)

  def parse(raw: String): Option[ZonedDateTime] = {
    try {
      // a NUL truncates the whole input before any parsing — even an
      // ES5 match completes against the truncated string ("2023-05-04
      // <NUL>junk" is the COMPLETE ISO date; a lone NUL is empty →
      // Invalid)
      val nul = raw.indexOf('\u0000')
      val s = if (nul >= 0) raw.substring(0, nul) else raw
      val sc = new Scanner(s)
      val day = new DayAcc
      val time = new TimeAcc
      val tz = new TzAcc
      val (code, first) = es5Prefix(sc, day, time, tz)
      code match {
        case EsComplete => compose(day, time, tz)
        case EsInvalid => None
        case _ =>
          if (runLegacy(sc, first, day, time, tz)) compose(day, time, tz)
          else None
      }
    } catch { case _: Exception => None } // out-of-range fields etc.
  }
}
