#!/usr/bin/env node
// Differential probe for the JS `new Date(string)` emulation behind the
// repair stage (reference lib/fixTriple.js:148-162, 197-214).
//
// Replays every corpus input plus a fuzz band of separator / padding /
// year-width / zone variants through this node's `new Date`, formats the
// result with the reference's own field logic (month zero-padded iff
// getMonth() < 9, nothing else padded; fixTriple.js:152-156, 201-208),
// and prints one TSV row per input:
//
//     input<TAB>date<TAB>dateTime        (the literal \N for Invalid Date)
//
// Run under TZ=UTC (the emulation pins field extraction to UTC):
//
//     TZ=UTC node scripts/probe-jsdate.js > src/test/resources/jsdate/corpus.tsv
//
// JsDateReformatSpec consumes the committed TSV as ground truth and — when
// node is on PATH — reruns this script and asserts the committed table is
// current, so regenerating the corpus is one command and transcription
// can't drift.
'use strict';

if (new Date(0).getHours() !== 0) {
  console.error('probe must run with TZ=UTC');
  process.exit(2);
}

// ---- corpus inputs (the long-standing hand-curated rows) ----
const base = [
  '2023-05-04', '2023-5-4', '2023/05/04', '2023.05.04',
  'May 4 2023', 'May 4, 2023', 'may 4 2023', 'MAY 4 2023',
  'Sept 4 2023', 'September 4 2023', '4 May 2023', '4 May, 2023',
  'Sat May 4 2023', 'Saturday, May 4 2023',
  '2023', '2023-05', '2023/05', '05/04/2023', '5/4/2023',
  '2023-05-04T10:20:30', '2023-05-04 10:20:30', '2023-05-04T10:20:30.123',
  '2023-05-04T10:20:30Z', '2023-05-04T10:20:30+02:00',
  '2023-05-04T10:20:30+0200', '2023-05-04T10:20',
  '2023-02-30', '2023-11-31', '2023-13-01', '2023-1-40', 'May 32 2023',
  '2023-05-04T24:30', '2023-1-1 24:00', '2023-1-1 24:00:00',
  'May 4 2023 10:20:30', '4 May 2023 10:20', '05/04/2023 10:20:30',
  '999-01-01', '12023-01-01', '0000-01-01', '2023-005-04', '2023-123-04',
  '275760-01-01', '275761-01-01', '  2023-05-04  ', 'junk', '',
];

// ---- fuzz band: T vs space separator x padding x year width x zone ----
const fuzz = [];
// the r14-verdict exposing forms: T only binds in strictly padded ISO
fuzz.push(
  '2023-5-4T3:7', '2023-05-04T3:20', '12023-01-01T10:20',
  '2023.05.04T10:20', '2023/05/04T10:20', '999-01-01T10:20',
  '2023-5-04T10:20', '2023-05-4T10:20', '2023-005-04T10:20',
);
// case + zone spacing around the T form
fuzz.push(
  '2023-05-04t10:20:30', '2023-05-04T10:20:30z', '2023-05-04t10:20:30z',
  '2023-05-04T10:20:30 Z', '2023-05-04T10:20:30 +02:00',
  '2023-05-04T10:20:30+02', '2023-05-04T10:20:30-02:30',
  '2023-05-04T10:20:30+2:00', '2023-05-04T10:2', '2023-05-04T9:20',
  '2023-05-04T10', '2023-05-04T10:20:3', '2023-05-04T10:20:30.1',
  '2023-05-04T10:20:30.123456', '2023-05-04T25:00', '2023-05-04T23:60',
);
// lenient space-separated band
fuzz.push(
  '2023-5-4 3:7', '2023-5-4 3:7:9', '2023-5-4 3:7:9Z',
  '2023-5-4  3:7', '2023-05-04 10:20:30 +02:00', '2023-05-04 10:20:30Z',
  '2023-05-04 10:20:30z', '2023-05-04 10:20:30 z', '2023-05-04 9:20',
  '2023.05.04 10:20', '2023/05/04 10:20', '2023-05-04 10:20:30.123',
  '2023-05-04 10:20:30+0200', '2023-05-04 10:20:30 GMT',
);
// year widths through both separators
fuzz.push(
  '999-01-01 10:20', '12023-01-01 10:20', '0999-01-01T10:20',
  '+012023-01-01T10:20', '99-01-01', '9-01-01',
);
// 2-digit years in the legacy month-first / name forms
fuzz.push(
  '5/4/23', '05/04/23', 'May 4 23', '4 May 23', 'May 4, 23',
  '5/4/99', 'May 4 99', '5/4/0023', 'May 4 0023',
  '5/4/23 10:20', 'May 4 23 10:20:30',
);
// pin the legacy small-year mapping rule (value-based vs digit-based)
fuzz.push(
  '5/4/49', '5/4/50', '5/4/100', '5/4/0100', 'May 4 100', '5/4/0',
  '5/4/-1',
);
// T-form remaining edges: 24:00, fraction+zone, t in unpadded form,
// signed years through the space form
fuzz.push(
  '2023-05-04T24:00', '2023-05-04T24:00:00', '2023-05-04T10:20:30.123Z',
  '2023-05-04T10:20:30,123', '2023-5-4t3:7', '+012023-01-01 10:20',
  '-012023-01-01T10:20', '+2023-05-04T10:20', '2023-05-04T10:20:30+02:60',
  '2023-05-04T10:20Z', '2023-05-04T1020',
);
// space-form zone spellings
fuzz.push(
  '2023-05-04 10:20:30 +0200', '2023-05-04 10:20:30GMT',
  '2023-05-04 10:20:30 UTC', '2023-05-04 10:20:30 UT',
  '2023-05-04 10:20:30 EST', '2023-05-04 10:20:30 +02',
  '2023-1-1 24:30', '2023-05-04 10:20:30 Z extra',
);

// zone tails on the name / month-first legacy forms, lowercase zone
// names, date-only trailing zones, signed years through the space form
fuzz.push(
  '-012023-01-01 10:20', 'May 4 2023 10:20:30 Z', 'May 4 2023 10:20:30 GMT',
  '5/4/2023 10:20 +02:00', '5/4/2023 10:20Z', '2023-05-04 Z',
  '2023-05-04 GMT', '2023-05-04 10:20:30 gmt', '2023-05-04 10:20:30 est',
  '2023-05-04 10:20:30.123 Z', '2023-05-04T10:20:30.', '2023-05-04 10:20:30.',
  '2023-05-04T24:00:00.000', '4 May 2023 10:20 GMT', 'May 4 2023 Z',
);

// date-only zone tails, signed-year date-only, no-seconds military zone
fuzz.push(
  '+012023-01-01', '-012023-01-01', '2023-05-04 +02:00', '2023-05 Z',
  '2023-05-04T10:20+0200', '5/4/2023 GMT', '2023-05-04+02:00',
);
// attached vs detached word zones, attached Z on bare dates
fuzz.push(
  '2023-05-04Z', '2023Z', '2023-05-04GMT', '4 May 2023Z',
  '2023-05-04 10:20:30GMT', '2023-05-04 10:20:30UTC',
  'May 4 2023 10:20:30 Z', 'May 4 2023 Z', 'May 4 2023 +02:00',
  '5/4/2023 10:20Z', '4 May 2023 10:20 GMT',
);
// lenient legacy numeric offsets (hours unbounded, minutes <= 59)
fuzz.push(
  '2023-05-04 10:20:30 +2', '2023-05-04 10:20:30 -5',
  '2023-05-04 10:20:30 +2:3', '2023-05-04 10:20:30 +02:0',
  '2023-05-04 10:20:30 +020', '2023-05-04 10:20:30 +2459',
  '2023-05-04 10:20:30 -99', '2023-05-04 10:20:30 +2:60',
  '2023-05-04 10:20:30 +02000', '2023-05-04 10:20:30+2',
  '2023-05-04 10:20:30 Z extra',
);
// ISO offset bounds (hour <= 23, minute <= 59)
fuzz.push(
  '2023-05-04T10:20:30+23:59', '2023-05-04T10:20:30+24:00',
  '2023-05-04T10:20:30+02:60', '2023-05-04T24:00', '2023-05-04T24:30',
  '2023-05-04T24:00:00.000', '2023-05-04T10:20Z',
);
// US named zones: detached after a time, attachable after a bare date,
// with their real offsets; single-letter military zones stay Invalid
fuzz.push(
  '2023-05-04 10:20:30 EST', '2023-05-04 10:20:30 est',
  '2023-05-04 10:20:30 PDT', '2023-05-04 10:20:30 EDT',
  '2023-05-04 10:20:30 CST', '2023-05-04 10:20:30 CDT',
  '2023-05-04 10:20:30 MST', '2023-05-04 10:20:30 MDT',
  '2023-05-04 10:20:30 PST', '2023-05-04 10:20:30PST',
  '2023-05-04 PST', '2023-05-04PST', '2023-05-04UTC', '2023-05-04est',
  'May 4 2023 EST', 'May 4 2023PST', '12-01-02 PST', '12-01-02 est',
  '12-01 PST', '2023 PST', '12 PST', '0099-01-01 PST', '0013-01-02 PST',
  '2023-05-04 10:20:30 A', '2023-05-04 10:20:30 M',
);
// year-less month-name forms (legacy default year 2001) and value
// routing of the companion numbers (1-31 → day, else year)
fuzz.push(
  'May 4 10:20:30', 'May 4', '4 May', 'May 4 10:20', 'May 4, 10:20',
  'May 4,10:20', 'May 410:20', 'May', 'May 0', 'May 32', 'May 2023',
  'May 32 10:20', 'May 2023 10:20', 'May 0023', '0 May', '32 May',
  '99 May', '32 May 2023', '1 May 10:20', '12345 May', 'May 4 123456',
  'Sat May 4', 'May 2023 4', 'May 2023 04', 'May 32 4', 'May 4 01',
  'May 4 2023, 10:20', 'May 4 2023 ,10:20', 'May,4 2023', '4 May,2023',
  'May-4-2023', '12-May-2023', 'May/4/2023', '4-May-23', '12-May',
  'May-2023', '2023-may-04', '0-May-4', 'May 4 - 2023',
);
// short-leading numeric forms: value routing of the first field
// (1-12 month, 0/32+ year with the 1900/2000 mapping, 13-31 Invalid)
fuzz.push(
  '12-01-02', '13-01-02', '12-31-99', '5-6-07', '99-1-2', '0-01-01',
  '31-12-2023', '12/31/99 10:20', '13-01-02 10:20', '99-01-01 10:20',
  '12.01.02', '12-01-02 10:20', '2-30-99', '32-01-02', '50-01-02',
  '31-01-02', '0-1-2', '00-01-02', '000-01-02', '012-01-02',
  '013-01-02', '031-01-02', '099-01-01', '0000012-01-01', '12-0-5',
  '0-0-0', '12-01-0', '13.5', '0x10-01-01', '1e2-01-01', '5-2023',
);
// ES5 date-only beats legacy for exact YYYY-MM[-DD]: literal years
// there, legacy mapping everywhere else
fuzz.push(
  '0013-01-02', '0099-01-01', '0099-01-01Z', '0099-1', '0099-01',
  '0013-1-2', '0013/01/02', '0013-01-02Z', '2023-01-0004',
  '2023-0004-01', '2023-01-0000004', '2023-0000001-01',
  '2023-0000000001-01', '5-004-99', '5/004/2023', '5/0000004/2023',
  '2023-05/04', '5/4-23', '5/4/12345', '5/4/123456', '5/4/0099',
);
// 1- and 2-field numeric forms
fuzz.push(
  '2-30', '2-30 10:20', '12', '99', '31', '0', '999', '12345',
  '1234567', '12-01', '12-01 10:20', '5-6', '5-6 10:20', '99-01',
  '13-01', '0-1', '12/31', '1/2', '12-13', '12-32', '00-01', '12-99',
  '12-01,10:20', '12,01', '2023,05,04', '12 01', '2023 05 04',
  '5 4 2023', '99 01', '2023-05-04, 10:20',
);
// separator limits: single -/. junctions only, no dash before a time;
// the leading-garbage tolerance ('- 2023-05-04') is a documented residual
fuzz.push(
  '2023-05-04-10:20', '2023-05-04-', '5--4--2023', '2023 -05-04',
  '2023-05-04 10:20-30', '- 2023-05-04',
);
// numeric offsets and times on name / short-leading / single-field forms
fuzz.push(
  'May 4 2023 10:20 +02:00', '4 May 2023 10:20:30 -0500',
  'May 4 10:20 +02:00', '12-01-02 10:20 +02', 'May 4 2023 10:20+0200',
  '2-30-99 10:20 Z', '12 10:20', '99 10:20', 'May 4 2023 10:20:30.5',
);
// am/pm: detached only, case-insensitive, hour 0-12 with pm=h%12+12
// and am=h%12; tokens may REPEAT (space/comma-joined, never attached
// to each other) and may straddle the post-time component — the LAST
// token wins; a leading keyword is prefix garbage and is skipped
fuzz.push(
  'May 4 2023 10:20 pm', 'May 4 2023 10:20pm', 'May 4 2023 10:20 PM',
  'May 4 2023 10:20 am', 'May 4 2023 12:20 am', 'May 4 2023 12:20 pm',
  'May 4 2023 13:20 pm', 'May 4 2023 13:20 am', '2023-05-04 10:20 pm',
  'May 4 2023 0:20 am', 'May 4 2023 0:20 pm', 'May 4 2023 10 pm',
  'May 4 2023 10:20:30 pm Z', 'May 4 2023 10:20 pm +02:00',
  'May 4 2023 10:20 p', 'May 4 2023 10:20 p.m.', 'May 4 2023 am',
  'May 4 2023 24:00 am', '12-01-02 1:2 pm', 'pm May 4 2023',
  'May 4 2023 10:20 pm pm', 'May 4 2023 10:20 pm am',
  'May 4 2023 10:20 am pm', 'May 4 2023 10:20 am am am',
  'May 4 2023 10:20 pm,pm', 'May 4 2023 10:20 pmpm',
  'May 4 2023 10:20 pm pm Z', 'May 4 10:20 pm 2023 pm',
  'May 4 10:20 pm 2023 am', 'May 4 10:20 am pm 2023',
  'May 4 2023 13:20 pm pm', '10:20 pm pm', 'May 4 2023 10:20 PM aM',
  // documented residuals: node accepts tokens AFTER the zone and a
  // component attached directly to an am/pm token; the mirrored
  // grammar keeps the zone last and requires a junction before a
  // post-time component
  'May 4 2023 10:20 pm Z pm', 'May 4 2023 10:20 pm +02:00 pm',
  'May 4 10:20 pm2023',
);
// asctime / Date.toString round-trips: a post-time date component fills
// the year slot ("Sat May 4 10:20:30 2023"); with the year already
// present it is IGNORED (V8's 3-slot composer) — a 4th component fails;
// am/pm may sit on either side of it; zone words take attached numeric
// offsets that OVERRIDE the word; trailing parentheticals are skipped
fuzz.push(
  'Sat May 4 10:20:30 2023', 'Sat May  4 10:20:30 2023',
  'May 4 10:20:30 2023', '4 May 10:20:30 2023', 'May 4 10:20 23',
  'May 4 2023 10:20 2024', 'May 4 2023 10:20 2024 2025',
  '2023-05 10:20 04', '05/04 10:20 2023', '12-01 10:20 2023',
  '2023-05-04 10:20:30 2024', '05/04/2023 10:20 5', '05 10:20 04',
  '2023 10:20 05', 'May 4 10:20 2023 +02', 'May 4 10:20 2023 Z',
  '12-01 10:20 2023 pm', '2023-05 10:20 04 pm', 'May 4 10:20 pm 2023',
  'May 4 10:20 2023 pm', '+012023-01-01 10:20 5', '2023-05-04 10:20,pm',
  '2023-05-04 10:20:30 GMT+0200', '2023-05-04 10:20:30 GMT+02:00',
  '2023-05-04 10:20:30 UTC+2', '2023-05-04 10:20:30 EST+2',
  '2023-05-04 GMT+2:3', '2023-05-04GMT+2', '2023-05 10:20 04GMT',
  'May 4 10:20 2023GMT', 'May 4 2023 10:20 pmGMT',
  'Thu Jan 01 1970 00:00:00 GMT+0000 (Coordinated Universal Time)',
  'Sat, 04 May 2023 10:20:30 GMT', 'Saturday, 04-May-23 10:20:30 GMT',
  '2023-05-04 10:20:30 Z (hello)', '2023-05-04 (foo)', 'May 4 2023 (x)',
  'May 4 2023 (x) (y', '2023-05-04 10:20:30 (x',
  '2023-05-04 10:20:30 (foo) x', '2023-05-04 10:20:30 (a) (b)',
  '2023-05-04 GMT (x)', '(2023-05-04)',
);
// everything before the first digit is skipped (last month word wins;
// a signed 6-digit year is a number; a NON-month word attached to a
// digit fails; an unclosed paren swallows the digits)
fuzz.push(
  'Xyz 1', 'xyz 1', 'Xyz, 1', 'Xyz 1 2023', 'Xyz 1 1 1', 'Xyz 13',
  'Xyz May 4 2023', 'May Xyz 4 2023', 'hello world May 4 2023',
  'x y z May 4', 'bonjour$ May 4 2023', 'Xyz 2023-05-04',
  'Xyz 2023-05-04T10:20:30', 'hello, 2023-05-04', '$ 2023-05-04',
  '## 2023-05-04', '+ 2023-05-04', '* 2023-05-04', '+2023-05-04',
  '-2023-05-04', '--2023-05-04', 'Xyz-2023-05-04', '/2023-05-04',
  '.2023-05-04', '%2023-05-04', ': 2023-05-04', 'EST 2023-05-04 10:20',
  'GMT+0200 2023-05-04', 'May4', 'Jan4', 'Sept4 2023', 'Xyz4', 'Sat4',
  'Xyz4 2023', 'x1y May 4 2023', 'a1 May 4', 'Maybe 4', 'May.4', 'May,4',
  'Xyz. May 4', 'Xyz May4', '(x) May 4', '(x May 4', 'x(y May 4',
  '1 Xyz', 'May 4 Xyz 2023', 'May 4 2023 Xyz', 'May--4', 'Sat Xyz May 4',
);
// V8's token stream lets date components interleave the time even more
// freely, and month words REASSIGN mid-stream (last wins) — out-of-scope
// residuals, pinned so the ledger is checkable
fuzz.push(
  'May 4 10:20 23 24', '05 10:20 04 2023', '12 10:20 01 02',
  '2023 10:20 05 04', 'May 10:20 4 2023', '10:20 May 4 2023',
  'May 4 (x) 2023', 'May 4 Jun 2023', '4 May Jun', 'Jun 4 May',
);
// attachment matrix: letter tokens attach to date components and
// fractions but not to time fields or other words; Z also attaches to
// time fields; sign tokens attach anywhere
fuzz.push(
  'May 4 10:20:30.5pm', 'May 4 10:20:30pm', 'May 4 10:20:30.5 pm',
  'May 4 10:20:30.pm', 'May 4 10:20:30.5pmZ', 'May 4 10:20:30.5pm Z',
  'May 4 10:20:30.5xyz', 'May 4 10:20:30.5GMT', 'May 4 10:20 2023pm',
  'May 4 10:20 pm+02', 'May 4 10:20:30.5+02', 'May 4 10:20 2023Z',
  'May 4 10:20 pmZ', 'May 4 10:20 pm Z', 'May 4 10:20:30.5Z',
  'Sat, September 30 10:20:30.5pm Z',
);
// demotion: out-of-range / 3+-digit minutes, seconds and offset-minutes
// fall back into the date-component stream; a dot-number after a demoted
// field fills the next empty time slot; the hour never demotes
fuzz.push(
  'May 4 10:20:60', 'May 4 10:60', 'May 4 10:60:30', 'May 4 10:20:75',
  'May 4 10:123', '12-01 10:20:60', 'May 4 10:20 +02:60',
  'May 4 10:20:60 99', 'May 4 99 10:20:60', 'May 4 10:20:60.5',
  '2023-05 10:20:60', 'May 4 10:60 pm', 'May 4 10:20:60 pm',
  'May 4 60:20', 'May 4 10:20 +02:123', '2023-05-04 10:20 +02:60',
  'May 4 10:60 +02', 'May 4 10:123.5', 'May 4 10:20:60.75',
  'May 4 10:20:60.5.3',
  // sign attached to a trailing component is a separator, not a zone
  'Jan4 10:20:30.5 99-0500', '12-01 10:20:30 99-0500',
  'May 4 10:20 99-0500', 'May 4 10:20 2023-12', 'May 4 10:20 99 -0500',
  // a demoted component may be the ONLY one; bare times stay Invalid;
  // backtracking must not demote an in-range minute; colon-less offsets
  // roll minutes into hours; separator-edge shapes are residuals
  'May 4 10:20.5', 'May 4 10:59.5', '12-01 10:20.5', 'May 4 10:20.60',
  'May 10:20:60', '10:20:60', 'May 10:20', '10:20', '10:20 2023',
  '12 10:20:60', 'May 4 10:20 +0160', 'May 4 10:20 +2465',
  'May 4 10:20 99--0500', 'May 4 10:20 99-0500-', 'May 4 10:20 +02:00.5',
  // letter tokens attach to demoted COMPONENTS but not to slot-fillers
  'May 4 10:20:60pm', 'May 4 10:123pm', 'May 4 10:123.5 pm',
  'May 4 10:20:60GMT', 'May 4 10:123.5GMT', 'May 4 10:20:60.5 pm',
  'May 4 10:123.5pm', 'May 4 10:20:60.5pm',
);
// weekday prefixes: separated by . , or whitespace in any mix, possibly
// repeated; a missing separator or a trailing weekday stays Invalid
fuzz.push(
  'Sat,May 4 2023', 'Sat. May 4 2023', 'Sat.May 4 2023', 'Satx May 4 2023',
  'SatMay 4 2023', 'Sat4 2023', 'Sat', 'sat,sun,May 4 2023',
  'Sat,,May 4 2023', ',May 4 2023', 'May 4 2023 Sat', 'Sat Sun May 4 2023',
);
// month words match on their first THREE letters alone; shorter never
fuzz.push(
  'Janu 4 2023', 'Septem 4 2023', 'Juneish 4 2023', 'Mayy 4 2023',
  'Janz 4 2023', 'mayonnaise 4 2023', 'auguzt 4 2023', 'sepT 4 2023',
  '4 Juneish 2023', 'Juneish 4', 'Ju 4 2023', 'Ma 4 2023', 'xyz 4 2023',
  'Jan. 4 2023', 'Octob 4 2023', 'Decembrrr 4 2023',
);
// ---- r17 token-scan families (the regex grammar's former residual
// ---- classes, now implemented; each row pins a token-loop branch) ----
// parenthesized spans skip at any token position, depth-tracked, an
// unclosed '(' swallows the rest; a group may not directly follow a
// closing time field or slot-filler (the same rule as letter tokens)
fuzz.push(
  'May 4 (x) 2023', 'May 4(x)2023', 'May 4 (x)(y) 2023', 'May (x) 4 2023',
  '2023-(x)05-04', '2023(x)-05-04', '2023-05(x)-04', '2023-05-04 10:(x)20',
  'May 4 (x123) 2023', 'May 4 (x', 'May 4 (x 2023', 'May 4 (x) 10:20',
  '2023-05-04 10:20 (x) Z', '2023-05-04 (x) 10:20', 'May 4 (x) Jun 2023',
  'May 4 ((x)) 2023', 'May(x) 4 2023', 'May (x)4 2023', '10:20 (x) 2023',
  '2023-05-04 10:20:30 (x) +02:00', 'May 4 (x) pm 2023', 'May 4 10:20 (x) pm',
  'May 4 2023 10:(x)20', '2023-05-04(x)', 'May 4 (x)2023', 'May 4 2023(x)',
  'May 4 (x) (y', 'May 4 (x (y) 2023', 'May 4 2023 10:20(x)',
  'May 4 2023 10:20 (x)', 'May 4 10:20:60(x)pm', 'May 4 10:20:30.5(x)',
  'May 4 10:123.5(x)', 'May 4 10:20 pm(x)', 'May 4 10:20 pm(x)pm',
  'May 4 10:20 pm(x)2023', 'May 4 2023 10:20 GMT(x)', 'May 4 2023 10:20 GMT(x)+2',
  'May 4 2023 10:20 Z(x)', 'May 4 2023 10:20 +02:00(x)', 'May 4 2023 10:20 +02:(x)00',
  'May 4 2023 10:20 +(x)02:00', '2023-05-04 10:20:30(x)Z', '2023-05-04 10:20:30 (x)Z',
  'May 4 10:20 2023(x)pm', 'May 4 (Jun) 2023', 'Xyz(a) 1', 'Xyz(q)4 2023',
  'Sat (x) May 4 2023', '2023-05-04(x)10:20', 'May 4 ()2023', 'May()4 2023',
);
// month words reassign anywhere, LAST wins; attachment to digits is
// legal on both sides, but not directly after a closing time field
fuzz.push(
  'May 4 Jun 2023', '4 May Jun', 'Jun 4 May', 'May 4 Jun', 'May Jun 4 2023',
  'May 4 2023 Jun', 'May Jun', 'Jun May 4', 'May 4 Jun 2023 Jul',
  'May 4 10:20 Jun', 'May 4 Jun 10:20', 'Jun 4 2023 May', 'May-4-Jun-2023',
  'May 4, Jun, 2023', '4 Jun May 2023', 'May 4 Juneish 2023', '12-01 Jun',
  '12 Jun 01', '2023-05-04 Jun', 'May 4 Jun4', 'MayJun 4', '4 May 2023 Jun',
  'May 4 Jun 2023 10:20', 'May 4 10:20 pm Jun', 'Jun 4 May 2023 12',
  'May 4 Sat 2023', 'May 4 Mon 2023', 'May 4Jun 2023', '4Jun 2023', '4May',
  '4May 2023', 'May 4 2023Jun', 'May 4 10:20Jun', 'May 4 10:20 Jun4',
  'Jun10:20 4', 'May Jun4', 'May 4 10:20 GMT Jun', 'May 4 10:20 Z Jun',
  'May 4 pm Jun', 'May 4 10:20:30.5Jun', '4 Jun 10:20', '4Jun2023',
  'May 4 Jun-2023', 'May 4 Jun/2023', 'May 4 Jun.2023', '4 Jun-2023 10:20',
  'May 4 10:Jun20', 'Jun.4 2023', 'May 4 10:20 60.5Jun', '2023-05-04 10:20:30 Z Jun',
);
// bare symbols below ASCII 'A' skip anywhere; chars >= 'A' are word
// characters (so "~"/"["/"{" are garbage words, Invalid after a
// number); ')' fails once a number was read; detached signs fail after
// a number and skip before one
fuzz.push(
  'May 4 . 2023', 'May 4 / 2023', '2023//05//04', '2023..05..04',
  '2023/., 05 ./ 04', '2023-.05-04', 'May 4 ; 2023', 'May 4 % 2023',
  'May 4 ? 2023', 'May 4 : 2023', 'May 4 @ 2023', 'May 4 * 2023',
  'May 4 # 2023', 'May 4 = 2023', 'May 4 & 2023', 'May 4 ~ 2023',
  'May 4 ^ 2023', 'May 4 [ 2023', 'May 4 ] 2023', 'May 4 { 2023',
  'May 4 + 2023', 'May + 4 2023', 'May 4 ) 2023', 'May 4 2023 )',
  ') 2023-05-04', 'May ) 4', '2023-05-04 )', 'May 4 ,, 2023',
  'May 4 2023 ; 10:20', ';May 4 2023', 'May ; 4 2023', '2023- 05-04',
  '2023- 05- 04', '2023 - 05-04', 'May 4. 2023', 'May 4 .2023',
  'May 4 2023 .', 'May .4 2023', 'May. 4 2023', '2023. 05. 04',
  '2023 .05 .04', '.2023-05-04', '. 2023-05-04', 'May 4 .. 2023',
);
// garbage words: legal before the first number, never directly before
// one; the composer then routes whatever followed ("Xyz.4 2023" dies
// on day 2023, "Xyz.1" lives)
fuzz.push(
  'Xyz,1', 'Xyz.May4', 'Xyz,May 4', 'Xyz. 1', 'Xyz .1', 'Xyz . 1',
  'Xyz.. 1', 'Xyz.1', 'Xyz: 1', 'Xyz:1 2023', 'Xyz- 1', 'Xyz - 1',
  'Xyz(a)1', 'Xyz(a) May 4', 'Xyz-May 4', 'Xyz--1', 'Xyz.4 2023',
  'Xyz-4 2023', 'Xyz;1', 'Xyz:1', 'Xyz/1', 'Xyz., 1', 'Xyz.;1',
);
// time-slot details: "n::" only while the time is empty; whitespace,
// symbols and month words may sit after a time colon; a fraction
// REQUIRES a directly-following number whose ms value lands on the
// next slot (range-checked — "10:20.5" is Invalid, "10:123.5" is 10:05)
fuzz.push(
  'May 4 10::30', 'May 4 10:: 30', 'May 4 10::', 'May 4 10::30.5',
  'May 4 10: (x) 20', 'May 4 10: Jun 20', 'May 4 10: 2023',
  'May 4 10: 2023-05-04', 'May 4 10:20:30 .5', 'May 4 10:20:30 . 5',
  'May 4 10:20:30.5 .3', 'May 4 10 :20', 'May 4 10:,20', 'May 4 10:. 20',
  'May 4 2023 10: 20: 30', 'May 4 2023 10:20: 30', 'May 4 10:.5',
  'May 4 10:20:30:40', 'May 4 10:20:30:40:50', '10:20:30:40 May 4',
  'May 4 10::20:30', 'May 4 10:20::30', 'May 4 ::20', 'May 4 10:20:30.',
  'May 4 10:20:30. 5', 'May 4 10:20:30.x', 'May 20:30 4 10:20',
  'May 4 25:00', 'May 4 24:30', 'May 4 10:20,2023', 'May 4 10:20, 2023',
  'May 4 10:20 ,2023', 'May 4 10:20:30 2023', '05 10:20 04 2023',
  '12 10:20 01 02', '2023 10:20 05 04', 'May 10:20 4 2023', '10:20 May 4 2023',
  'May 4 10:20:60.5.3', '12345678901 May', 'May 4 99999999999',
);
// zone details: words are exact-run matches taking effect only after a
// number (a leading one is dropped), last zone token wins, offsets
// route by an attached ':' first and then by digit count
fuzz.push(
  'May 4 2023 10:20 GMT EST', 'May 4 2023 10:20 EST GMT', 'May 4 10:20 +002:30',
  'May 4 10:20 +002', 'May 4 10:20 +00230', 'May 4 2023 10:20 Z +02:00',
  'May 4 2023 10:20 +02:00 Z', 'May 4 2023 10:20 +02:00 +03:00',
  'May 4 2023 10:20 GMT +2', 'May 4 2023 10:20 GMT +2:3', 'May 4 2023 10:20 GMT (x)+2',
  'May 4 2023 10:20 GMT xyz', 'May 4 2023 10:20 GMTx', 'May 4 2023 10:20 UTCish',
  'May 4 2023 10:20 pmx', 'May 4 2023 10:20 amish', 'May 4 10:20 Zx',
  'May 4 2023 10:20 +02: 00', 'May 4 10:20 +02 :00', 'May 4 10:20 +02:00 :30',
  'May 4 10:20 +02:77 30', 'May 4 10:20 +02 30', 'May 4 10:20 -',
  'May 4 10:20 +', 'May 4 10:20+02:00pm', 'Z 2023-05-04', 'UTC 2023-05-04',
  'GMT 2023-05-04 10:20', 'EST2023-05-04', '2023-05-04 EST+2', '2023-05-04EST+2',
  'May 4 2023 10:20 ut', 'May 4 10:20:30-0500', 'May 4 2023 10:20 , pm',
);
// ES5 commit boundary: "YYYY-MM" (exact widths) commits; a '-' after a
// consumed 2-digit day is a hard failure, other breaks restart the
// legacy parser from the top (so zero-padded small years remap)
fuzz.push(
  '2023-05-04-10:20', '2023-05-04-', '12-01-02-', '12-01-', '2023-',
  'May 4 2023-', 'May 4 99-0500-', 'May 4 10:20 99-', '2023-05-04- 10:20',
  '2023-05-04 -', '2023-05-04-10', '2023-05-04-Z', '12-01-02-10:20',
  '12-01-02 -10:20', 'May-4-2023-', 'May-', '999-01-01-10:20',
  '2023-5-04-10:20', '2023-05-004', '2023-05-004-01', '2023-05-04-05',
  '2023-05T10:20', '2023-05t10:20', '0099-01T10:20', '2023-05-045',
  '2023-054-04', '+012023-01-01-10:20', '12023-01-01-10:20',
  '2023-05.04-10:20', '2023-05-04.10:20', '2023-05-', '2023-05- 04',
  '2023-05-x', '2023-05-04T', '2023-05-04T10', '2023-05-04T10:2',
  '0099-01-', '0099-01-01 10:20', '0013-01-02 10:20', '2023-05-04T10:20 2024',
  '2023-05-04T10:20:30 +02:00', '2023-05-04T10:20:30 x', '2023-05-04T10:20:30Z 5',
  '2023-05-04T10:20:30+02:0', '2023-05-04T10:20:30.', '2023-05-04T10:20.5',
  '0099', '0001', 'May 4 2023 10:20 2024 2025 2026',
);
// signed six-digit years are literal in the legacy parser too, only
// when directly attached at the front
fuzz.push(
  '-012023-01-01 10:20', '+012023-01-01 10:20', 'Jan +012023-01-01',
  'May +012023-02-03', '+ 012023-01-01', 'May 4 10:20 +012023',
  'Tue May 4 2023', 'Wed May 4 2023', 'May 4 T 2023', '2023-05-04 T 10:20',
);
// a sign with the time open (even unfinalized) starts an offset; it
// must be DIRECTLY followed by a number or a colon — "±:" is a
// zero-hour offset with the minute pending (found by the token-soup
// fuzz: '%05:-:1123pm' parses as year 1123, 5pm, offset −0:00)
fuzz.push(
  '%05:-:1123pm', '05:-:1123pm', 'May 4 10:-2023', 'May 4 10: - 1123',
  'May 4 10:- 1123', 'May 4 10:20 - 2023', 'May 4 10:20- 2023',
  'May 4 10:20-2023', 'May 4 10:20:-30', 'May 4 10:20: -30',
  'May 4 10:20 -', 'May 4 10: -', 'May 4 10:- pm', 'May 4 10:-',
  'May 4 10:20 -:30', 'May 4 10:20 +:30', 'May 4 10:-:20',
  'May 4 10:-:61', 'May 4 10:-:20:30', 'May 4 10:-.20', 'May 4 10:-(x)20',
  'May 4 10:20 -:', 'May 4 10:20 -Z', 'May 4 10:20 -pm', 'May 4 10:20 -GMT',
  'May 4 10:-Jun', 'May 4 10:20:30 -.5', 'May 4 10:--2023', 'May 4 10:-+2023',
  'May 4 10:20 --2023', 'May 4 10:20:60- 99', 'May 4 2023 10:20:30.5- pm',
  'May 4 - 10:20',
);
// the ES5 layer is a token-PREFIX parser sharing the scanner with the
// legacy loop: a partial prefix COMMITS its numbers as legacy date
// components and the legacy loop continues at the first unusable token
// (with that token's own symbol adjacency intact); a break after a
// consumed T is a hard Invalid; a complete match is literal ISO
fuzz.push(
  '2023-05:30', '2023:', '2023:05', '0500:', '0500:30', '123:30',
  '2023-05 Jun', '2023-05Xyz', '2023+05', '2023-05-04 1 2',
  '2023-13:30', '2023-05-13:30', '2023-5:30', '2023-May', '2023-May-04',
  '2023-10.5', '2023-13.5', '2023- 05', '2023-+05', '2023-',
  '0049', '0049 10:20', '0500:01:02', '2023:05:06', '1230:05',
  '2023-05:30:40', '2023-05-04:30', '2023-05-04 :30', '2023-05T24:00',
  '2023-05t10:20', '2023T10:20', '0000-01-01', '0000', '0001-01-01 10:20',
  '2023-05-04T10:20+2:30', '2023-05-04T24:00:00.5', '2023-05-04T10:20:30.',
  '2023-05-04T10:20+023000', '2023-05-04TT10:20', '2023-05-04Tz',
  '2023-05-04T10:20:30Z pm', '2023-05-04T 10:20', '2023-05-04T10 :20',
  '2023-05-04t 10:20', '2023-05-04 t10:20', '2023-05-04 t 10:20',
  't2023-05-04', 'ts ts May 4 2023', 'May t 4 2023', 'May 4 t 2023',
);
// signed expanded years belong to the ES5 PREFIX alone (legacy has no
// signed years); the six-digit year is consumed before the minus-zero
// check rejects
fuzz.push(
  '-012023-01-01 10:20', 'Xyz -012023', '- 012023', 'Xyz +012023',
  '(x) -012023-01-01', '-12023', '-012023', '+012023', '-000000',
  '+000000', '-000099-01-01 10:20', '-000099', 'May 4 -012023',
  '10:20 -012023', '+012023-05:30', '-012023:30', '+012023T10:20',
  '+012023-05-04T10:20',
);
// V8 never pre-trims: the ES5 prefix engages only at the very first
// token, so leading garbage/whitespace demotes to legacy (year mapping
// returns) and trailing whitespace breaks ES5 completeness
fuzz.push(
  ' 0099-01-01', '0099-01-01 ', '0099-01-01\t', ' 2023-05-04T10:20',
  '2023-05-04T10:20 ', '\t0099-01-01', ' -012023', ' +012023-01-01',
  '  2023', '2023 ', ' 1210:', '1210:', ' 2023-05-04', '(x)0099-01-01',
  '%0099-01-01', ', 0099-01-01', '0099-01-01\n', '2023-05-04T10:20Z ',
  ' T10:20', ' 6010:EST', '  -012023/(Z0500/',
);

// r17 sweep findings: the ':'-routed zone offset is uncapped hours in
// wrapping int32 SECONDS over the guarded number reader (leading zeros
// skipped, value frozen once >= 1e8), a wrapped-negative total is
// Invalid unless a later zone WORD overwrites it, and long fractions
// scale over min(rawLen, 9) with the frozen value (leading zeros drop
// out of long runs).
fuzz.push(
  'Jan 1 2001 Z-0500::', 'Jan 1 2001 Z-500::', 'Jan 1 2001 Z-05002023::',
  'Jan 1 2001 Z-123456::', 'Jan 1 2001 Z+123456789::', '12/Z-05002023::',
  'Jan 1 2001 Z-999999999:', 'Jan 1 2001 Z-9999999999::',
  'Jan 1 2001 Z-1000000000::', 'Jan 1 2001 Z-1000000001::',
  'Jan 1 2001 Z-99999999::', 'Jan 1 2001 Z+99999999::',
  'Jan 1 2001 Z-314159265::', 'Jan 1 2001 Z-299999999::',
  'Jan 1 2001 Z-12345678901234::', 'Jan 1 2001 Z-00000123456::',
  'Jan 1 2001 Z-123456789:30', 'Jan 1 2001 Z-0500:77',
  'Jan 1 2001 Z-99999999:: GMT', 'Jan 1 2001 Z-99999999:: +0500',
  'May 4 10:20:30.599999999999', 'May 4 10:20:30.059999999999',
  'May 4 10:20:30.009999999999', 'May 4 10:20:30.00000000059',
  'May 4 10:20:30.100000000001', 'May 4 10:20:30.12345678901',
  'May 4 10:20.059', 'May 4 10:20.0599', 'May 4 10:20.059999999999',
  'May 4 10:20.00000000059', 'May 4 10:20.599999999999',
  '4GMT10:20.599999999999GMT', 'May 4 99999999999 10:20',
);

// r17 scanner character classes: V8's date whitespace is \t\n\v\f\r,
// space, Zs (NBSP, ideographic space, thin space) and ZWNBSP/BOM -
// NOT the other C0 controls (skip symbols, which fail the time-close
// adjacency rule), NOT U+2028/U+2029 or Cf formats (word chars). A NUL
// truncates the whole input before parsing, ES5 completeness included.
fuzz.push(
  'May\u00a04, 2023',
  'May 4,\u00a02023',
  '\u00a02023-05-04',
  '2023-05-04\u3000',
  'May\u30004 2023',
  '2023-05-04\ufeff',
  'May\u20094 2023',
  'May 4 2023 10:20\u00a0',
  'May 4 2023 10:20\u3000',
  'May 4 2023 10:20\ufeff',
  'May 4 2023 10:20\u0007',
  'May 4 2023 10:20\u001f',
  'May 4\u00072023',
  'May 4\u001f2023',
  '2023-05-04\u2028',
  '\u20282023-05-04',
  'May 4\u200b2023',
  '2023\u180e-05-04',
  'May 4 2023\u200e',
  '\u200e2023-05-04',
  'May 4 2023 GMT\u00a0+5',
  'May 4 2023 10:20\u00a0pm',
  'May\u00a0Jun 4 2023',
  '2023\u00a0-05-04',
  'May 4\u00002023',
  '2023-05-04\u0000junk',
  '\u0000',
  '0099-01-01\u0000 10:20',
  'May 4 2023 10:20pm\u00a0',
);

// parsed milliseconds count against the ±8.64e15 ms range and the
// hour-24 all-zero rule, even though output formatting drops them
fuzz.push(
  '+275760-09-13T00:00:00.5Z', '+275760-09-13T00:00:00.000Z',
  '+275760-09-12T23:59:59.999Z', '-271821-04-20T00:00:00.000Z',
  '-271821-04-20T00:00:00.001Z', '2023-05-04T24:00:00.5',
  '2023-05-04T24:00:00.000Z', 'May 4 2023 24:00:00.5',
  'May 4 275760 10:20:30.5 GMT', 'Sep 13 275760 00:00:00.5 GMT',
);

const inputs = [...base, ...fuzz];

function fmt(d, withTime) {
  if (isNaN(d.getTime())) return '\\N';
  // fixTriple.js:152-156 / 201-208
  const month = d.getMonth() < 9 ? `0${d.getMonth() + 1}` : `${d.getMonth() + 1}`;
  const date = `${d.getFullYear()}-${month}-${d.getDate()}`;
  if (!withTime) return date;
  return `${date}T${d.getHours()}:${d.getMinutes()}:${d.getSeconds()}`;
}

const seen = new Set();
for (const input of inputs) {
  if (seen.has(input)) continue;
  seen.add(input);
  const d = new Date(input);
  // TSV-encode the input (tabs/newlines never occur; escape just in case)
  // non-ASCII and controls \u-escape so the committed table stays pure
  // ASCII (a locale-decoding reader can never mangle it) — the spec's
  // unescape reverses this
  const key = input
    .replace(/\\/g, '\\\\').replace(/\t/g, '\\t').replace(/\n/g, '\\n')
    .replace(/[^\x20-\x7E]/g, c => '\\u' + c.codePointAt(0).toString(16).padStart(4, '0'));
  process.stdout.write(`${key}\t${fmt(d, false)}\t${fmt(d, true)}\n`);
}
