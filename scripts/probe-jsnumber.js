#!/usr/bin/env node
// Differential probe for the two JS numeric mirrors:
//
//   - `Number(value)` coercion validity (reference validateTriple.js:136-139
//     validates xsd:integer with `!isNaN(Number(v))`; fixTriple.js re-types
//     on the same gate) — mirrored by Validation.jsNumberRegex;
//   - `parseInt(value)` (reference lib/utils.js:16 coerces xsd:integer
//     bindings) — mirrored by Bindings.typed.
//
// Prints one TSV row per input:
//
//     input<TAB>number_ok<TAB>parseint        (ok|nan; \N for parseInt NaN,
//                                             else exact digits of the double)
//
// Regenerate the committed table with:
//
//     node scripts/probe-jsnumber.js > src/test/resources/jsnumber/corpus.tsv
//
// JsNumberMirrorSpec consumes the TSV and — when node is on PATH — reruns
// this script and asserts the committed table is current.
'use strict';

const inputs = [
  // decimal / exponent forms
  '12', '-12', '+12', '1.5', '.5', '5.', '1e3', '1E3', '1e+3', '1e-3',
  '.5e3', '1.e3', '1e', 'e3', '.e3', '+', '-', '+.', '1.2.3', '00',
  '0008', '08', '1_000', '1 2', '12abc', 'abc', '1.5.6', '--1', '+-1',
  '1e999', '-1e999', '1.7976931348623157e308',
  // empty / whitespace (JS trims the full WhiteSpace+LineTerminator set:
  // NBSP, BOM, line/para separators, Zs spaces; U+180E is NOT in it)
  '', ' ', '  12  ', '\t\n12', '\u000b12', '\u00a012', '\ufeff12',
  '\u202812', '\u202912', '\u300012', '\u200a12', '\u180e12',
  '12\u00a0', '\u00a0',
  // named specials
  'Infinity', '-Infinity', '+Infinity', 'infinity', 'INFINITY', 'NaN',
  '-NaN',
  // radix literals: Number() takes unsigned 0x/0b/0o only; parseInt
  // takes signed 0x only (no binary/octal, "08" is decimal 8)
  '0x10', '0X1f', '-0x10', '+0x10', '0x', '0xzz', '0xG', '0x10abcg',
  '0b101', '0B11', '0b12', '0b', '0o17', '0O17', '0o19', '0o', '0o8',
  // parseInt prefix semantics
  '12.9', '-12.9', '12px', '1e3px', '0x0', '-0', '0xffffffffffffffff',
  '0x1fffffffffffff', '0x20000000000000',
  // precision edge: parseInt returns a double, so digits beyond 2^53
  // round (the Scala mirror keeps exact decimals — documented residual)
  '99999999999999999999999999', '9007199254740993',
  // r17 sweep finding: hex literals wider than 64 bits make Spark's
  // ANSI `conv` throw — the mirror guards them to null (ledgered:
  // node returns the rounded double). Leading zeros are significant-
  // stripped first, so a zero-padded small hex still converts.
  '0x1ffffffffffffffff', '0xffffffffffffffffffffffffffffffffffffffff',
  '-0x1ffffffffffffffff', '0x00000000000000000000ff',
  '0x0000000000000000000000', '0x0000000000000000000001f',
];

function fmtParseInt(v) {
  if (Number.isNaN(v)) return '\\N';
  // exact digit string of the double (toString would use exponent form
  // for |v| >= 1e21); BigInt prints all significant digits
  return BigInt(v).toString();
}

const seen = new Set();
for (const input of inputs) {
  if (seen.has(input)) continue;
  seen.add(input);
  const key = input
    .replace(/\\/g, '\\\\').replace(/\t/g, '\\t').replace(/\n/g, '\\n')
    .replace(/[^\x20-\x7E]/g, c => '\\u' + c.codePointAt(0).toString(16).padStart(4, '0'));
  const numberOk = !isNaN(Number(input)) ? 'ok' : 'nan';
  process.stdout.write(`${key}\t${numberOk}\t${fmtParseInt(parseInt(input))}\n`);
}
