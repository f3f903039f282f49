#!/usr/bin/env node
// Differential probe for the JS `new URL` throw mirror behind WKT CRS
// validation (reference validateTriple.js:82-88: a constructor throw
// lands in the catch branch and marks the literal invalid).
//
// Replays each candidate CRS URL through this node's `new URL` and prints
// one TSV row per input:
//
//     url<TAB>ok|throw<TAB>href-or-empty
//
// Regenerate the committed table with:
//
//     node scripts/probe-jsurl.js > src/test/resources/jsurl/corpus.tsv
//
// ValidationSpec consumes the TSV as ground truth for the
// wktUrlParseRegex mirror and — when node is on PATH — reruns this
// script and asserts the committed table is current.
'use strict';

const urls = [
  // plain forms (the shapes harvested CRS URLs actually take)
  'http://www.opengis.net/def/crs/EPSG/0/31370',
  'http://example.com', 'http://example.com/', 'http://example.com/a/b?q=1#f',
  'https://example.com/x', 'http://example.com./', 'http://EXAMPLE.com/',
  // ports: value rule is <= 65535 AFTER stripping leading zeros
  'http://host:80/', 'http://host:65535/', 'http://host:65536/',
  'http://host:000080/', 'http://host:00000000000000000080/',
  'http://host:0000800000/', 'http://host:8a/', 'http://host:/',
  'http://host:-1/', 'http://host:99999/',
  // forbidden host code points
  'http://exa mple.com/', 'http://exa<mple.com/', 'http://exa>mple.com/',
  'http://exa#mple.com/', 'http://exa^mple.com/', 'http://exa|mple.com/',
  'http://exa[mple.com/', 'http://exa]mple.com/',
  // percent-escapes: %HH decoding to a forbidden domain char throws,
  // others are fine; a bare % (not a valid escape) throws
  'http://a%2Fb/', 'http://a%2fb/', 'http://a%5Cb/', 'http://a%3Ab/',
  'http://a%40b/', 'http://a%23b/', 'http://a%25b/', 'http://a%00b/',
  'http://a%20b/', 'http://a%41b/', 'http://a%61b/', 'http://a%2Db/',
  'http://a%zzb/', 'http://a%b/', 'http://a%/',
  // userinfo: everything up to the LAST @ is userinfo
  'http://user@host/', 'http://a@b@c/', 'http://user:pw@host:81/p',
  'http://@host/', 'http://user@/',
  // backslash ends the authority like a slash (special-scheme rule)
  'http://host\\path', 'http://host\\', 'http://\\path',
  // bracketed IPv6
  'http://[::1]/', 'http://[::1]:80/', 'http://[2001:db8::7]/x',
  'http://[::1', 'http://[zz]/', 'http://[:::]/', 'http://[]/',
  'http://[1.2.3.4]/',
  // empty / missing host
  'http://', 'http:///path', 'http://:80/', 'http://?q', 'http://#f',
  // IPv4 parsing: a host whose last label is numeric goes through the
  // IPv4 parser — overflow and part-count violations throw
  'http://1.2.3.4/', 'http://300.1.1.1/', 'http://1.2.3.4.5/',
  'http://999999999999/', 'http://0x7f.1/', 'http://1.2.3.04/',
  'http://foo.12/', 'http://foo.0x1/',
  // tabs/newlines are stripped pre-parse by WHATWG (control chars)
  'http://exa\tmple.com/', 'http://exa\nmple.com/',
  // IPv6 bracket content (WHATWG IPv6 parser): 8 pieces exactly, or
  // fewer with one ::, optional strict dotted-quad as the final 32 bits
  'http://[1:2:3:4:5:6:7:8:9]/', 'http://[1:2:3:4:5:6:7]/',
  'http://[12345::]/', 'http://[1::2::3]/', 'http://[::1:2:3:4:5:6:7]/',
  'http://[::1:2:3:4:5:6:7:8]/', 'http://[1:2:3:4:5:6:7::]/',
  'http://[::ffff:1.2.3.4]/', 'http://[1:2:3:4:5:6:1.2.3.4]/',
  'http://[1:2:3:4:5:6:7:1.2.3.4]/', 'http://[1:2:3:4:5::1.2.3.4]/',
  'http://[1:2:3:4:5:6::1.2.3.4]/', 'http://[::1.2.3.04]/',
  'http://[::1.2.3.400]/', 'http://[::1.2.3]/', 'http://[::ffff:1.2.3.4.5]/',
  'http://[1.2.3.4::]/', 'http://[ABCD::ef01]/', 'http://[abcd:EF01::]/',
  'http://[:1:2]/', 'http://[1:2:]/', 'http://[0:0:0:0:0:0:0:0]/',
  'http://[::0001]/', 'http://[0::00:000:0000]/', 'http://[00000::]/',
  'http://[1::2:1.2.3.4]/', 'http://[::0:1.2.3.4]/', 'http://[::2]/',
  'http://[2::]/', 'http://[fe80::1%25eth0]/',
  // IDNA / punycode (r17: implemented — formerly the residual ledger).
  // ACE labels: RFC 3492 decode failures throw (incomplete sequence,
  // overflow, empty output), a decoded label must already be canonical
  // (lowercase, NFC, no disallowed/context-breaking code points), and
  // the hyphen/length checks are OFF per the URL Standard's UTS46
  // options — so a decoded trailing hyphen is fine
  'http://xn--a/', 'http://xn---/', 'http://xn--/', 'http://xn----/',
  'http://xn--a-/', 'http://xn--as-/', 'http://xn--ab-c/', 'http://xn---a/',
  'http://xn--nxasmq6b/', 'http://xn--caf-dma.fr/', 'http://xn--caf-dma-/',
  'http://xn----dma.fr/', 'http://xn--80ak6aa92e.com/', 'http://xn--0.com/',
  'http://xn--a-ecp.ru/', 'http://xn--a.com/', 'http://xn--ls8h.la/',
  'http://xn--n3h.net/', 'http://xn--fiqs8s/', 'http://xn--wgbh1c/',
  'http://xn--kgbechtv/', 'http://xn--e1afmkfd.xn--p1ai/', 'http://xn--zzz/',
  'http://xn--123/', 'http://xn--a-9b/', 'http://xn--b-gga/',
  'http://xn--1ug/', 'http://xn--3e0b707e/', 'http://xn--what-ever/',
  'http://xn--abcdefghijklmnop/', 'http://xn--a-zz9z/', 'http://xn--aa--bb/',
  'http://xn--9999999/', 'http://xn--aaa999/', 'http://xn--pokxncvks/',
  'http://xn--vermgensberatung-pwb/', 'http://XN--NXASMQ6B/',
  'http://Xn--caf-dma.fr/', 'http://a.xn--a.b/', 'http://xn--tda/',
  'http://xn--0ca/', 'http://xn--99999999999/', 'http://xn--a-0aaaaaaaaaa/',
  'http://xn--4db.com/', 'http://xn--caf-dma%2e.fr/',
  // non-ASCII hosts: UTS46 mapping/validity (nontransitional; STD3 off)
  'http://café.fr/', 'http://bücher.de/', 'http://ß.de/',
  'http://͸.com/', 'http://a‍b/', 'http://ドメイン.jp/',
  'http://%C3%A9.fr/', 'http://a.é.b/', 'http://אב.com/',
  'http://123א.com/', 'http://a．b/', 'http://。/',
  // escape-set boundary: %3B ; %7B { %7E ~ %5F _ %60 ` %7F DEL %1F C0
  'http://a%3Bb/', 'http://a%7Bb/', 'http://a%7Eb/', 'http://a%5Fb/',
  'http://a%60b/', 'http://a%7Fb/', 'http://a%1Fb/', 'http://a%C3%A9/',
  // raw backtick and curly braces in the host
  'http://a`b/', 'http://a{b}c/',
  // backslash inside userinfo ends the authority first
  'http://u\\v@host/', 'http://host:0/', 'http://host:00/',
  // IPv4 fuzz band: a host whose LAST dot-label is a number (decimal,
  // 0x-hex, 0-octal) runs the IPv4 parser over the whole host
  'http://255.255.255.255/', 'http://255.255.255.256/',
  'http://256.1.1.1/', 'http://1.2.3.4./', 'http://1.2.3.4../',
  'http://1.2.3./', 'http://4294967295/', 'http://4294967296/',
  'http://0x100000000/', 'http://0xff.0xff.0xff.0xff/',
  'http://1.2.3.09/', 'http://1.2.3.0x/', 'http://1.2.3.0xg/',
  'http://1.65536/', 'http://1.2.16777216/', 'http://1.2.3.4.0x5/',
  'http://1.foo/', 'http://foo.1.2/', 'http://1.2.foo.3/',
  'http://017700000001/', 'http://1.2.3.010/', 'http://1.2.3.08/',
  'http://.1.2.3.4/', 'http://1..2.3/', 'http://0/', 'http://0.0.0.0/',
  'http://%31.2.3.4/', 'http://1.2.3.%34/', 'http://1.2.3.4:80/x',
  // extra slash runs after the scheme are skipped for special schemes
  'http:////host/path', 'http://\\/host/', 'http:/\\host/', 'http:\\\\host/',
  // mapping-first order (r17 sweep findings): UTS46 runs over the WHOLE
  // host BEFORE label split / ACE dispatch / the IPv4 re-route.
  // Ignored code points vanish (soft hyphen around xn--), separator
  // equivalents mint label dots (U+3002/FF0E/FF61), fullwidth forms
  // become ASCII — including digits, which can turn the last label
  // numeric and re-route the whole host to the IPv4 parser
  'http://xn--tda­a/', 'http://­xn--tda/', 'http://xn--tda­/',
  'http://xn----­/', 'http://a。ex。0x10/', 'http://a。/',
  'http://。a/', 'http://１２３/', 'http://a.１０/',
  'http://０x10/', 'http://a｡b/', 'http://Ａ.de/',
  'http://ＸN--TDA/', 'http://xn--tda.0x10/', 'http://0x10.xn--tda/',
  // a host that maps to EMPTY throws; lone separators survive
  'http://%C2%AD/', 'http://.a./',
  // forbidden host code points MINTED by the mapping ('％'→'%', U+3000
  // → space, '：'→':') reject after domainToAscii
  'http://a％b/', 'http://a　b/', 'http://a：80/',
  'http://％41/',
  // validity criterion 5: no leading combining mark (Mn/Mc/Me)
  'http://́a/', 'http://a.́b/', 'http://--́/',
  'http://ाb/',
  // CONTEXTJ: ZWJ needs a preceding virama; ZWNJ takes virama OR the
  // RFC 5892 joining-type bridge (L|D)(T)* ZWNJ (T)*(R|D)
  'http://ل‌ل/', 'http://ل‍ل/',
  'http://ष्‍x/', 'http://x्‌/',
  'http://a‌b/', 'http://ب‌1/', 'http://‌/',
  // decoded ACE text may itself start "xn--" (CheckHyphens is off) and
  // re-encoding is NOT re-checked
  'http://xn--xn--a-ecp/', 'http://xn--0x10/', 'http://xn--a.xn--tda/',
  // U+1E9E: node's table (Unicode 15.0) maps capital sharp S to "ss" —
  // ASCII — where ICU 77 (15.1+) keeps a deviation ß; pinned so the
  // mirror follows node ("xn--tdaẞ" IS "xn--tdass")
  'http://ẞ/', 'http://aẞb/', 'http://xn--tdaẞ/',
  'http://ẞ.de/', 'http://aς/', 'http://ßẞ.de/',
  // mapped input to the ends-in-number check, pre-split forms
  'http://ａ．ａ１/', 'http://a。０x10/',
  // WHATWG trims leading/trailing C0-controls-and-space before parsing
  '  http://a/  ', '\u0001http://a/\u0008', 'http://a/ ',
  ' http://a b/', '\u0000http://a/',
];

for (const u of urls) {
  const key = u.replace(/\\/g, '\\\\').replace(/\t/g, '\\t').replace(/\n/g, '\\n');
  try {
    const parsed = new URL(u);
    process.stdout.write(`${key}\tok\t${parsed.href}\n`);
  } catch (e) {
    process.stdout.write(`${key}\tthrow\t\n`);
  }
}
