package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth table from SURVEY §1.2 / reference lib/validateTriple.js — one
  * case per branch, including the documented quirks. */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def validate(terms: Seq[Term]): Seq[Boolean] = {
    terms.toDS().withColumn("ok", Validation.isValidTerm(struct(
      $"termType", $"value", $"datatype", $"lang")))
      .select("ok").as[Boolean].collect().toSeq
  }

  private def check(term: Term, expected: Boolean, clue: String): Unit =
    assert(validate(Seq(term)) == Seq(expected), s"case: $clue ($term)")

  test("blank nodes are invalid (validateTriple.js:34-35)") {
    check(Term.blank("b0"), expected = false, "blank node")
  }

  test("IRI / no datatype is valid (validateTriple.js:36-38)") {
    check(Term.iri("http://example.org/x"), expected = true, "IRI")
  }

  test("rdfs:Literal is invalid (validateTriple.js:40-41)") {
    check(Term.typed("abc", Vocab.rdfsLiteral), expected = false, "rdfs:Literal")
  }

  test("langString requires a non-empty tag (validateTriple.js:42-45,92-94)") {
    check(Term.langLit("hallo", "nl"), expected = true, "lang nl")
    check(Term(Term.Literal, "hallo", Vocab.rdfLangString, ""), expected = false, "empty tag")
    check(Term(Term.Literal, "hallo", Vocab.rdfLangString, null), expected = false, "null tag")
  }

  test("xsd:string and rdf:HTML are valid; rdf:XMLLiteral is not") {
    check(Term.lit("plain"), expected = true, "xsd:string")
    check(Term.typed("<p>x</p>", Vocab.rdfHTML), expected = true, "rdf:HTML")
    check(Term.typed("<x/>", Vocab.rdfXMLLiteral), expected = false, "XMLLiteral")
  }

  test("xsd:boolean accepts exactly lowercase true/false (validateTriple.js:101-103)") {
    check(Term.typed("true", Vocab.xsdBoolean), expected = true, "true")
    check(Term.typed("false", Vocab.xsdBoolean), expected = true, "false")
    check(Term.typed("TRUE", Vocab.xsdBoolean), expected = false, "TRUE")
    check(Term.typed("1", Vocab.xsdBoolean), expected = false, "1")
  }

  test("xsd:date shape check only — bad calendar dates pass (validateTriple.js:110-116)") {
    check(Term.typed("2023-05-04", Vocab.xsdDate), expected = true, "plain")
    check(Term.typed("2023-05-04Z", Vocab.xsdDate), expected = true, "Z")
    check(Term.typed("2023-05-04+02:00", Vocab.xsdDate), expected = true, "offset")
    check(Term.typed("-0044-03-15", Vocab.xsdDate), expected = true, "negative year")
    check(Term.typed("1997-99-99", Vocab.xsdDate), expected = true, "quirk: shape-only")
    check(Term.typed("May 4 2023", Vocab.xsdDate), expected = false, "prose date")
    check(Term.typed("2023-5-4", Vocab.xsdDate), expected = false, "unpadded")
  }

  test("xsd:dateTime shape check (validateTriple.js:123-129)") {
    check(Term.typed("2023-05-04T10:11:12", Vocab.xsdDateTime), expected = true, "local")
    check(Term.typed("2023-05-04T10:11:12.5Z", Vocab.xsdDateTime), expected = true, "frac+Z")
    check(Term.typed("2023-05-04T10:11:12-05:00", Vocab.xsdDateTime), expected = true, "offset")
    check(Term.typed("2023-05-04 10:11:12", Vocab.xsdDateTime), expected = false, "space sep")
    check(Term.typed("2023-05-04", Vocab.xsdDateTime), expected = false, "date only")
  }

  test("xsd:integer via JS Number() — floats/hex/empty accepted (validateTriple.js:136-139)") {
    check(Term.typed("42", Vocab.xsdInteger), expected = true, "int")
    check(Term.typed("-42", Vocab.xsdInteger), expected = true, "neg")
    check(Term.typed("4.5", Vocab.xsdInteger), expected = true, "quirk: float")
    check(Term.typed("1e5", Vocab.xsdInteger), expected = true, "quirk: exponent")
    check(Term.typed("0x1F", Vocab.xsdInteger), expected = true, "quirk: hex")
    check(Term.typed("Infinity", Vocab.xsdInteger), expected = true, "quirk: Infinity")
    check(Term.typed("", Vocab.xsdInteger), expected = true, "quirk: empty → 0")
    check(Term.typed("  12  ", Vocab.xsdInteger), expected = true, "quirk: ws-trim")
    check(Term.typed("abc", Vocab.xsdInteger), expected = false, "NaN")
    check(Term.typed("NaN", Vocab.xsdInteger), expected = false, "literal NaN")
    check(Term.typed("+0x1F", Vocab.xsdInteger), expected = false, "signed hex NaN")
  }

  test("wktLiteral: CRS URL must be http, absent CRS is ok (validateTriple.js:71-90)") {
    check(Term.typed("POINT(1 2)", Vocab.wktLiteral), expected = true, "no CRS")
    check(Term.typed("<http://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)",
      Vocab.wktLiteral), expected = true, "http CRS")
    check(Term.typed("<https://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)",
      Vocab.wktLiteral), expected = false, "https CRS")
    check(Term.typed("", Vocab.wktLiteral), expected = false, "empty")
  }

  test("wktLiteral: an unparseable CRS URL is invalid — JS new URL() throw mirror (validateTriple.js:82-88)") {
    // expectations derived by running each URL through node's `new URL`
    // (v20) — a constructor throw is the reference's catch branch
    def wkt(crs: String) = Term.typed(s"<$crs> POINT(1 2)", Vocab.wktLiteral)
    check(wkt("http://a^b"), expected = false, "forbidden ^ in host (throws)")
    check(wkt("http://a|b"), expected = false, "forbidden | in host (throws)")
    check(wkt("http://a]b"), expected = false, "forbidden ] in host (throws)")
    check(wkt("http://host:99999"), expected = false, "port > 65535 (throws)")
    check(wkt("http://@"), expected = false, "empty host after userinfo (throws)")
    check(wkt("http://a%zzb"), expected = false, "bad percent escape in host (throws)")
    check(wkt("http://host:65535/x"), expected = true, "max port parses")
    check(wkt("http://host:"), expected = true, "empty port parses")
    check(wkt("http://u:p@h/x"), expected = true, "userinfo parses")
    check(wkt("http://a@b@c/x"), expected = true, "userinfo up to last @ (host c)")
    check(wkt("http://a%41b"), expected = true, "valid percent escape in host")
    check(wkt("http://[::1]:80/x"), expected = true, "bracketed IPv6 host")
    check(wkt("http://host:8080/a^b"), expected = true, "^ allowed in path")
    check(wkt("http://a\\b"), expected = true, "backslash ends authority like / (host a)")
    check(wkt("https://host:99999"), expected = false, "https AND unparseable both invalid")
  }

  test("n3 re-parse gate: malformed IRIs and language tags are invalid (validateTriple.js:11-16)") {
    // the reference N3-parses the serialized line before any term rule;
    // chars the IRIREF production forbids, or a malformed LANGTAG, are
    // parse errors → invalid
    check(Term.iri("http://x/a b"), expected = false, "space in IRI")
    check(Term.iri("http://x/{a}"), expected = false, "braces in IRI")
    check(Term.iri("http://x/a\\b"), expected = false, "backslash in IRI")
    check(Term.iri("http://x/a%20b"), expected = true, "escaped space is fine")
    check(Term.typed("v", "http://dt/a b"), expected = false, "space in datatype IRI")
    check(Term.langLit("v", "en us"), expected = false, "space in language tag")
    check(Term.langLit("v", "123"), expected = false, "numeric-first language tag")
    check(Term.langLit("v", "en-"), expected = false, "trailing hyphen tag")
    check(Term.langLit("v", "en-US"), expected = true, "well-formed subtag")
    check(Term.langLit("v", "nl"), expected = true, "plain tag")
  }

  test("unknown datatypes are invalid (validateTriple.js:65-67)") {
    check(Term.typed("12", Vocab.xsdInt), expected = false, "xsd:int (not integer)")
    check(Term.typed("1.5", "http://www.w3.org/2001/XMLSchema#decimal"),
      expected = false, "xsd:decimal")
  }

  // ---------------------------------------------------------------------
  // node-probed `new URL` corpus for the throw mirror. The table at
  // src/test/resources/jsurl/corpus.tsv is GENERATED by
  // `node scripts/probe-jsurl.js` — no row is hand-transcribed. Gates:
  // non-residual rows must match node; each documented residual must
  // still diverge in the recorded direction; rerunning the script must
  // reproduce the committed bytes when node is present.
  // ---------------------------------------------------------------------

  /** Rows where the mirror deliberately diverges from node — EMPTY
    * since r17: the IDNA/punycode class (the last entries) is
    * implemented via RFC 3492 decode + icu4j's UTS46 tables with the
    * URL Standard's option set (JsUrlMirror.domainToAscii). The mechanism
    * stays so a future divergence can be ledgered instead of silently
    * shipped. */
  private val urlResiduals: Set[String] = Set()

  /** Rows the WKT extraction regex can never produce (no `//` after the
    * scheme) — asserted unreachable instead of mirrored. */
  private val urlUnreachable: Set[String] = Set(
    "http:/\\host/", "http:\\\\host/")

  private def tsvUnescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b += '\t'
          case 'n' => b += '\n'
          case c   => b += c
        }
        i += 2
      } else { b += s.charAt(i); i += 1 }
    }
    b.toString
  }

  private val urlCorpusPath =
    java.nio.file.Paths.get("src/test/resources/jsurl/corpus.tsv")

  private lazy val urlCorpus: Seq[(String, Boolean)] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(urlCorpusPath).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        val cols = line.split("\t", -1)
        (tsvUnescape(cols(0)), cols(1) == "ok")
      }
  }

  private lazy val urlGot: Map[String, Boolean] = {
    val df = urlCorpus.map(_._1).toDF("u")
      .select($"u", Validation.isJsParseableUrl($"u").as("ok"))
    df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
  }

  test("new URL throw mirror matches node on the probe corpus") {
    val checked = urlCorpus
      .filterNot(r => urlResiduals.contains(r._1) || urlUnreachable.contains(r._1))
    assert(checked.size > 60)
    checked.foreach { case (u, nodeOk) =>
      assert(urlGot(u) == nodeOk,
        s"url '$u': mirror says ${urlGot(u)}, node says $nodeOk")
    }
  }

  test("each documented URL residual still diverges: parses here, throws in node") {
    urlResiduals.foreach { u =>
      val row = urlCorpus.find(_._1 == u)
      assert(row.isDefined, s"residual '$u' missing from corpus.tsv — add it to probe-jsurl.js")
      assert(!row.get._2, s"residual '$u' now parses in node — it is not a divergence; drop it")
      assert(urlGot(u), s"residual '$u' now throws here too — close the ledger entry")
    }
  }

  test("the no-authority-slash rows cannot be extracted as a WKT CRS at all") {
    urlUnreachable.foreach { u =>
      val extracted = Seq(s"<$u> POINT(1 2)").toDF("v")
        .select(regexp_extract($"v", Validation.wktCrsRegex, 1).as("crs"))
        .collect().head.getString(0)
      assert(extracted != u, s"'$u' is extractable — mirror it instead of exempting it")
    }
  }

  test("live differential fuzz: 250 seeded URL variants agree with node") {
    import scala.sys.process._
    assume("which node".! == 0, "node not on PATH — live fuzz skipped")
    val rnd = new scala.util.Random(20260815)
    val labels = Seq("a", "ex", "www", "opengis", "a-b", "x9", "3d", "0x7f",
      "255", "256", "1", "foo", "a%41b", "a%2Fb", "a%zz", "xn--a",
      // the r17 IDNA arm: valid/invalid ACE, decoded-hyphen forms,
      // case variants, raw and escaped non-ASCII
      "xn--tda", "xn--caf-dma", "xn--caf-dma-", "xn--123", "xn--zzz",
      "xn--ab-c", "xn----", "xn--a-", "XN--TDA", "xn--1ug", "xn--b-gga",
      "caf\u00e9", "b\u00fccher", "%C3%A9", "\u30c9x",
      // the r17 sweep's divergence-finders: ignored (soft hyphen),
      // minted separator (U+3002), fullwidth, capital sharp S (the
      // ICU/node table skew), leading combining mark, deviation sigma
      "xn--tda\u00ad", "a\u3002b", "\uff21\uff11", "\u1e9e", "a\u1e9e",
      "\u0301a", "a\u03c2")
    def label() = labels(rnd.nextInt(labels.size))
    def host() = (0 until (1 + rnd.nextInt(3))).map(_ => label()).mkString(".")
    val ports = Seq("", ":80", ":0", ":000080", ":65535", ":65536", ":99999",
      ":8a", ":", ":0000800000")
    val tails = Seq("", "/", "/a/b?q=1#f", "/x y", "#f", "?q", "\\p")
    val brackets = Seq("[::1]", "[1:2:3:4:5:6:7:8]", "[::ffff:1.2.3.4]",
      "[:::]", "[::1.2.3.04]", "[1:2:3:4:5:6:7]", "[12345::]")
    val fuzz = (0 until 200).map { i =>
      val h = if (i % 9 == 0) brackets(rnd.nextInt(brackets.size)) else host()
      val u = if (i % 7 == 3) "user@" else if (i % 7 == 5) "a@b@" else ""
      s"http://$u$h${ports(rnd.nextInt(ports.size))}${tails(rnd.nextInt(tails.size))}"
    } ++ (0 until 50).map { _ => // pure label soup, no structure guarantees
      "http://" + (0 until (1 + rnd.nextInt(4)))
        .map(_ => label()).mkString(".") + tails(rnd.nextInt(tails.size))
    }
    val distinctFuzz = fuzz.distinct
    // node verdicts in one process: read URLs as JSON, print ok/throw
    val js = "const us=JSON.parse(require('fs').readFileSync(0,'utf8'));" +
      "for(const u of us){let r='throw';try{new URL(u);r='ok'}catch(e){};console.log(r)}"
    val in = new java.io.ByteArrayInputStream(
      distinctFuzz.map(u => "\"" + u.replace("\\", "\\\\") + "\"")
        .mkString("[", ",", "]").getBytes("UTF-8"))
    val out = new StringBuilder
    val code = (Process(Seq("node", "-e", js)) #< in)
      .!(ProcessLogger(l => out.append(l).append('\n'), Console.err.println(_)))
    assert(code == 0, "node fuzz oracle failed")
    val nodeOk = out.toString.split("\n").map(_ == "ok")
    assert(nodeOk.length == distinctFuzz.size)
    val mirror = distinctFuzz.toDF("u")
      .select($"u", Validation.isJsParseableUrl($"u").as("p"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val known = urlResiduals // documented divergences excluded
    distinctFuzz.zip(nodeOk).filterNot { case (u, _) =>
      known.contains(u) || known.contains(u + "/")
    }.foreach { case (u, ok) =>
      assert(mirror(u) == ok, s"live fuzz: '$u' mirror ${mirror(u)}, node $ok")
    }
  }

  test("committed URL corpus is current against this machine's node") {
    import scala.sys.process._
    val script = java.nio.file.Paths.get("scripts/probe-jsurl.js")
    assume("which node".! == 0 && java.nio.file.Files.exists(script) &&
      java.nio.file.Files.exists(urlCorpusPath),
      "node not on PATH — corpus currency check skipped")
    // byte-level comparison via a temp file: ProcessLogger decodes the
    // child's stdout with the JVM's locale charset, which mangles the
    // corpus's non-ASCII IDNA rows under a POSIX locale
    val tmp = java.nio.file.Files.createTempFile("jsurl-probe", ".tsv")
    val code = try (Process(Seq("node", script.toString)) #> tmp.toFile).!
      catch { case e: Exception => fail(s"probe-jsurl.js failed: $e") }
    assert(code == 0, "probe-jsurl.js failed")
    val out = new String(java.nio.file.Files.readAllBytes(tmp),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.deleteIfExists(tmp)
    val committed = new String(java.nio.file.Files.readAllBytes(urlCorpusPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(out == committed,
      "jsurl corpus.tsv is stale — regenerate: node scripts/probe-jsurl.js > src/test/resources/jsurl/corpus.tsv")
  }
}
