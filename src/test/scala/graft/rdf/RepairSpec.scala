package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-branch repair cases mirroring reference lib/fixTriple.js. */
class RepairSpec extends SparkSpec {
  import spark.implicits._

  /** Run fixTerm over one term; None = unrepairable (null struct). */
  private def fix(term: Term): Option[Term] = {
    val rows = Seq(term).toDS().withColumn("fixed", Repair.fixTerm(struct(
      $"termType", $"value", $"datatype", $"lang")))
      .select("fixed").collect()
    Option(rows(0).getAs[Row](0)).map(r =>
      Term(r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
  }

  test("valid terms pass through unchanged (fixTriple.js:61-62)") {
    val t = Term.typed("true", Vocab.xsdBoolean)
    assert(fix(t).contains(t))
  }

  test("boolean: lowercased if then valid, else unfixable (fixTriple.js:130-140)") {
    assert(fix(Term.typed("TRUE", Vocab.xsdBoolean))
      .contains(Term.typed("true", Vocab.xsdBoolean)))
    assert(fix(Term.typed("False", Vocab.xsdBoolean))
      .contains(Term.typed("false", Vocab.xsdBoolean)))
    assert(fix(Term.typed("yes", Vocab.xsdBoolean)).isEmpty)
  }

  test("date: JS reparse + unpadded-day format quirk (fixTriple.js:148-162)") {
    // "2023-5-4" fails the shape regex but JS Date parses "2023/05/04"-like
    // forms; month ≤ 9 → zero-padded, day never padded → "2023-05-4".
    assert(fix(Term.typed("2023/05/04", Vocab.xsdDate))
      .contains(Term.typed("2023-05-4", Vocab.xsdDate)))
    assert(fix(Term.typed("May 4, 2023", Vocab.xsdDate))
      .contains(Term.typed("2023-05-4", Vocab.xsdDate)))
    assert(fix(Term.typed("October 15, 2023", Vocab.xsdDate))
      .contains(Term.typed("2023-10-15", Vocab.xsdDate)))
    assert(fix(Term.typed("not a date", Vocab.xsdDate)).isEmpty)
  }

  test("dateTime: unpadded H:m:s (fixTriple.js:197-214)") {
    assert(fix(Term.typed("2023/05/04 07:08:09", Vocab.xsdDateTime))
      .contains(Term.typed("2023-05-4T7:8:9", Vocab.xsdDateTime)))
    assert(fix(Term.typed("garbage", Vocab.xsdDateTime)).isEmpty)
  }

  test("rdfs:Literal / langString / XMLLiteral re-typed xsd:string (fixTriple.js:76-85)") {
    assert(fix(Term.typed("abc", Vocab.rdfsLiteral)).contains(Term.lit("abc")))
    assert(fix(Term(Term.Literal, "x", Vocab.rdfLangString, ""))
      .contains(Term.lit("x")))
    assert(fix(Term.typed("<a/>", Vocab.rdfXMLLiteral)).contains(Term.lit("<a/>")))
  }

  test("xsd:int re-typed xsd:integer keeping lexical form (fixTriple.js:164-173)") {
    assert(fix(Term.typed("12", Vocab.xsdInt))
      .contains(Term.typed("12", Vocab.xsdInteger)))
    assert(fix(Term.typed("4.5", Vocab.xsdInt))
      .contains(Term.typed("4.5", Vocab.xsdInteger)))
    assert(fix(Term.typed("abc", Vocab.xsdInt)).isEmpty)
  }

  test("wkt: first https→http, anywhere in the value (fixTriple.js:98-123)") {
    assert(fix(Term.typed("<https://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)",
      Vocab.wktLiteral))
      .contains(Term.typed("<http://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)",
        Vocab.wktLiteral)))
    // JS String.replace semantics: ONLY the first occurrence is rewritten
    assert(fix(Term.typed("<https://crs.example/1> POINT(1 2) https://note",
      Vocab.wktLiteral))
      .contains(Term.typed("<http://crs.example/1> POINT(1 2) https://note",
        Vocab.wktLiteral)))
    assert(fix(Term.typed("", Vocab.wktLiteral)).isEmpty)
  }

  test("unknown datatypes unrepairable (fixTriple.js:94)") {
    assert(fix(Term.typed("1.5", "http://www.w3.org/2001/XMLSchema#decimal")).isEmpty)
  }

  test("blank node anywhere makes the quad unrepairable (fixTriple.js:25-27)") {
    val quads = Seq(
      Quad(Term.blank("b"), Term.iri("http://p"), Term.lit("v")),
      Quad(Term.iri("http://s"), Term.iri("http://p"), Term.typed("TRUE", Vocab.xsdBoolean)))
    val out = quads.toDS()
      .withColumn("fixed", Repair.fixQuad(struct($"subject", $"predicate", $"obj", $"graph")))
      .select(col("fixed").isNull).as[Boolean].collect().toSeq
    assert(out == Seq(true, false))
  }

  test("n3 parse gate: malformed IRIs/tags make the quad unfixable (fixTriple.js:11-15)") {
    // the fixer re-parses the serialized line before any per-term fix; a
    // line that does not lex resolves undefined regardless of datatype
    val quads = Seq(
      // subject IRI with a space — IRIREF parse error → unfixable
      Quad(Term.iri("http://x/a b"), Term.iri("http://p"),
        Term.typed("TRUE", Vocab.xsdBoolean)),
      // malformed non-empty language tag — LANGTAG parse error → unfixable
      Quad(Term.iri("http://s"), Term.iri("http://p"),
        Term.langLit("v", "en us")),
      // datatype IRI with forbidden char — parse error → unfixable
      Quad(Term.iri("http://s"), Term.iri("http://p"),
        Term.typed("v", "http://dt/{bad}")),
      // EMPTY tag serializes tagless → re-parses → fixLiteral re-types
      Quad(Term.iri("http://s"), Term.iri("http://p"),
        Term.langLit("v", "")),
      // control: same shapes with clean IRIs/tags still fix
      Quad(Term.iri("http://s"), Term.iri("http://p"),
        Term.typed("TRUE", Vocab.xsdBoolean)))
    val out = quads.toDS()
      .withColumn("fixed", Repair.fixQuad(struct($"subject", $"predicate", $"obj", $"graph")))
      .withColumn("fixable", Repair.isQuadFixable(struct($"subject", $"predicate", $"obj", $"graph")))
      .select(col("fixed").isNull, col("fixable")).as[(Boolean, Boolean)]
      .collect().toSeq
    assert(out.map(_._1) == Seq(true, true, true, false, false))
    assert(out.map(!_._2) == Seq(true, true, true, false, false))
    // and the empty-tag fix is the xsd:string re-type
    assert(fix(Term.langLit("v", "")).contains(Term.typed("v", Vocab.xsdString)))
  }

  test("reference quirk: repaired dates FAIL re-validation (and are never re-validated)") {
    // fixDate emits "2023-05-4" (unpadded day) but validateDate requires
    // two digits — the reference pushes fixed triples to the corrected
    // partition WITHOUT re-validating (pipeline-import.js:232-238), so
    // fix ∘ validate does NOT hold and our verdict logic must not assume
    // it. This test pins that deliberate fidelity decision.
    val fixed = fix(Term.typed("2023/05/04", Vocab.xsdDate)).get
    assert(fixed.value == "2023-05-4")
    val revalidated = Seq(fixed).toDS().withColumn("ok",
      graft.rdf.Validation.isValidTerm(struct(
        $"termType", $"value", $"datatype", $"lang")))
      .select("ok").as[Boolean].head()
    assert(!revalidated, "unpadded repaired date must fail the shape regex")
    // but repaired booleans/strings DO re-validate — the quirk is
    // specific to the date/dateTime reformat
    val fixedBool = fix(Term.typed("TRUE", Vocab.xsdBoolean)).get
    val boolOk = Seq(fixedBool).toDS().withColumn("ok",
      graft.rdf.Validation.isValidTerm(struct(
        $"termType", $"value", $"datatype", $"lang")))
      .select("ok").as[Boolean].head()
    assert(boolOk)
  }

  test("verdict tags valid/corrected/invalid (pipeline-import.js:220-241)") {
    val quads = Seq(
      Quad(Term.iri("http://s"), Term.iri("http://p"), Term.lit("ok")),
      Quad(Term.iri("http://s"), Term.iri("http://p"), Term.typed("TRUE", Vocab.xsdBoolean)),
      Quad(Term.iri("http://s"), Term.iri("http://p"), Term.typed("zzz", Vocab.xsdBoolean)))
    val out = quads.toDS()
      .withColumn("verdict", Repair.verdict(struct($"subject", $"predicate", $"obj", $"graph")))
      .select("verdict").as[String].collect().toSeq
    assert(out == Seq("valid", "corrected", "invalid"))
  }
}
