package graft.rdf

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll

/** Serializer/parser unit cases + ScalaCheck round-trip invariant
  * (SURVEY §5.2): parse_ntriple(to_ntriple(q)) == q for blank-node-free
  * quads. */
class NTriplesSpec extends SparkSpec {
  import spark.implicits._

  private def serialize(q: Quad): String =
    Seq(q).toDS().select(NTriples.toNTriple(
      struct($"subject.*"), struct($"predicate.*"), struct($"obj.*")).as("line"))
      .as[String].collect()(0)

  test("IRI object") {
    assert(serialize(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.iri("http://o")))
      == "<http://s> <http://p> <http://o> .")
  }

  test("plain literal renders without ^^xsd:string (n3.js convention)") {
    assert(serialize(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.lit("v")))
      == "<http://s> <http://p> \"v\" .")
  }

  test("typed + lang literals") {
    assert(serialize(Quad(Term.iri("http://s"), Term.iri("http://p"),
      Term.typed("42", Vocab.xsdInteger)))
      == "<http://s> <http://p> \"42\"^^<http://www.w3.org/2001/XMLSchema#integer> .")
    assert(serialize(Quad(Term.iri("http://s"), Term.iri("http://p"),
      Term.langLit("hallo", "nl")))
      == "<http://s> <http://p> \"hallo\"@nl .")
  }

  test("escaping of quote/backslash/newline/tab") {
    assert(serialize(Quad(Term.iri("http://s"), Term.iri("http://p"),
      Term.lit("a\"b\\c\nd\te")))
      == "<http://s> <http://p> \"a\\\"b\\\\c\\nd\\te\" .")
  }

  test("parseLine handles IRIs, literals, langs, datatypes, graphs, blanks") {
    assert(NTriples.parseLine("<http://s> <http://p> <http://o> .")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.iri("http://o"))))
    assert(NTriples.parseLine("""<http://s> <http://p> "v\"x" .""")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.lit("v\"x"))))
    assert(NTriples.parseLine("""<http://s> <http://p> "v"@nl-BE .""")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.langLit("v", "nl-BE"))))
    assert(NTriples.parseLine(
      s"""<http://s> <http://p> "1"^^<${Vocab.xsdInteger}> <http://g> .""")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"),
        Term.typed("1", Vocab.xsdInteger), "http://g")))
    assert(NTriples.parseLine("_:b0 <http://p> _:b1 .")
      .contains(Quad(Term.blank("b0"), Term.iri("http://p"), Term.blank("b1"))))
    // backslash via concat: Scala itself pre-processes \uXXXX even in
    // triple-quoted literals (deprecated), which would feed the parser a
    // literal é instead of the escape sequence under test
    val bsu = "\\"
    assert(NTriples.parseLine(s"""<http://s> <http://p> "${bsu}u00e9${bsu}U0001F600" .""")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.lit("é\uD83D\uDE00"))))
  }

  test("terminator directly after the term (no space) is accepted") {
    assert(NTriples.parseLine("""<http://s> <http://p> "v"@nl.""")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.langLit("v", "nl"))))
    assert(NTriples.parseLine("<http://s> <http://p> _:b1.")
      .contains(Quad(Term.iri("http://s"), Term.iri("http://p"), Term.blank("b1"))))
  }

  test("empty language tag is a parse error, not a repairable langString (n3 parity)") {
    assert(NTriples.parseLine("""<http://s> <http://p> "x"@ .""").isEmpty)
    assert(NTriples.parseLine("""<http://s> <http://p> "x"@.""").isEmpty)
  }

  test("malformed escapes classify as invalid, never throw") {
    // (\ u sequences built by concat — Scala pre-processes unicode escapes
    // even inside triple-quoted literals)
    val bs = "\\"
    assert(NTriples.parseLine(s"""<http://s> <http://p> "${bs}uZZZZ" .""").isEmpty)
    assert(NTriples.parseLine(s"""<http://s> <http://p> "${bs}UFFFFFFFF" .""").isEmpty)
    assert(NTriples.parseLine(s"""<http://s> <http://p> "${bs}u12" .""").isEmpty)
  }

  test("parseLine rejects malformed lines (→ invalid, validateTriple.js:13-15)") {
    assert(NTriples.parseLine("").isEmpty)
    assert(NTriples.parseLine("# comment").isEmpty)
    assert(NTriples.parseLine("<http://s> <http://p> .").isEmpty)
    assert(NTriples.parseLine("<http://s> \"lit-predicate\" <http://o> .").isEmpty)
    assert(NTriples.parseLine("<http://s> <http://p> \"unterminated .").isEmpty)
    assert(NTriples.parseLine("<http://s> <http://p> <http://o>").isEmpty)
  }

  test("parse_ntriple expression round-trips through the column API") {
    val lines = Seq(
      "<http://s> <http://p> \"a\\nb\"@nl .",
      "not a triple")
    val out = lines.toDF("line")
      .select(NTriples.parseNTriple($"line").as("q"))
      .select($"q".isNull, $"q.obj.value", $"q.obj.lang").collect()
    assert(out(0) == Row(false, "a\nb", "nl"))
    assert(out(1) == Row(true, null, null))
  }

  // ---------------------------------------------------------- property

  private val safeString = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '"', '\\', '\n', '\t', 'é', 'ß', '€')))
    .map(_.mkString)
  private val iriGen = for {
    host <- Gen.identifier.suchThat(_.nonEmpty)
    path <- Gen.identifier
  } yield Term.iri(s"http://$host/$path")
  private val literalGen = for {
    v <- safeString
    kind <- Gen.choose(0, 2)
    lang <- Gen.oneOf("nl", "fr", "de", "en")
  } yield kind match {
    case 0 => Term.lit(v)
    case 1 => Term.langLit(v, lang)
    case 2 => Term.typed(v, Vocab.xsdDate)
  }
  private val quadGen = for {
    s <- iriGen; p <- iriGen; o <- Gen.oneOf(iriGen, literalGen)
  } yield Quad(s, p, o)

  test("property: parseLine(serializeJvm(q)) == q for blank-node-free quads") {
    // JVM-side serializer mirroring the column expression — keeps the
    // property fast (no Spark job per ScalaCheck case).
    def ser(t: Term): String = t.termType match {
      case Term.NamedNode => s"<${t.value}>"
      case Term.BlankNode => s"_:${t.value}"
      case _ =>
        val esc = t.value.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        if (t.lang != null && t.lang.nonEmpty) s""""$esc"@${t.lang}"""
        else if (t.datatype != null && t.datatype != Vocab.xsdString)
          s""""$esc"^^<${t.datatype}>"""
        else s""""$esc""""
    }
    val prop = forAll(quadGen) { q =>
      val line = s"${ser(q.subject)} ${ser(q.predicate)} ${ser(q.obj)} ."
      NTriples.parseLine(line).contains(q)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("column serializer agrees with the JVM mirror on a corpus batch") {
    val quads = Gen.listOfN(80, quadGen).sample.getOrElse(Nil)
    assert(quads.nonEmpty)
    val viaSpark = quads.toDS().select(NTriples.toNTriple(
      struct($"subject.*"), struct($"predicate.*"), struct($"obj.*")).as("l"))
      .as[String].collect().toSeq
    val roundTripped = viaSpark.map(NTriples.parseLine)
    assert(roundTripped.flatten == quads)
  }
}
