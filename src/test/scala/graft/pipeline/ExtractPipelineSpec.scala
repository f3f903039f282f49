package graft.pipeline

import graft.SparkSpec
import graft.rdf.Vocab
import org.apache.spark.sql.functions._

/** End-to-end pipeline spec over in-memory pages + the synthesized
  * driver-table harness (SURVEY §3.1 stages 6-8). */
class ExtractPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html prefix="besluit: http://data.vlaanderen.be/ns/besluit# prov: http://www.w3.org/ns/prov#
      |              eli: http://data.europa.eu/eli/ontology#"><body>
      |  <div about="https://example.org/besluit/B1" typeof="besluit:Besluit">
      |    <span property="eli:title">Reglement X</span>
      |    <span property="eli:date_publication" datatype="xsd:date" content="May 4, 2023"></span>
      |    <div property="prov:value" datatype="rdf:HTML"><p>full body</p></div>
      |  </div>
      |</body></html>""".stripMargin

  private def pages = Seq(("https://example.org/zitting/1", page)).toDF("url", "html")

  test("full pipeline: extraction, externalization, provenance, verdicts") {
    val out = ExtractPipeline.run(spark, pages).cache()
    val rows = out.select($"subject.value", $"predicate.value", $"obj.value",
      $"verdict").as[(String, String, String, String)].collect().toSet

    // externalized rdf:HTML object → content-addressed file URI, valid
    val ext = rows.filter(_._2 == Vocab.extractedDecisionContent)
    assert(ext.size == 1)
    assert(ext.head._3.startsWith("http://data.lblod.info/id/files/"))
    assert(ext.head._4 == "valid")
    // provenance once per subject
    assert(rows.count(_._2 == Vocab.provWasDerivedFrom) == 1)
    assert(rows.exists(r => r._2 == Vocab.provWasDerivedFrom &&
      r._3 == "https://example.org/zitting/1"))
    // repairable date → corrected
    assert(rows.exists(r => r._2 == "http://data.europa.eu/eli/ontology#date_publication"
      && r._4 == "corrected"))
    // corrected partition serializes the repaired (unpadded-quirk) form
    val correctedTtl = out.filter($"verdict" === "corrected")
      .select($"ttl").as[String].collect()
    assert(correctedTtl.exists(_.contains("\"2023-05-4\"")))
    out.unpersist()
  }

  test("TTL sink round-trips through the readTtl ingest source (G4 → G5 identity)") {
    val out = ExtractPipeline.run(spark, pages)
    val dir = java.nio.file.Files.createTempDirectory("ttl-roundtrip").toString
    ExtractPipeline.writeTtl(out, dir, writeDebug = true)
    for (part <- Seq("valid", "original")) {
      val back = graft.sources.QuadStore.readTtl(spark, s"$dir/$part")
      assert(back.count() > 0)
      assert(back.filter(!$"parse_ok").count() == 0, s"$part: unparseable lines")
      // parse-then-reserialize is the identity on the sink's own output
      val reser = back.select($"line", graft.rdf.NTriples.toNTriple(
        $"subject", $"predicate", $"obj").as("re"))
      assert(reser.filter($"line" =!= $"re").count() == 0, s"$part: lossy round-trip")
    }
    // comments and blank lines are ignored, junk is surfaced not dropped
    val extra = java.nio.file.Files.createTempDirectory("ttl-junk").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$extra/f.nt"),
      "# comment\n\n<http://s> <http://p> \"v\" .\nnot a triple\n")
    val parsed = graft.sources.QuadStore.readTtl(spark, extra)
    assert(parsed.count() == 2)
    assert(parsed.filter($"parse_ok").count() == 1)
    assert(parsed.filter(!$"parse_ok").select($"line").as[String].head()
      == "not a triple")
  }

  test("K9 debug partitions match correctAndRepairTriples exactly (pipeline-import.js:220-241)") {
    // page yields: valid triples (title, externalized prov:value, cites,
    // provenance) + one repairable date ("May 4, 2023" → corrected).
    val out = ExtractPipeline.run(spark, pages)
    val dir = java.nio.file.Files.createTempDirectory("ttl-sink").toString
    ExtractPipeline.writeTtl(out, dir, writeDebug = true)
    def lines(part: String): Seq[String] =
      spark.read.text(s"$dir/$part").as[String].collect().toSeq
    val valid = lines("valid")
    val invalid = lines("invalid")
    val corrected = lines("corrected")
    // corrected file holds the ORIGINAL (unrepaired) lexical form...
    assert(corrected.exists(_.contains("\"May 4, 2023\"")), corrected)
    assert(!corrected.exists(_.contains("\"2023-05-4\"")), corrected)
    // ...the repaired form goes to the valid file (validTriples.push(fixedTriple))
    assert(valid.exists(_.contains("\"2023-05-4\"")), valid)
    // invalid file includes every validation failure — also the repaired ones
    assert(corrected.toSet.subsetOf(invalid.toSet), (invalid, corrected))
    // |invalid| = #invalid + #corrected; this page has no unrepairable triple
    assert(invalid.size == corrected.size)
    // -original.ttl: the full pre-validation serialization (:85-91) —
    // all extracted triples in original form, repaired form absent
    val original = lines("original")
    assert(original.size == valid.size) // (#valid + #corrected, no invalids here)
    assert(original.exists(_.contains("\"May 4, 2023\"")))
    assert(!original.exists(_.contains("\"2023-05-4\"")))
  }

  test("html side-output table carries the payload for the file sink (G2)") {
    val raw = ExtractPipeline.extractQuads(spark, pages)
    val (_, files) = ExtractPipeline.externalizeHtml(raw)
    val f = files.as[(String, String, String)].collect()
    assert(f.length == 1)
    assert(f.head._2 == "<p>full body</p>")
    assert(f.head._3 == "https://example.org/zitting/1")
  }

  test("html file sink writes one <md5>.html per externalized object (G2/K1)") {
    val raw = ExtractPipeline.extractQuads(spark, pages)
    val (_, files) = ExtractPipeline.externalizeHtml(raw)
    val outDir = java.nio.file.Files.createTempDirectory("html-sink").toString
    ExtractPipeline.writeHtmlFiles(files, outDir)
    // Hadoop local FS writes .crc checksum sidecars; ignore them
    val written = new java.io.File(outDir).listFiles().toSeq
      .filterNot(_.getName.startsWith("."))
    assert(written.length == 1)
    assert(written.head.getName.endsWith(".html"))
    val content = new String(java.nio.file.Files.readAllBytes(written.head.toPath))
    assert(content == "<p>full body</p>")
  }

  test("binding projection coerces integer/dateTime columns (P2, utils.js:7-25)") {
    val bindings = Seq(("42", "2023-05-04T10:11:12", "keep"))
      .toDF("count", "modified", "label")
    val typedDf = graft.ops.Bindings.typed(bindings, Map(
      "count" -> graft.rdf.Vocab.xsdInteger,
      "modified" -> graft.rdf.Vocab.xsdDateTime,
      "label" -> graft.rdf.Vocab.xsdString))
    val row = typedDf.collect().head
    // xsd:integer → decimal(38,0): unbounded-integer-safe
    assert(row.getDecimal(0).longValueExact() == 42L)
    assert(row.get(1).isInstanceOf[java.sql.Timestamp])
    assert(row.getString(2) == "keep")
    // parseInt semantics: leading digit prefix, garbage → null
    val edge = graft.ops.Bindings.typed(
      Seq("x", "1.5", "12abc", "9223372036854775808").toDF("count"),
      Map("count" -> graft.rdf.Vocab.xsdInteger)).collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getDecimal(0).longValueExact() == 1L)
    assert(edge(2).getDecimal(0).longValueExact() == 12L)
    assert(edge(3).getDecimal(0).toString == "9223372036854775808")
    // parseInt radix inference (node-verified): a 0x/0X prefix flips to
    // hex, with sign; bare "0x"/non-hex digits → NaN → null; no octal
    val hex = graft.ops.Bindings.typed(
      Seq("0x10", "-0X1f", "+0x10", "0x", "0xzz", "08", " 42 ", "1e3")
        .toDF("count"),
      Map("count" -> graft.rdf.Vocab.xsdInteger)).collect()
    assert(hex(0).getDecimal(0).longValueExact() == 16L)
    assert(hex(1).getDecimal(0).longValueExact() == -31L)
    assert(hex(2).getDecimal(0).longValueExact() == 16L)
    assert(hex(3).isNullAt(0))
    assert(hex(4).isNullAt(0))
    assert(hex(5).getDecimal(0).longValueExact() == 8L)
    assert(hex(6).getDecimal(0).longValueExact() == 42L)
    assert(hex(7).getDecimal(0).longValueExact() == 1L)
  }

  test("malformed page is isolated, not fatal (T4)") {
    val mixed = Seq(
      ("https://example.org/ok", page),
      ("https://example.org/broken", null: String)).toDF("url", "html")
    val out = ExtractPipeline.run(spark, mixed)
    assert(out.filter($"url" === "https://example.org/ok").count() > 0)
    assert(out.filter($"url" === "https://example.org/broken").count() == 0)
  }

  test("synthesized driver harness populates all three verdict partitions") {
    val summary = ExtractPipeline.pipelineSummary(spark, "/root/testdata/sf0.001")
      .agg(sum("n_valid"), sum("n_corrected"), sum("n_invalid"))
      .as[(Long, Long, Long)].head()
    assert(summary._1 > 0 && summary._2 > 0 && summary._3 > 0, summary.toString)
  }
}
