package graft.pipeline

import graft.SparkSpec
import graft.rdf.Vocab
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** End-to-end orchestrator spec (lib/pipeline-import.js:28-117 parity):
  * full lifecycle over HTML fixtures, asserting the final quad-table
  * state — status transitions, file/container registration, error
  * capture. */
class ImportPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val T = "http://t/1"
  private val Now = "2026-03-01T00:00:00Z"

  private def pageHtml(id: Int, date: String) =
    s"""<html prefix="besluit: http://data.vlaanderen.be/ns/besluit# prov: http://www.w3.org/ns/prov# eli: http://data.europa.eu/eli/ontology#"><body>
       |<div about="http://example.org/besluit/$id" typeof="besluit:Besluit">
       |<span property="eli:title">Besluit $id</span>
       |<span property="eli:date_publication" datatype="xsd:date" content="$date"></span>
       |<div property="prov:value" datatype="rdf:HTML"><p>body $id</p></div>
       |</div></body></html>""".stripMargin

  /** Two pages: page 1 all-valid, page 2 with a repairable date. */
  private def writePages(): String = {
    val dir = Files.createTempDirectory("pages").toString
    Files.writeString(Paths.get(s"$dir/page-1.html"), pageHtml(1, "2023-05-04"))
    Files.writeString(Paths.get(s"$dir/page-2.html"), pageHtml(2, "May 4, 2023"))
    dir
  }

  private def taskQuads = Seq(
    (T, Vocab.rdfType, Vocab.taskType),
    (T, Vocab.muUuid, "uuid-1"),
    (T, Vocab.admsStatus, Vocab.statusScheduled),
    (T, Vocab.taskOperation, Vocab.opExtracting),
    (T, Vocab.taskInputContainer, "http://c/in"),
    ("http://c/in", Vocab.taskHasFile, "share://page-1.html"),
    ("http://c/in", Vocab.taskHasFile, "share://page-2.html"))
    .toDF("subject", "predicate", "obj")
    .withColumn("graph", lit("http://g/tasks"))

  test("success lifecycle: busy → extract → write → register → success") {
    val pagesDir = writePages()
    val outDir = Files.createTempDirectory("import-out").toString
    val result = ImportPipeline.runImportPipeline(spark, taskQuads, T,
      pagesDir, outDir, Now, writeDebug = true)
    assert(result.status == "success" && result.nPages == 2, result)
    val state = result.quads.cache()

    // final task state: success + modified=Now, exactly once each
    val t = state.filter(col("subject") === T &&
      col("predicate").isin(Vocab.admsStatus, Vocab.dctModified))
      .select("predicate", "obj").as[(String, String)].collect()
    assert(t.toMap == Map(Vocab.admsStatus -> Vocab.statusSuccess,
      Vocab.dctModified -> Now), t.toSeq)
    assert(t.length == 2)

    // TTL written: valid partition carries both pages' triples, the
    // repaired date form included; debug partitions exist
    val valid = spark.read.text(s"$outDir/ttl/valid").as[String].collect()
    assert(valid.exists(_.contains("Besluit 1")))
    assert(valid.exists(_.contains("\"2023-05-4\"")))
    val corrected = spark.read.text(s"$outDir/ttl/corrected").as[String].collect()
    assert(corrected.exists(_.contains("\"May 4, 2023\"")))
    // externalized HTML side files on disk
    val htmlFiles = new java.io.File(s"$outDir/html").listFiles()
      .filterNot(_.getName.startsWith("."))
    assert(htmlFiles.length == 2, htmlFiles.mkString(","))

    // registration: per page, valid + original + invalid + corrected files
    // → 4 logical + 4 physical entities each with mu:uuid
    val fileNames = state.filter(col("predicate") === Vocab.nfoFileName)
      .select("obj").as[String].collect()
    for (p <- Seq("page-1", "page-2"); part <- Seq("valid", "original", "invalid", "corrected"))
      assert(fileNames.contains(s"$p-$part.ttl"), s"$p-$part.ttl missing")
    // sizes recorded; valid files are non-empty, page-1 has no invalids
    val sizes = state.filter(col("predicate") === Vocab.nfoFileSize)
      .join(state.filter(col("predicate") === Vocab.nfoFileName)
        .select(col("subject"), col("obj").as("fname")), "subject")
      .select(col("fname"), col("obj").cast("long")).as[(String, Long)]
      .collect().toMap
    assert(sizes("page-1-valid.ttl") > 0)
    assert(sizes("page-1-invalid.ttl") == 0) // all-valid page
    assert(sizes("page-2-invalid.ttl") > 0)  // repairable date, original form
    assert(sizes("page-2-invalid.ttl") == sizes("page-2-corrected.ttl"))

    // containers: valid files in file container AND import graph;
    // debug files in the file container only
    val hasFile = state.filter(col("predicate") === Vocab.taskHasFile &&
      !col("subject").startsWith("http://c/"))
      .select("subject", "obj").as[(String, String)].collect()
    val byContainer = hasFile.groupBy(_._1).view.mapValues(_.length).toMap
    val importGraphs = byContainer.keys.filter(_.contains("/import/"))
    assert(importGraphs.size == 1)
    assert(byContainer(importGraphs.head) == 2) // valid files only
    val fileContainer = byContainer.keys.filterNot(_.contains("/import/")).head
    assert(byContainer(fileContainer) == 8) // 2 pages × 4 partitions
    // task links all three result containers
    assert(state.filter(col("subject") === T &&
      col("predicate") === Vocab.taskResultsContainer).count() == 3)
    // no error record
    assert(state.filter(col("predicate") === Vocab.taskError).count() == 0)
    state.unpersist()
  }

  test("re-running a task is idempotent: no duplicated metadata quads") {
    val pagesDir = writePages()
    val out1 = Files.createTempDirectory("import-out").toString
    val first = ImportPipeline.runImportPipeline(spark, taskQuads, T,
      pagesDir, out1, Now)
    // materialize round 1's state so round 2 joins against fixed data
    val state1 = first.quads.cache(); val n1 = state1.count()
    val second = ImportPipeline.runImportPipeline(spark, state1, T,
      pagesDir, Files.createTempDirectory("import-out2").toString, Now)
    assert(second.status == "success")
    // transitions replace status/modified; every minted quad is already
    // present → the left-anti guard appends nothing
    assert(second.quads.count() == n1)
    state1.unpersist()
  }

  test("failure lifecycle: error record + failed status (T5)") {
    val outDir = Files.createTempDirectory("import-out").toString
    val result = ImportPipeline.runImportPipeline(spark, taskQuads, T,
      "/nonexistent/pages/dir", outDir, Now)
    assert(result.status == "failed" && result.error.nonEmpty, result)
    val state = result.quads
    val status = state.filter(col("subject") === T &&
      col("predicate") === Vocab.admsStatus).select("obj").as[String].collect()
    assert(status.toSeq == Seq(Vocab.statusFailed))
    assert(state.filter(col("predicate") === Vocab.oslcMessage).count() == 1)
    assert(state.filter(col("subject") === T &&
      col("predicate") === Vocab.taskError).count() == 1)
  }

  test("non-task subject: state untouched (pipeline-import.js:29-30)") {
    val result = ImportPipeline.runImportPipeline(spark, taskQuads,
      "http://not/a/task", "/tmp", "/tmp/out-unused", Now)
    assert(result.status == "not_a_task")
    assert(result.quads.count() == taskQuads.count())
  }

  test("lifecycle harness state matches its relational contract") {
    val sf = "/root/testdata/sf0.01"
    val state = graft.ops.QuadOps.taskLifecycleState(spark, sf)
    val t1 = state.filter(col("subject") === "urn:task:1" &&
      col("predicate") === Vocab.admsStatus).select("obj").as[String].collect()
    assert(t1.toSeq == Seq(Vocab.statusSuccess))
    // untouched sibling task
    val t2 = state.filter(col("subject") === "urn:task:2" &&
      col("predicate") === Vocab.admsStatus).select("obj").as[String].collect()
    assert(t2.toSeq == Seq(Vocab.statusScheduled))
    val reg = graft.ops.QuadOps.taskLifecycleRegistry(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(reg(Vocab.muUuid) == 7)     // 4 file entities + 3 containers
    assert(reg(Vocab.taskHasFile) == 4) // 2 files × (file + import containers)
    assert(reg(Vocab.taskResultsContainer) == 3)
  }

  test("F3 basename mirrors path.parse().name (node-verified edges)") {
    val cases = Seq(
      "a/b.tar.gz" -> "b.tar", "/share/x.html" -> "x", "a/b/" -> "b",
      ".env" -> ".env", "noext" -> "noext", "a.b.c/d" -> "d", "x." -> "x",
      "share://pages/F1.html" -> "F1", "" -> "", "a/.hidden.txt" -> ".hidden",
      "..." -> "..", ".." -> "..", "a//b//" -> "b")
    cases.foreach { case (in, want) =>
      assert(ImportPipeline.basename(in) == want,
        s"basename('$in') != node path.parse name '$want'")
    }
  }
}
