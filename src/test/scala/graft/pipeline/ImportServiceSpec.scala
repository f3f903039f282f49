package graft.pipeline

import graft.SparkSpec
import graft.rdf.Vocab
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Whole-service composition (app.js parity): startup recovery + the
  * streaming delta loop driving the import pipeline, with state living
  * in a parquet quad table. */
class ImportServiceSpec extends SparkSpec {
  import spark.implicits._

  private val T1 = "http://t/1"
  private val T2 = "http://t/2"

  private val page =
    """<html prefix="eli: http://data.europa.eu/eli/ontology#"><body>
      |<div about="http://example.org/besluit/1">
      |<span property="eli:title">Besluit een</span>
      |</div></body></html>""".stripMargin

  private def initialState = Seq(
    (T1, Vocab.rdfType, Vocab.taskType),
    (T1, Vocab.muUuid, "uuid-1"),
    (T1, Vocab.admsStatus, Vocab.statusScheduled),
    (T1, Vocab.taskOperation, Vocab.opExtracting),
    (T1, Vocab.taskInputContainer, "http://c/in"),
    ("http://c/in", Vocab.taskHasFile, "share://page-1.html"),
    // a stale busy task: startup recovery must fail it
    (T2, Vocab.rdfType, Vocab.taskType),
    (T2, Vocab.admsStatus, Vocab.statusBusy),
    (T2, Vocab.taskOperation, Vocab.opExtracting))
    .toDF("subject", "predicate", "obj")
    .withColumn("graph", lit("http://g/tasks"))

  private def deltaBody(task: String) =
    s"""[{"inserts":[{"subject":{"type":"uri","value":"$task"},
       |"predicate":{"type":"uri","value":"http://www.w3.org/ns/adms#status"},
       |"object":{"type":"uri","value":"http://redpencil.data.gift/id/concept/JobStatus/scheduled"}}],
       |"deletes":[]}]""".stripMargin.replace("\n", "")

  test("recoverState restores a mid-swap crash and sweeps stranded temps") {
    val root = Files.createTempDirectory("svc-rec").toString
    val stateDir = s"$root/state"
    initialState.write.parquet(stateDir)
    val n = ImportService.readState(spark, stateDir).count()
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: crash after rename(target → backup), before rename(tmp → target)
    fs.rename(new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + "-prev"))
    initialState.limit(1).write.parquet(stateDir + "-tmp-123")
    ImportService.recoverState(spark, stateDir)
    assert(ImportService.readState(spark, stateDir).count() == n)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stateDir + "-tmp-123")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stateDir + "-prev")))
    // idempotent when state is intact
    ImportService.recoverState(spark, stateDir)
    assert(ImportService.readState(spark, stateDir).count() == n)
  }

  test("service loop: recovery, delta dispatch, pipeline, state swap") {
    val root = Files.createTempDirectory("svc").toString
    val stateDir = s"$root/state"
    val deltaDir = s"$root/deltas"; Files.createDirectories(Paths.get(deltaDir))
    val pagesDir = s"$root/pages"; Files.createDirectories(Paths.get(pagesDir))
    initialState.write.parquet(stateDir)
    Files.writeString(Paths.get(s"$pagesDir/page-1.html"), page)

    val q = ImportService.start(spark, deltaDir, s"$root/ckpt", stateDir,
      pagesDir, s"$root/out", clock = () => "2026-03-01T00:00:00Z")
    try {
      // recovery ran synchronously before the stream started
      val afterRecovery = ImportService.readState(spark, stateDir)
      assert(afterRecovery.filter(col("subject") === T2 &&
        col("predicate") === Vocab.admsStatus).select("obj")
        .as[String].head() == Vocab.statusFailed)

      Files.writeString(Paths.get(s"$deltaDir/d1.json"), deltaBody(T1))
      q.processAllAvailable()

      val state = ImportService.readState(spark, stateDir).cache()
      assert(state.filter(col("subject") === T1 &&
        col("predicate") === Vocab.admsStatus).select("obj")
        .as[String].head() == Vocab.statusSuccess)
      // registered result file metadata made it into the swapped state
      assert(state.filter(col("predicate") === Vocab.nfoFileName &&
        col("obj") === "page-1-valid.ttl").count() == 1)
      assert(state.filter(col("subject") === T1 &&
        col("predicate") === Vocab.taskResultsContainer).count() == 3)
      state.unpersist()

      // a delta for a non-task subject is a silent no-op
      val before = ImportService.readState(spark, stateDir).count()
      Files.writeString(Paths.get(s"$deltaDir/d2.json"),
        deltaBody("http://not/a/task"))
      q.processAllAvailable()
      assert(ImportService.readState(spark, stateDir).count() == before)

      // two tasks in ONE batch chain on the in-memory state (one swap):
      // T1 re-runs idempotently, T2 (no input container) succeeds empty
      Files.writeString(Paths.get(s"$deltaDir/d3.json"),
        s"""[{"inserts":[
           |{"subject":{"type":"uri","value":"$T1"},
           | "predicate":{"type":"uri","value":"http://www.w3.org/ns/adms#status"},
           | "object":{"type":"uri","value":"http://redpencil.data.gift/id/concept/JobStatus/scheduled"}},
           |{"subject":{"type":"uri","value":"$T2"},
           | "predicate":{"type":"uri","value":"http://www.w3.org/ns/adms#status"},
           | "object":{"type":"uri","value":"http://redpencil.data.gift/id/concept/JobStatus/scheduled"}}],
           |"deletes":[]}]""".stripMargin.replace("\n", ""))
      q.processAllAvailable()
      val after = ImportService.readState(spark, stateDir)
      val statuses = after.filter(col("predicate") === Vocab.admsStatus)
        .select("subject", "obj").as[(String, String)].collect().toMap
      assert(statuses(T1) == Vocab.statusSuccess)
      assert(statuses(T2) == Vocab.statusSuccess)
      // idempotent re-run of T1: metadata not duplicated
      assert(after.filter(col("predicate") === Vocab.nfoFileName &&
        col("obj") === "page-1-valid.ttl").count() == 1)
    } finally q.stop()
  }
}
