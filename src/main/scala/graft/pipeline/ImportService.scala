package graft.pipeline

import graft.streaming.DeltaSource
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The service composition — the reference process's whole lifetime
  * (app.js) as one callable:
  *
  *   1. startup recovery: every busy task of a watched operation →
  *      failed (T2, app.js:12-16, lib/task.js:24-63);
  *   2. the delta loop: a checkpointed stream of delta JSON bodies,
  *      each micro-batch dispatching [[ImportPipeline.runImportPipeline]]
  *      per scheduled task URI (T1, app.js:28-45).
  *
  * Task/metadata state lives as a parquet quad table at `stateDir`,
  * read-modify-replaced per task via a temp-dir + rename swap (the moral
  * equivalent of the reference's DELETE/INSERT round-trips to Virtuoso).
  * This is the task-STATE table — metadata-sized, one swap per task; the
  * bulk extracted triples go through the TTL sinks and (at scale) the
  * graph-partitioned [[graft.sources.QuadStore]], never through here.
  * Tasks within a batch run sequentially like the reference's event
  * loop; each task's pages extract in parallel inside the pipeline.
  */
object ImportService {

  def readState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)

  /** Crash recovery for the swap protocol: if a crash landed between the
    * two renames (state moved aside, new state not yet in place), the
    * backup IS the state — restore it. Also sweeps temp dirs stranded by
    * writes that crashed mid-write. Called by `start` before anything
    * reads the state. */
  def recoverState(spark: SparkSession, stateDir: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(stateDir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(stateDir + "-prev")
    if (!fs.exists(target) && fs.exists(backup))
      if (!fs.rename(backup, target))
        throw new java.io.IOException(s"state restore failed: $backup -> $target")
    val parent = target.getParent
    val prefix = target.getName + "-tmp-"
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).foreach { st =>
        if (st.getPath.getName.startsWith(prefix)) fs.delete(st.getPath, true)
      }
  }

  /** Replace the state table: write to a sibling temp dir, then swap by
    * two renames. Never overwrite-in-place — Spark plans are lazy, and
    * overwriting the directory a plan still reads from loses the state
    * (the classic read-modify-overwrite self-clobber). Some copy of the
    * state survives a crash at ANY point: the old state is RENAMED aside
    * before the new one takes its place, never deleted while it is the
    * only copy, and [[recoverState]] (run by `start`) restores the
    * backup if a crash landed between the renames and sweeps stranded
    * temp dirs. */
  def writeState(newState: DataFrame, stateDir: String): Unit = {
    val spark = newState.sparkSession
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(stateDir)
    val tmp = new org.apache.hadoop.fs.Path(stateDir + "-tmp-" + System.nanoTime())
    val backup = new org.apache.hadoop.fs.Path(stateDir + "-prev")
    newState.write.parquet(tmp.toString)
    fs.delete(backup, true) // drop the previous generation's backup
    if (fs.exists(target) && !fs.rename(target, backup))
      throw new java.io.IOException(s"state swap failed: $target -> $backup")
    if (!fs.rename(tmp, target)) {
      // restore the old state rather than leaving no table at all
      fs.rename(backup, target)
      throw new java.io.IOException(s"state swap failed: $tmp -> $target")
    }
    fs.delete(backup, true)
  }

  private def defaultClock(): String =
    java.time.Instant.now().toString

  /** Collision-free per-task output directory name. */
  private def taskDirName(taskUri: String): String =
    graft.rdf.sha1Hex(taskUri)

  /** Run startup recovery, then start the streaming delta loop. The
    * returned query runs until stopped; `clock` is injectable for
    * deterministic tests (F12). */
  def start(spark: SparkSession, deltaDir: String, checkpointDir: String,
      stateDir: String, pagesDir: String, outDir: String,
      clock: () => String = defaultClock _,
      writeDebug: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    // restore a mid-swap crash, then T2: fail stale busy tasks before
    // accepting traffic (app.js:12-16)
    recoverState(spark, stateDir)
    writeState(TaskStore.failBusyTasks(
      readState(spark, stateDir), clock()), stateDir)
    DeltaSource.run(spark, deltaDir, checkpointDir) { tasks =>
      // per-batch task list is delta-sized (the reference holds it in an
      // array, app.js:30); tasks run sequentially like its event loop,
      // chaining on the in-memory state, with ONE swap per micro-batch
      // instead of one per task. Crash mid-batch replays the whole batch
      // (checkpointed foreachBatch) against the last swapped state — the
      // orchestrator's left-anti idempotency guard makes that safe.
      val taskUris = tasks.collect().toSeq.sorted
      if (taskUris.nonEmpty) {
        var state = readState(spark, stateDir)
        var dirty = false
        taskUris.foreach { taskUri =>
          val result = ImportPipeline.runImportPipeline(
            spark, state, taskUri, pagesDir,
            s"$outDir/${taskDirName(taskUri)}", clock(), writeDebug)
          if (result.status != "not_a_task") {
            // keep the chained plan shallow: each task's state snapshot
            // is materialized to executor storage (NOT a durable swap),
            // so task N+1's actions don't re-evaluate tasks 1..N
            state = result.quads.localCheckpoint(true)
            dirty = true
          }
        }
        if (dirty) writeState(state, stateDir)
      }
    }
  }
}
