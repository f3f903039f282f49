package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch≡stream equivalence drives for the CORRECTNESS gate: each entry
  * runs the PRODUCTION streaming pipeline ([[EventStream]] /
  * [[SessionStateOps]]) over a file source reading the driver's events
  * parquet, drains it into a memory sink, and returns the sink contents
  * as a batch DataFrame in the same shape as the batch twin — so the
  * DuckDB oracle that checks `Sessionize.hourlyWindows` / `.sessions`
  * also pins the streaming path.
  *
  * Every drive replays its input as MULTIPLE micro-batches
  * (`maxFilesPerTrigger=1` over ≥3 staged files in event-time order), so
  * the state-store merge path — the thing that distinguishes streaming
  * aggregation / `flatMapGroupsWithState` from a batch group pass — is
  * exercised by the oracle, not just argued: per-window partial
  * aggregates and per-user open sessions must survive and merge across
  * batch boundaries for the rows to hash-match the batch twin.
  *
  * Determinism: the drive processes the whole input before returning
  * (`processAllAvailable`), uses complete output mode for the windowed
  * aggregation (every window emitted regardless of watermark progress),
  * and closes sessions with per-user post-corpus sentinel events (below),
  * so the drained result is a pure function of the input corpus.
  */
object StreamDrive {

  /** Staged split directories, one sorted write per (input, shape,
    * content fingerprint) per JVM — Verify runs each drive once but Bench
    * replays them per pass. The fingerprint (source part-file lengths +
    * mtimes) keys out in-place rewrites: a test that regenerates the
    * parquet at the same path must not silently replay a stale staging. */
  private val stagedCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Give the staged part files strictly increasing modification times in
    * lexicographic name order (range order for `repartitionByRange`
    * output, sentinels-last for the session drive). The file stream
    * source processes oldest-first (`latestFirst=false`), so this pins
    * the batch arrival order deterministically; a fixed epoch base keeps
    * the staging itself reproducible. The ~seconds spread keeps every
    * file inside the source's `maxFileAge` window (relative to the
    * newest file, not wall clock). */
  private def stampAscending(dir: String): Unit = {
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = 1700000000000L
    parts.zipWithIndex.foreach { case (f, i) =>
      // setLastModified returning false (some overlay/container mounts)
      // must be LOUD: with tied mtimes the source's oldest-first order is
      // undefined, the in-order-arrival contract silently breaks, and the
      // session oracle mismatches with no hint as to why
      require(f.setLastModified(base + (i + 1) * 1000L),
        s"setLastModified failed on $f; staged batch order would be undefined")
    }
  }

  /** Stage `input` as `nFiles` parquet files holding ascending `orderCol`
    * ranges, mod-times increasing with the ranges. Replayed with
    * `maxFilesPerTrigger=1` this is a faithful in-order stream: each
    * micro-batch's rows are at-or-after everything already processed, so
    * no row ever falls behind the watermark of a previous batch and the
    * per-user event order the session fold assumes (a stream delivers a
    * user's events in time order) holds across batches. Splitting by
    * time range — not round-robin — is what makes the multi-batch drive
    * semantically equivalent to the single-batch one; it is drive
    * scaffolding (one bounded sorted write of the drive input), not a
    * production operator. `extraFiles` lets a drive append files (the
    * session sentinels) BEFORE the mod-time stamping, so one copy of the
    * staging/caching/ordering logic serves every drive. */
  private def stageSplit(srcPath: String, shape: String, input: => DataFrame,
      orderCol: String, nFiles: Int = 3,
      extraFiles: String => Unit = _ => ()): String =
    stagedCache.computeIfAbsent(
      s"$srcPath#$shape#${graft.Scaffold.fingerprint(srcPath)}", _ => {
        val dir = graft.Scaffold.cleanupOnExit(
          Files.createTempDirectory("graft-stream-split").toString)
        input.repartitionByRange(nFiles, col(orderCol))
          .write.mode("overwrite").parquet(dir)
        extraFiles(dir)
        stampAscending(dir)
        dir
      })

  /** Per-batch input-row counts (non-empty micro-batches only) of the
    * most recent drive — the spec hook proving the drives really cross
    * batch boundaries (StreamingSpec asserts ≥3). */
  @volatile var lastDriveBatches: Seq[Long] = Nil

  /** Per-batch `triggerExecution` durations (ms, non-empty micro-batches
    * only, batch order) of the most recent drive. [[graft.Bench]] reads
    * this after each GENUINE drive execution and reports the steady-state
    * median (first batch dropped — it carries source listing + plan
    * compile) in bench_detail as `drive_trigger_ms`: the wall time of a
    * drive is dominated by checkpoint/WAL/state-commit latency, which
    * tracks the MACHINE's IO band rather than the code (two cross-round
    * A/Bs, see Bench.scala), so per-batch triggerExecution is the
    * cross-round comparison metric for drive-backed queries. */
  @volatile var lastDriveTriggerMs: Seq[Long] = Nil

  /** Drained results, one full replay per (session, source content,
    * drive) — for REPEAT callers only: a spec or notebook invoking the
    * same drive twice on the same corpus reads the drained sink instead
    * of replaying. Anything that TIMES drives must not hit this cache —
    * [[graft.Bench]] calls [[clearDrained]] before its timed drive
    * passes and detects drive-backed queries via the [[drainTouches]] /
    * [[driveRuns]] counters so later passes skip them entirely (a cached
    * read would measure a localCheckpoint scan, not streaming
    * execution). Staging
    * ([[stagedCache]]) stays shared across passes: it is drive
    * scaffolding (one sorted write of the input), not the operator.
    * Keyed on the source fingerprint so a regenerated corpus re-drives,
    * and on a per-session UUID (identity hashes can collide or be reused
    * after GC) so cross-session reuse — a memory-sink table is
    * session-scoped — is impossible. Each entry carries the drive's
    * non-empty micro-batch counts so a cache hit restores
    * [[lastDriveBatches]] to that drive's real progress instead of
    * leaving another drive's counts in place. */
  private val drainedCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, Seq[Long], Seq[Long])]()

  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.UUID]())

  private val drainTouchCounter = new java.util.concurrent.atomic.AtomicLong(0)
  private val driveRunCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** Count of [[drainCached]] entries — every drive invocation, cache hit
    * or miss. [[graft.Bench]] samples this around each timed run-1 query:
    * a query whose execution touched the drained cache is drive-backed
    * and must be skipped on later passes. Touch-based (not cache-size
    * based) detection closes the blind spot where two bench queries share
    * one cache key: the second query's run-1 is a cache HIT, the cache
    * does not grow, and size-based detection would let later passes time
    * a localCheckpoint scan as if it were streaming execution. */
  def drainTouches: Long = drainTouchCounter.get

  /** Count of REAL drive executions (the compute lambda ran — a full
    * multi-batch streaming replay, not a cache hit). Bench compares its
    * growth with [[drainTouches]] growth: a timed sample whose execution
    * touched the cache without running a drive measured a cached read,
    * which Bench reports loudly instead of shipping silently. */
  def driveRuns: Long = driveRunCounter.get

  /** Drop all drained drive results (staging is kept). Bench calls this
    * before each timed drive pass so that pass replays the real drives.
    *
    * INVALIDATION CONTRACT: the drained frames are localCheckpoint'd, so
    * their lineage is truncated — after this call, any drained DataFrame
    * a repeat caller still holds from before is permanently
    * unrecomputable (an action on it fails), not merely uncached. That
    * is why this is `private[graft]`: only [[graft.Bench]] may clear,
    * and the cache's stated audience (specs, notebooks) always re-enters
    * through the drive entry points, which re-drive on a cleared cache.
    * The localCheckpoint'd result blocks are unpersisted EXPLICITLY —
    * dropping the strong refs alone leaves the persisted RDD blocks to
    * lazy GC + ContextCleaner, so repeated bench passes would briefly
    * accumulate checkpoint blocks in the block manager. */
  private[graft] def clearDrained(): Unit = {
    drainedCache.values.forEach { case (df, _, _) =>
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => () // not a checkpointed frame; nothing persisted to drop
      }
    }
    drainedCache.clear()
  }

  /** Batch counts of the drive most recently drained ON THIS THREAD —
    * read by [[drainCached]] inside its compute lambda. The shared
    * [[lastDriveBatches]] global cannot be read there: two drives running
    * concurrently (parallel specs) could capture each other's counts into
    * the wrong cache entry. */
  private val lastBatchesLocal = new ThreadLocal[Seq[Long]] {
    override def initialValue: Seq[Long] = Nil
  }

  /** Trigger durations of the drive most recently drained ON THIS THREAD
    * — same role as [[lastBatchesLocal]], for [[lastDriveTriggerMs]]. */
  private val lastTriggerLocal = new ThreadLocal[Seq[Long]] {
    override def initialValue: Seq[Long] = Nil
  }

  private def drainCached(s: SparkSession, srcPath: String, name: String)(
      body: => DataFrame): DataFrame = {
    drainTouchCounter.incrementAndGet()
    val sid = sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID())
    val (df, batches, triggers) = drainedCache.computeIfAbsent(
      s"$sid#$srcPath#${graft.Scaffold.fingerprint(srcPath)}#$name",
      // localCheckpoint pins the rows: the memory-sink view behind the
      // result is re-registered under the same queryName when a DIFFERENT
      // corpus drives the same shape — a lazily-cached frame would
      // silently re-read the new sink. The drive is already eager, so
      // this adds one tiny local job over the drained result table.
      // `body` runs on THIS thread, so the thread-locals are its own.
      _ => { driveRunCounter.incrementAndGet()
        val out = body.localCheckpoint()
        (out, lastBatchesLocal.get, lastTriggerLocal.get) })
    lastDriveBatches = batches
    lastDriveTriggerMs = triggers
    df
  }

  /** `ts` arrives as long nanoseconds OR a timestamp column (the source
    * owns its schema — [[graft.ops.Tables.timestampOf]]); the streaming
    * operators take real timestamps — one stateless projection upstream
    * of the watermark. Input staged as 3 time-range files replayed one
    * per micro-batch. */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val staged = stageSplit(s"$d/events.parquet", "events",
      s.read.parquet(s"$d/events.parquet"), "ts")
    s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(graft.ops.Tables.timestampOf(s, schema("ts").dataType).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  private def drain(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = {
    // a previous drive in this session may have registered the sink view
    s.catalog.dropTempView(name)
    // Drive-internal shuffle/state partitioning: the session default
    // (sized for the batch operators' corpus-scale shuffles) is waste
    // here — every micro-batch pays numShufflePartitions state-store
    // tasks for kilobytes of aggregate state, and the drives replay ≥4
    // batches each. 4 partitions keeps the state path genuinely
    // partitioned (merge order still crosses partitions) at an 8× lower
    // per-batch task count. Restored after the drain: only the drive's
    // own streaming query starts under the clamp.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try df.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally {
      val nonEmpty = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      val counts = nonEmpty.map(_.numInputRows)
      val triggers = nonEmpty.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      lastBatchesLocal.set(counts)
      lastTriggerLocal.set(triggers)
      lastDriveBatches = counts
      lastDriveTriggerMs = triggers
      // Dev-only drive profile (set SPARK_GRAFT_DRIVE_PROFILE): per-batch
      // duration breakdown from the progress events, for attributing
      // drive cost to planning vs state commit vs addBatch.
      if (sys.env.contains("SPARK_GRAFT_DRIVE_PROFILE"))
        q.recentProgress.foreach { p =>
          val st = p.stateOperators.toSeq.map(o =>
            s"rows=${o.numRowsTotal} commitMs=${o.commitTimeMs}").mkString(";")
          System.err.println(s"DRIVEPROF $name batch=${p.batchId} " +
            s"in=${p.numInputRows} dur=${p.durationMs} state[$st]")
        }
      q.stop()
    }
    s.table(name)
  }

  /** Streaming [[EventStream.hourlyCounts]] over the events parquet,
    * reshaped to the integer-bucket schema of the batch twin
    * (`Sessionize.hourlyWindows`) — verified by the SAME oracle SQL.
    * Complete mode: every window is emitted when the stream drains, so
    * the watermark (a state-size bound on unbounded streams) cannot
    * withhold the final windows of a finite drive. Multi-batch replay
    * makes the oracle pin the state-store merge: most windows receive
    * rows from more than one micro-batch. */
  def hourlyFromFiles(s: SparkSession, d: String): DataFrame =
    drainCached(s, s"$d/events.parquet", "hourly") {
      drain(s, EventStream.hourlyCounts(eventStream(s, d)),
        "graft_stream_hourly", "complete")
        .select(expr("unix_micros(window_start) div 3600000000").as("hour_bucket"),
          col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("hour_bucket"), col("event_type"))
    }

  /** Streaming [[EventStream.slidingCounts]] over the events parquet,
    * reshaped to the integer-bucket schema of the batch twin
    * (`Sessionize.slidingWindows`) — verified by the SAME oracle SQL.
    * The `window_start_us >= 0` filter mirrors the batch op's pre-epoch
    * guard: `window()` emits a negative-start window for events inside
    * the first slide after the epoch, which the batch formulation (and
    * the oracle) exclude. */
  def slidingFromFiles(s: SparkSession, d: String): DataFrame =
    drainCached(s, s"$d/events.parquet", "sliding") {
      drain(s, EventStream.slidingCounts(eventStream(s, d)),
        "graft_stream_sliding", "complete")
        .select(expr("unix_micros(window_start)").as("window_start_us"),
          col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
        .filter(col("window_start_us") >= 0)
        .orderBy(col("window_start_us"), col("event_type"))
    }

  /** Streaming [[SessionStateOps.sessionize]] (flatMapGroupsWithState,
    * append mode, NoTimeout) over the events parquet, compared against
    * the batch `Sessionize.sessions` oracle.
    *
    * Append mode only emits CLOSED sessions — a finite drive would
    * otherwise withhold every user's last session forever (and a
    * processing-time timeout makes `processAllAvailable` never quiesce,
    * see [[SessionStateOps.sessionize]]). So the drive appends a sentinel
    * file: one post-corpus event per user at `max(us) + gap + 1`, which
    * closes the user's real last session; the sentinel's own session
    * stays open and is never emitted. Output = exactly the batch
    * sessions of the real events.
    *
    * The staged directory holds the real events as 3 ascending
    * time-range files plus the sentinel file LAST (mod-time order), one
    * file per micro-batch — so open sessions genuinely persist in the
    * state store across batches and the cross-batch merge (an event in
    * batch N+1 extending a session opened in batch N) is what the oracle
    * verifies. In-order arrival is load-bearing: the session fold
    * assumes a user's events arrive in time order, exactly the contract
    * a real in-order stream (or a watermark-reordered one) provides.
    *
    * Null user_ids are excluded on both sides (the typed `Ev` key is a
    * primitive long); `sess_id` is re-derived as the per-user time rank —
    * identical to the batch running-sum numbering, which is also
    * 1-based in time order. */
  def sessionsFromFiles(s: SparkSession, d: String,
      gapMinutes: Int = 30): DataFrame =
    drainCached(s, s"$d/events.parquet", s"sessions-$gapMinutes") {
      sessionsFromFilesUncached(s, d, gapMinutes)
    }

  private def sessionsFromFilesUncached(s: SparkSession, d: String,
      gapMinutes: Int): DataFrame = {
    import s.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val raw = s.read.parquet(s"$d/events.parquet")
    val batch = raw.filter(col("user_id").isNotNull)
      .select(col("user_id"), graft.ops.Tables.eventMicros(raw).as("us"))
    val staged = stageSplit(s"$d/events.parquet", s"sessions-$gapUs", batch, "us",
      extraFiles = dir => {
        // sentinels are data-derived (one tiny aggregate of the batch
        // table), staged as the LAST file so every user's real events are
        // already in state before the closer arrives
        val sentTmp = Files.createTempDirectory("graft-sentinel").toString
        batch.groupBy(col("user_id"))
          .agg((max(col("us")) + gapUs + 1L).as("us"))
          .coalesce(1).write.mode("overwrite").parquet(sentTmp)
        val sentPart = new java.io.File(sentTmp).listFiles()
          .find(_.getName.startsWith("part-")).get
        Files.move(sentPart.toPath,
          Paths.get(dir, "part-zz-sentinels.parquet"))
      })
    val evs = s.readStream.schema("user_id LONG, us LONG")
      .option("maxFilesPerTrigger", "1").parquet(staged)
      .as[SessionStateOps.Ev]
    val sessions = SessionStateOps.sessionize(s, evs, isStreaming = true)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    drain(s, sessions.toDF(), "graft_stream_sessions", "append")
      .withColumn("sess_id", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("sess_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Watermark EVICTION drive — the one streaming-semantics corner the
    * in-order batch≡stream drives cannot see by construction (their
    * staging guarantees no row ever falls behind the watermark). This
    * drive runs [[EventStream.hourlyCounts]] in APPEND mode (the mode in
    * which the watermark actually drops late data and evicts state;
    * complete mode retains everything) over a staged sequence that
    * genuinely exercises both sides of the lateness boundary:
    *
    *   1. the real events as 3 ascending time-range files — after them
    *      the watermark sits at max(ts) − 2 h;
    *   2. a LATE batch holding (a) stale rows (copies of the first corpus
    *      hour — hours below the watermark, must be DROPPED) and
    *      (b) allowed-late rows (copies of the last corpus hour — inside
    *      the 2 h horizon, must be KEPT and merged into their still-open
    *      windows);
    *   3. two flush sentinels (3 h and 6 h past the corpus, 1 µs skew to
    *      break end==watermark ties): the first advances the watermark
    *      past every real window END, the second is the data batch in
    *      whose processing those windows are finally emitted — so the
    *      drive never depends on a no-data flush batch racing
    *      `processAllAvailable` (though when a no-data flush batch does
    *      run, it may additionally emit the first sentinel's own window —
    *      sentinels are drive scaffolding with a reserved event type, and
    *      are filtered out of the drive result below).
    *
    * The DuckDB oracle encodes the same rule arithmetically: hourly
    * counts over events ∪ (events of the last corpus hour, duplicated).
    * If the engine kept a stale row, early-hour counts inflate; if it
    * dropped an allowed-late row, last-hour counts deflate — either way
    * the hash gate fails, so the boundary is pinned from both sides.
    * Lateness filters compare in MICROSECONDS on both sides (the
    * operators' own resolution — a nanosecond-remainder edge row would
    * otherwise sit on different sides of the cut). */
  def hourlyLateFromFiles(s: SparkSession, d: String): DataFrame =
    drainCached(s, s"$d/events.parquet", "late") {
      hourlyLateFromFilesUncached(s, d)
    }

  private def hourlyLateFromFilesUncached(s: SparkSession, d: String): DataFrame = {
    val src = s"$d/events.parquet"
    val schema = s.read.parquet(src).schema
    val hourUs = 3600L * 1000000L
    val staged = stageSplit(src, "late-hourly", s.read.parquet(src), "ts",
      extraFiles = dir => {
        val raw = s.read.parquet(src)
        val us = graft.ops.Tables.eventMicros(raw)
        val r = raw.agg(min(us), max(us)).head()
        val (minUs, maxUs) = (r.getLong(0), r.getLong(1))
        // The oracle derives "stale" from the FIRST corpus hour and
        // "allowed-late" from the LAST; both are only meaningful against
        // the 2h watermark cut when the corpus spans enough hours that
        // the two filters cannot overlap and every first-hour window end
        // falls below max(ts) − 2h. A regenerated smaller corpus must
        // fail fast here, not as an undiagnosable hash mismatch.
        require(maxUs - minUs >= 4 * hourUs,
          s"x_stream_late needs an events corpus spanning >= 4h " +
            s"(got ${(maxUs - minUs) / 3600e6} h); the first-hour 'stale' " +
            "batch and last-hour 'late' batch would otherwise overlap the " +
            "watermark cut and the batch oracle no longer models eviction")
        def writeExtra(frame: DataFrame, name: String): Unit = {
          // registered for exit cleanup BEFORE use (only the part file is
          // moved out; the dir with its _SUCCESS marker would otherwise
          // leak per drive invocation), and removed eagerly after the
          // move — exit cleanup is the exception path.
          val tmp = graft.Scaffold.cleanupOnExit(
            Files.createTempDirectory("graft-late").toString)
          frame.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.startsWith("part-")).get
          Files.move(part.toPath, Paths.get(dir, name))
          graft.Scaffold.deleteRecursively(new java.io.File(tmp))
        }
        writeExtra(
          raw.filter(us < minUs + hourUs)
            .unionAll(raw.filter(us >= maxUs - hourUs)),
          "part-zz-a-late.parquet")
        // the sentinel row must carry `ts` in the SOURCE's own encoding —
        // it is appended to the staged corpus and read back under the
        // corpus schema
        def sentinel(sentUs: Long): DataFrame = raw.limit(1).select(
          schema.fieldNames.toSeq.map {
            case "ts" => graft.ops.Tables
              .tsLiteralOf(s, sentUs, schema("ts").dataType).as("ts")
            case "event_type" => lit("graft_sentinel").as("event_type")
            case c => col(c)
          }: _*)
        writeExtra(sentinel(maxUs + 3 * hourUs + 1), "part-zz-b-flush1.parquet")
        writeExtra(sentinel(maxUs + 6 * hourUs + 1), "part-zz-c-flush2.parquet")
      })
    val events = s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select(graft.ops.Tables.timestampOf(s, schema("ts").dataType).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    drain(s, EventStream.hourlyCounts(events), "graft_stream_hourly_late", "append")
      .filter(col("event_type") =!= "graft_sentinel")
      .select(expr("unix_micros(window_start) div 3600000000").as("hour_bucket"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** Streaming exact dedup over the documents parquet: the corpus-side
    * twin of [[graft.ops.Dedup.exact]]'s digest grouping, run as a
    * streaming aggregation — per-digest state is the constant-size
    * mergeable pair (min doc_id, count), the streaming-ingestion dedup
    * story (an unbounded corpus feed keeps exactly one row of state per
    * distinct document text). Complete mode drains the final state table,
    * which equals the batch GROUP BY — min/count are order-insensitive,
    * so batch boundaries cannot perturb the result, and the multi-batch
    * replay (3 doc_id-range files, one per trigger) makes that a tested
    * property rather than an argued one: duplicate groups spanning files
    * must merge in the state store. Only the digest shuffles; text never
    * leaves the stateless pre-projection. */
  def dedupFromFiles(s: SparkSession, d: String): DataFrame =
    drainCached(s, s"$d/documents.parquet", "dedup") {
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val staged = stageSplit(s"$d/documents.parquet", "docs",
        s.read.parquet(s"$d/documents.parquet"), "doc_id")
      val docs = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
        .select(md5(col("text")).as("digest"), col("doc_id"))
      drain(s, docs.groupBy(col("digest"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
        "graft_stream_dedup", "complete")
        .orderBy(col("digest"))
    }
}
