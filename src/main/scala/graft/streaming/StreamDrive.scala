package graft.streaming

import java.nio.file.Files
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
  * Determinism: the drive processes the whole input before returning
  * (`processAllAvailable`), uses complete output mode for the windowed
  * aggregation (every window emitted regardless of watermark progress),
  * and closes sessions with per-user post-corpus sentinel events (below),
  * so the drained result is a pure function of the input corpus.
  */
object StreamDrive {

  /** The streaming file source lists a DIRECTORY; the driver's
    * `events.parquet` is a single file. Stage a symlink to it inside a
    * temp dir when needed (a directory-shaped table passes through). */
  private def streamableDir(path: String): String = {
    val f = new java.io.File(path)
    if (f.isDirectory) path
    else {
      val dir = Files.createTempDirectory("graft-stream-in")
      Files.createSymbolicLink(dir.resolve(f.getName), f.toPath)
      dir.toString
    }
  }

  /** `ts` arrives as long nanoseconds (nanosAsLong conf); the streaming
    * operators take real timestamps — one stateless projection upstream
    * of the watermark. */
  private def eventStream(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/events.parquet").schema
    s.readStream.schema(schema).parquet(streamableDir(s"$d/events.parquet"))
      .select(timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }

  private def drain(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = {
    // a previous drive in this session may have registered the sink view
    s.catalog.dropTempView(name)
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** Streaming [[EventStream.hourlyCounts]] over the events parquet,
    * reshaped to the integer-bucket schema of the batch twin
    * (`Sessionize.hourlyWindows`) — verified by the SAME oracle SQL.
    * Complete mode: every window is emitted when the stream drains, so
    * the watermark (a state-size bound on unbounded streams) cannot
    * withhold the final windows of a finite drive. */
  def hourlyFromFiles(s: SparkSession, d: String): DataFrame =
    drain(s, EventStream.hourlyCounts(eventStream(s, d)),
      "graft_stream_hourly", "complete")
      .select(expr("unix_micros(window_start) div 3600000000").as("hour_bucket"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))

  /** Streaming [[EventStream.slidingCounts]] over the events parquet,
    * reshaped to the integer-bucket schema of the batch twin
    * (`Sessionize.slidingWindows`) — verified by the SAME oracle SQL.
    * The `window_start_us >= 0` filter mirrors the batch op's pre-epoch
    * guard: `window()` emits a negative-start window for events inside
    * the first slide after the epoch, which the batch formulation (and
    * the oracle) exclude. */
  def slidingFromFiles(s: SparkSession, d: String): DataFrame =
    drain(s, EventStream.slidingCounts(eventStream(s, d)),
      "graft_stream_sliding", "complete")
      .select(expr("unix_micros(window_start)").as("window_start_us"),
        col("event_type"), col("n"), round(col("sum_value"), 2).as("sum_value"))
      .filter(col("window_start_us") >= 0)
      .orderBy(col("window_start_us"), col("event_type"))

  /** Streaming [[SessionStateOps.sessionize]] (flatMapGroupsWithState,
    * append mode, NoTimeout) over the events parquet, compared against
    * the batch `Sessionize.sessions` oracle.
    *
    * Append mode only emits CLOSED sessions — a finite drive would
    * otherwise withhold every user's last session forever (and a
    * processing-time timeout makes `processAllAvailable` never quiesce,
    * see [[SessionStateOps.sessionize]]). So the drive unions a sentinel
    * stream: one post-corpus event per user at `max(us) + gap + 1`,
    * which closes the user's real last session; the sentinel's own
    * session stays open and is never emitted. Output = exactly the
    * batch sessions of the real events.
    *
    * Null user_ids are excluded on both sides (the typed `Ev` key is a
    * primitive long); `sess_id` is re-derived as the per-user time rank —
    * identical to the batch running-sum numbering, which is also
    * 1-based in time order. */
  def sessionsFromFiles(s: SparkSession, d: String,
      gapMinutes: Int = 30): DataFrame = {
    import s.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    // sentinels are data-derived (one tiny aggregate of the batch table),
    // written as a second file source so the whole drive stays streaming
    val sentinelDir = Files.createTempDirectory("graft-sentinel").toString
    val batch = s.read.parquet(s"$d/events.parquet")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("ts div 1000").as("us"))
    batch.groupBy(col("user_id"))
      .agg((max(col("us")) + gapUs + 1L).as("us"))
      .write.mode("overwrite").parquet(sentinelDir)
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val real = s.readStream.schema(schema)
      .parquet(streamableDir(s"$d/events.parquet"))
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), expr("ts div 1000").as("us"))
    val sentinels = s.readStream
      .schema("user_id LONG, us LONG").parquet(sentinelDir)
    val evs = real.unionByName(sentinels).as[SessionStateOps.Ev]
    val sessions = SessionStateOps.sessionize(s, evs, isStreaming = true)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    drain(s, sessions.toDF(), "graft_stream_sessions", "append")
      .withColumn("sess_id", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("sess_id"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Streaming exact dedup over the documents parquet: the corpus-side
    * twin of [[graft.ops.Dedup.exact]]'s digest grouping, run as a
    * streaming aggregation — per-digest state is the constant-size
    * mergeable pair (min doc_id, count), the streaming-ingestion dedup
    * story (an unbounded corpus feed keeps exactly one row of state per
    * distinct document text). Complete mode drains the final state table,
    * which equals the batch GROUP BY — min/count are order-insensitive,
    * so batch boundaries cannot perturb the result. Only the digest
    * shuffles; text never leaves the stateless pre-projection. */
  def dedupFromFiles(s: SparkSession, d: String): DataFrame = {
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    val docs = s.readStream.schema(schema)
      .parquet(streamableDir(s"$d/documents.parquet"))
      .select(md5(col("text")).as("digest"), col("doc_id"))
    drain(s, docs.groupBy(col("digest"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
      "graft_stream_dedup", "complete")
      .orderBy(col("digest"))
  }
}
