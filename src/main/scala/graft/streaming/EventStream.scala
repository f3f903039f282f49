package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the batch event operators (SURVEY §2.10 extension:
  * watermarked windowed aggregation + session windows). Input: a
  * streaming DataFrame with `ts: timestamp`, `user_id`, `event_type`,
  * `value`. The same column pipeline serves both `readStream` (with
  * watermark-bounded state) and batch DataFrames. */
object EventStream {

  /** Tumbling 1-hour windows, 2-hour watermark: late events beyond the
    * watermark are dropped, state is bounded — the 100 TB-stream analogue
    * of Sessionize.hourlyWindows. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour windows on a 30-minute slide, 2-hour watermark: each
    * event lands in window/slide = 2 overlapping windows (fan-out happens
    * inside the codegen'd `window()` generator, map-side) — the streaming
    * analogue of Sessionize.slidingWindows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based session windows (30 min) via the built-in session_window —
    * the streaming analogue of Sessionize.sessions. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup on a key within the watermark horizon —
    * the at-ingest dedup stage of a streaming training-data pipeline.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the first sighting (bounded state, unlike plain
    * `dropDuplicates` whose state grows forever); duplicates arriving
    * within the horizon are dropped, later re-occurrences pass. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      horizon: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming twin of `ops.Dedup.incrementalDedup`: the ingest-side
    * novelty gate of a streaming corpus pipeline. The prior corpus is
    * distilled into a Bloom filter evaluated as a STATELESS codegen'd
    * predicate per micro-batch (no streaming state at all); rows that
    * fail the bloom are certainly novel (no false negatives), rows that
    * pass are exact-verified with a stream-static left-anti join against
    * the prior text table, so bloom false positives cost one lookup,
    * never a wrongly-dropped document. Emits only genuinely new docs.
    *
    * At scale the anti-join's static side is the prior corpus keyed by
    * TEXT (exactness needs the bodies) — only the ~fpp fraction of
    * stream rows ever reaches it, which is the point of the bloom
    * stage; a corpus too large for that join should instead use the
    * candidate-pair shape of `ops.Dedup.incrementalDedup`, where text
    * is fetched per candidate id and never bulk-shuffled. */
  def noveltyFilter(newDocs: DataFrame, prior: DataFrame,
      bloomBytes: Array[Byte]): DataFrame = {
    val mightDup = graft.functions.BloomSupport.mightContain(
      bloomBytes, xxhash64(col("text")))
    val certainlyNew = newDocs.filter(!mightDup)
    val verifiedNew = newDocs.filter(mightDup)
      .join(prior.select(col("text")), Seq("text"), "left_anti")
    certainlyNew.unionByName(verifiedNew)
  }
}
