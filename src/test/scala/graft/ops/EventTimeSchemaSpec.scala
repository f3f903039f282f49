package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-schema canary: the engine does NOT own the events table's
  * schema — the driver has shipped `ts` both as TIMESTAMP(NANOS) parquet
  * (read as long nanoseconds under `nanosAsLong`) and as timestamp[us]
  * (TIMESTAMP_NTZ), and a regeneration can flip the encoding between
  * rounds. Every temporal operator must accept BOTH and produce identical
  * results; this spec builds one tiny fixture per encoding from the same
  * logical rows and runs the batch events family over each, so the next
  * driver-side schema flip fails HERE with a named cause instead of as a
  * round-level DATATYPE_MISMATCH across 11 queries (the r11 regression).
  */
class EventTimeSchemaSpec extends graft.SparkSpec {

  // (event_id, us, user_id, event_type, value) — three users, two session
  // gaps, a view→purchase pair for the as-of/range joins, multi-hour span
  private val rows = Seq(
    (1L, 100L * 1000000L, 1L, "view", 1.0),
    (2L, 200L * 1000000L, 1L, "click", 2.0),
    (3L, 4000L * 1000000L, 1L, "purchase", 3.0), // > 30 min gap → new session
    (4L, 3600L * 1000000L, 2L, "view", 4.0),
    (5L, 3900L * 1000000L, 2L, "purchase", 5.0),
    (6L, 9000L * 1000000L, 3L, "view", 6.0),
    (7L, 16000L * 1000000L, 3L, "view", 7.5))

  /** Write the fixture as `<dir>/events.parquet` with `ts` in the given
    * encoding; returns the sfDir-shaped directory the operators read. */
  private def fixture(encode: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-ts-canary").toString)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), encode.as("ts"), col("user_id"),
        col("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nanosDir = fixture(col("us") * 1000L) // int64 nanoseconds
  private lazy val tsDir = // timestamp[us] (TIMESTAMP_NTZ), the r12 driver encoding
    fixture(timestamp_micros(col("us")).cast(TimestampNTZType))
  private lazy val tzDir = // timestamp[us] adjusted-to-UTC (TimestampType)
    fixture(timestamp_micros(col("us")))

  private def rowsOf(df: DataFrame) = df.collect().toSeq

  test("written fixtures really carry the three distinct ts encodings") {
    assert(spark.read.parquet(s"$nanosDir/events.parquet")
      .schema("ts").dataType === LongType)
    assert(spark.read.parquet(s"$tsDir/events.parquet")
      .schema("ts").dataType === TimestampNTZType)
    assert(spark.read.parquet(s"$tzDir/events.parquet")
      .schema("ts").dataType === TimestampType)
  }

  test("sessions is encoding-invariant") {
    val a = rowsOf(Sessionize.sessions(spark, nanosDir))
    val b = rowsOf(Sessionize.sessions(spark, tsDir))
    val c = rowsOf(Sessionize.sessions(spark, tzDir))
    assert(a.nonEmpty && a === b && a === c)
    // and the gap logic actually ran: user 1 has two sessions
    assert(a.count(_.getLong(0) == 1L) === 2)
  }

  test("hourlyWindows is encoding-invariant") {
    val a = rowsOf(Sessionize.hourlyWindows(spark, nanosDir))
    val b = rowsOf(Sessionize.hourlyWindows(spark, tsDir))
    val c = rowsOf(Sessionize.hourlyWindows(spark, tzDir))
    assert(a.nonEmpty && a === b && a === c)
    assert(a.map(_.getLong(0)).distinct.size >= 3) // multi-hour span survived
  }

  test("slidingWindows is encoding-invariant") {
    val a = rowsOf(Sessionize.slidingWindows(spark, nanosDir))
    val b = rowsOf(Sessionize.slidingWindows(spark, tsDir))
    assert(a.nonEmpty && a === b)
  }

  test("runningTotals and funnel are encoding-invariant") {
    assert(rowsOf(Sessionize.runningTotals(spark, nanosDir)) ===
      rowsOf(Sessionize.runningTotals(spark, tsDir)))
    assert(rowsOf(Sessionize.funnel(spark, nanosDir)) ===
      rowsOf(Sessionize.funnel(spark, tsDir)))
  }

  test("purchaseAttribution (as-of) and purchaseViewWindow (range) are encoding-invariant") {
    val a = rowsOf(TemporalJoin.purchaseAttribution(spark, nanosDir))
    assert(a === rowsOf(TemporalJoin.purchaseAttribution(spark, tsDir)))
    // the as-of actually matched: purchase 5 attributes to view 4
    assert(a.exists(r => r.getLong(0) == 5L && r.getLong(3) == 4L))
    assert(rowsOf(TemporalJoin.purchaseViewWindow(spark, nanosDir)) ===
      rowsOf(TemporalJoin.purchaseViewWindow(spark, tsDir)))
  }

  test("streaming drives are encoding-invariant and match the batch twins") {
    // exercises the STREAMING adaptive paths the batch tests cannot:
    // Tables.timestampOf (watermark projection in eventStream) and — via
    // the late drive below — Tables.tsLiteralOf (sentinel rows written in
    // the corpus's own encoding and read back under its schema)
    import graft.streaming.StreamDrive
    val a = rowsOf(StreamDrive.hourlyFromFiles(spark, nanosDir))
    val b = rowsOf(StreamDrive.hourlyFromFiles(spark, tsDir))
    assert(a.nonEmpty && a === b)
    assert(a === rowsOf(Sessionize.hourlyWindows(spark, nanosDir)))
    val sa = rowsOf(StreamDrive.sessionsFromFiles(spark, nanosDir))
    val sb = rowsOf(StreamDrive.sessionsFromFiles(spark, tsDir))
    assert(sa.nonEmpty && sa === sb)
    assert(sa === rowsOf(Sessionize.sessions(spark, nanosDir)))
  }

  test("watermark-eviction drive (sentinel literals) is encoding-invariant") {
    // the fixture spans ~4.4 h — just over the late drive's >= 4 h
    // corpus-span requirement, so the stale/allowed-late staging and the
    // tsLiteralOf sentinel encoding both genuinely execute
    import graft.streaming.StreamDrive
    val a = rowsOf(StreamDrive.hourlyLateFromFiles(spark, nanosDir))
    val b = rowsOf(StreamDrive.hourlyLateFromFiles(spark, tsDir))
    assert(a.nonEmpty && a === b)
  }

  test("an unsupported ts type fails loudly with a named cause") {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-ts-canary-bad").toString)
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), col("us").cast("string").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Sessionize.sessions(spark, dir).collect()
    }
    assert(e.getMessage.contains("events.ts"))
  }
}
