package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (north-star extension:
  * sessionization + time-window aggregation, the batch twins of the
  * Structured Streaming versions in graft.streaming).
  *
  * `ts` arrives as long nanoseconds (see the nanosAsLong session conf);
  * all arithmetic stays in integer microseconds — exact, oracle-stable,
  * and cheaper than timestamp codecs in the shuffle.
  */
object Sessionize {

  private def micros = expr("ts div 1000")

  /** Gap-based sessionization (30-minute inactivity): the classic
    * lag → new-session flag → running sum pattern. Both windows share one
    * partitioning (user_id), so this is a single shuffle + sort. */
  def sessions(s: SparkSession, d: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(s, d)
      .select(col("user_id"), micros.as("us"))
      .withColumn("new_sess",
        when(coalesce(col("us") - lag(col("us"), 1).over(byUser),
          lit(Long.MaxValue)) > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  /** Tumbling 1-hour window aggregation: integer hour-bucket keys (no
    * timestamp round-trip), partial+final hash agg. */
  def hourlyWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr("(ts div 1000) div 3600000000").as("hour_bucket"),
        col("event_type"), col("value"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
}
