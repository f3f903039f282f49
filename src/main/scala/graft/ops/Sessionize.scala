package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (north-star extension:
  * sessionization + time-window aggregation, the batch twins of the
  * Structured Streaming versions in graft.streaming).
  *
  * `ts` may arrive as long nanoseconds OR as a timestamp column — the
  * schema belongs to the source, not the engine ([[Tables.eventMicros]]);
  * all arithmetic stays in integer microseconds — exact, oracle-stable,
  * and cheaper than timestamp codecs in the shuffle.
  */
object Sessionize {

  private def micros(df: DataFrame) = Tables.eventMicros(df)

  /** Gap-based sessionization (30-minute inactivity): the classic
    * lag → new-session flag → running sum pattern. Both windows share one
    * partitioning (user_id), so this is a single shuffle + sort. */
  def sessions(s: SparkSession, d: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val ev = Tables.events(s, d)
    ev.select(col("user_id"), micros(ev).as("us"))
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
  def hourlyWindows(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.select(call_function("div", micros(ev), lit(3600000000L)).as("hour_bucket"),
        col("event_type"), col("value"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** Sliding windows (1 h long, 30 min slide): each event lands in
    * window/slide = 2 overlapping windows, produced by an explode over
    * the window index — the batch mirror of `window(ts, "1 hour",
    * "30 minutes")`, in the same integer-microsecond arithmetic as the
    * tumbling op, whichever `ts` encoding the source uses. Fan-out
    * happens map-side; one shuffle for the final aggregation. */
  def slidingWindows(s: SparkSession, d: String,
      windowUs: Long = 3600000000L, slideUs: Long = 1800000000L): DataFrame = {
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("value"))
    ev.schema("ts").dataType match {
      // long-nanos inputs need the pre-division sign guard below
      case org.apache.spark.sql.types.LongType =>
        slidingWindowsNanos(ev, windowUs, slideUs)
      // timestamp inputs: unix_micros is exact (no truncating division),
      // so the pre-epoch guard runs directly on the micros
      case _ =>
        slidingWindowsOf(
          ev.select(micros(ev).as("us"), col("event_type"), col("value"))
            .filter(col("us") >= 0),
          windowUs, slideUs)
    }
  }

  /** Nanos→micros adapter over any `(ts, event_type, value)` frame.
    * The `ts >= 0` guard must run BEFORE the nanos→micros division:
    * `div` truncates toward zero, so ts ∈ (-999, -1) ns would otherwise
    * map to us = 0 and alias into window 0 — the same truncation class
    * `slidingWindowsOf` already guards one level down, which can't see
    * it because the sign is lost in this wrapper's division. */
  def slidingWindowsNanos(events: DataFrame,
      windowUs: Long = 3600000000L, slideUs: Long = 1800000000L): DataFrame =
    slidingWindowsOf(
      events.filter(col("ts") >= 0)
        .select(expr("ts div 1000").as("us"), col("event_type"), col("value")),
      windowUs, slideUs)

  /** Core sliding-window op over any `(us, event_type, value)` frame —
    * split out so specs can plant pre-epoch timestamps. */
  def slidingWindowsOf(events: DataFrame,
      windowUs: Long = 3600000000L, slideUs: Long = 1800000000L): DataFrame = {
    val k = (windowUs / slideUs).toInt
    events
      .select(col("event_type"), col("value"),
        explode(sequence(lit(0), lit(k - 1))).as("i"),
        col("us"))
      // guard BEFORE the division: `div` truncates toward zero, so a
      // negative intermediate (us < i*slide, i.e. pre-epoch or within
      // the first slide) would alias into window 0 instead of being
      // dropped — floor-division semantics need the filter first
      .filter(col("us") >= col("i") * lit(slideUs))
      .select(
        // `div`, not `/`: Spark's `/` on longs is DOUBLE division
        expr(s"((us - i * ${slideUs}L) div ${slideUs}L) * ${slideUs}L")
          .as("window_start_us"),
        col("event_type"), col("value"))
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** Per-user running totals: cumulative sum + sequence number over an
    * explicit ROWS UNBOUNDED PRECEDING..CURRENT ROW frame (the running
    * frame none of the other window ops exercise — sessionize's running
    * sum rides the default RANGE frame). Ties on `us` are ordered by
    * `event_id` on both the Spark and oracle sides, so the cumulative
    * double additions happen in the same sequence and the sums compare
    * exactly. One shuffle on user_id. */
  def runningTotals(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val ev = Tables.events(s, d)
    ev.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), micros(ev).as("us"), col("value"))
      .withColumn("run_value", round(sum(col("value")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .withColumn("seq", row_number().over(byUser).cast("long"))
      .select(col("user_id"), col("event_id"), col("us"),
        col("run_value"), col("seq"))
      .orderBy(col("user_id"), col("seq"))
  }

  /** Strictly-ordered conversion funnel (view → click → purchase): a
    * user reaches step N when an event of step N's type occurs AFTER the
    * user's step-N-1 arrival time. ONE shuffle total: events aggregate
    * into a per-user array, and every step is pure array algebra on it
    * (min of typed timestamps above a bound) — versus the three
    * groupBy+join rounds of the textbook formulation. Per-user state is
    * bounded by the user's event count; for mega-users pre-filter to the
    * funnel's event types (done here) or fall back to the join form. */
  def funnel(s: SparkSession, d: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val ev = Tables.events(s, d)
    funnelOf(ev.select(col("user_id"), micros(ev).as("us"), col("event_type")),
      steps)
  }

  /** Core funnel over any `(user_id, us, event_type)` frame — split out
    * so specs can drive planted out-of-order cases (the driver corpus
    * saturates: every user completes every step). Null user_ids are
    * excluded on both the Spark and oracle sides (SQL join semantics
    * would silently drop them asymmetrically otherwise). */
  def funnelOf(events: DataFrame, steps: Seq[String]): DataFrame = {
    val perUser = events
      .filter(col("user_id").isNotNull && col("event_type").isin(steps: _*))
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("us"), col("event_type"))).as("seq"))
    // first event of `tpe` strictly after `after` (null when none)
    def firstAfter(tpe: String, after: org.apache.spark.sql.Column) =
      array_min(transform(
        filter(col("seq"), x =>
          x.getField("event_type") === tpe && x.getField("us") > after),
        x => x.getField("us")))
    val reached = steps.zipWithIndex.foldLeft(perUser) {
      case (df, (tpe, i)) =>
        val after = if (i == 0) lit(Long.MinValue) else col(s"t${i - 1}")
        df.withColumn(s"t$i", firstAfter(tpe, after))
    }
    reached.agg(
      count(lit(1)).as("n_users"),
      steps.indices.map(i =>
        count(col(s"t$i")).as(s"n_step${i + 1}_${steps(i)}")): _*)
  }
}
