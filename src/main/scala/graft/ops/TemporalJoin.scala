package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over the `events` table (extension operators — the
  * reference service has no time-ordered joins; these are the as-of and
  * range joins a training-data/analytics pipeline needs at scale).
  *
  * Both operators deliberately avoid the textbook inequality-join plan
  * (`a JOIN b ON a.key = b.key AND b.t <= a.t`), which Spark executes as
  * a per-key cartesian — O(n·m) pairs per key, a scale-killer for hot
  * keys at 100 TB. The DuckDB oracles USE that textbook formulation, so
  * the cheap plan is verified against the expensive-but-obvious one.
  *
  * Time arithmetic stays in integer microseconds end-to-end (`ts` is
  * projected schema-adaptively via [[Tables.eventMicros]] — the source
  * owns its encoding), same as [[Sessionize]] — exact, oracle-stable, no
  * timestamp codecs in the shuffle.
  */
object TemporalJoin {

  /** Floor division (rounds toward -infinity) — `div` truncates toward
    * zero, which would assign negative (pre-epoch) timestamps to the
    * wrong bucket: -1 div 10 = 0 but the bucket containing -1 us is -1.
    * Pure long arithmetic (no double detour — exact over the full long
    * range): correct the truncating `div` by 1 when the remainder is
    * negative. */
  private[ops] def floorDiv(x: Column, b: Long): Column =
    call_function("div", x, lit(b)) -
      when(x % lit(b) < 0, lit(1L)).otherwise(lit(0L))

  /** As-of join core: for every probe row, the payload of the build row
    * with the greatest `us` such that `build.us <= probe.us` on the same
    * key (ties on build `us` broken by greatest `build_id` — pinned on
    * both the Spark and oracle sides).
    *
    * Contract: `probe(key, us, probe_id)`, `build(key, us, build_id,
    * build_value)`. Output: `(probe_id, key, us, build_id, build_value)`
    * with null build columns when the key has no build row at-or-before.
    *
    * Plan shape: tag build rows 0 and probe rows 1, union, and run
    * `last(payload, ignoreNulls)` over a per-key window sorted by
    * `(us, tag, build_id)` — build rows sort before probe rows at equal
    * timestamps, so "at or before" is inclusive. ONE shuffle on `key`,
    * state per row is a single struct, and no (probe × build) pair ever
    * materializes. The payload travels as one struct so the id and value
    * can never come from different build rows. */
  def asofOf(probe: DataFrame, build: DataFrame): DataFrame = {
    val payloadType = "struct<build_id:bigint,build_value:double>"
    val b = build.select(
      col("key"), col("us"), lit(0).as("tag"),
      col("build_id").cast("long").as("bld_id"),
      struct(col("build_id").cast("long").as("build_id"),
        col("build_value").cast("double").as("build_value")).as("payload"),
      lit(null).cast("long").as("probe_id"))
    val p = probe.select(
      col("key"), col("us"), lit(1).as("tag"),
      lit(null).cast("long").as("bld_id"),
      lit(null).cast(payloadType).as("payload"),
      col("probe_id").cast("long").as("probe_id"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("us"), col("tag"), col("bld_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("asof", last(col("payload"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("probe_id"), col("key"), col("us"),
        col("asof.build_id").as("build_id"),
        col("asof.build_value").as("build_value"))
  }

  /** Range-join core: for every probe row, count/sum the build rows on
    * the same key with `us` in `[probe.us - lenUs, probe.us)` (trailing
    * window, end-exclusive so a build row exactly at the probe time is
    * NOT included — that row belongs to the as-of join's `<=`).
    *
    * Contract: `probe(key, us, probe_id)`, `build(key, us, build_value)`.
    * Output: `(probe_id, key, n_matches, sum_value)` — every probe row
    * appears, zero-match probes with (0, 0.0).
    *
    * Plan shape: bucket time by the window length; a build row lands in
    * exactly one bucket, a probe's trailing window spans at most two, so
    * the probe side explodes ×2 and the match becomes an EQUI-join on
    * (key, bucket) + an exact residual range filter. Candidate pairs are
    * only the ≤2-bucket neighborhood instead of the whole key group —
    * the standard interval-join bucketing that survives hot keys. */
  def rangeOf(probe: DataFrame, build: DataFrame, lenUs: Long): DataFrame = {
    require(lenUs > 0, s"window length must be positive, got $lenUs")
    val b = build.select(
      col("key"), col("us").as("b_us"), col("build_value"),
      floorDiv(col("us"), lenUs).as("bucket"))
    val p = probe.select(
      col("probe_id"), col("key"), col("us"),
      explode(array_distinct(array(
        floorDiv(col("us") - lenUs, lenUs),
        floorDiv(col("us") - 1, lenUs)))).as("bucket"))
    val matched = p.join(b, Seq("key", "bucket"))
      .filter(col("b_us") >= col("us") - lenUs && col("b_us") < col("us"))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), sum(col("build_value")).as("s"))
    probe.select(col("probe_id"), col("key"))
      .join(matched, Seq("probe_id"), "left")
      .select(col("probe_id"), col("key"),
        coalesce(col("n"), lit(0L)).as("n_matches"),
        round(coalesce(col("s"), lit(0.0)), 2).as("sum_value"))
  }

  private def typedEvents(s: SparkSession, d: String, tpe: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === tpe && col("user_id").isNotNull)
      .select(col("user_id").as("key"), Tables.eventMicros(ev).as("us"),
        col("event_id"), col("value"))
  }

  /** Production as-of query: last-touch attribution — for each purchase,
    * the most recent view by the same user at or before the purchase. */
  def purchaseAttribution(s: SparkSession, d: String): DataFrame =
    asofOf(
      typedEvents(s, d, "purchase")
        .select(col("key"), col("us"), col("event_id").as("probe_id")),
      typedEvents(s, d, "view")
        .select(col("key"), col("us"), col("event_id").as("build_id"),
          col("value").as("build_value")))
      .select(col("probe_id").as("purchase_id"), col("key").as("user_id"),
        col("us").as("purchase_us"),
        col("build_id").as("view_event_id"),
        col("build_value").as("view_value"))
      .orderBy(col("purchase_id"))

  /** Production range query: views by the same user within the hour
    * strictly before each purchase (the attribution window). */
  def purchaseViewWindow(s: SparkSession, d: String): DataFrame =
    rangeOf(
      typedEvents(s, d, "purchase")
        .select(col("key"), col("us"), col("event_id").as("probe_id")),
      typedEvents(s, d, "view")
        .select(col("key"), col("us"), col("value").as("build_value")),
      lenUs = 3600000000L)
      .select(col("probe_id").as("purchase_id"), col("key").as("user_id"),
        col("n_matches").as("n_views_1h"),
        col("sum_value").as("sum_view_value"))
      .orderBy(col("purchase_id"))
}
