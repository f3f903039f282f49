package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Sketch-based aggregations (extension operators): bounded-state
  * summaries that replace full-shuffle exact aggregation when the key
  * space is huge but only the heavy tail matters. */
object Sketches {

  /** Heavy hitters over `events.event_type` via the Misra–Gries summary.
    * Capacity 64 comfortably exceeds the event-type cardinality, so by
    * the MG exactness corollary (no reduction ever fires) the sketch
    * equals the exact `GROUP BY` counts — which is precisely what the
    * DuckDB oracle checks. The >capacity regime (approximation bound,
    * merge behavior) is spec-tested with planted skew where an oracle
    * can't express the tolerance. */
  def heavyHitters(s: SparkSession, d: String, k: Int = 64): DataFrame =
    Tables.events(s, d)
      .agg(MisraGries.sketch(col("event_type"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("item"), col("e.est_count").as("est_count"))
      .orderBy(col("item"))
}
