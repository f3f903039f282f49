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

  /** Distinct users per event type, HLL++ estimate guaranteed against
    * the exact count. At 100 TB the HLL path is the one that runs: its
    * state is a mergeable constant-size sketch (map-side partial, no
    * per-value shuffle), where COUNT(DISTINCT) shuffles every distinct
    * (type, user) pair. Here both run side by side and the output states
    * the guarantee the oracle can check — the exact count plus a flag
    * that the estimate landed within `tol` (rsd 2% ⇒ |err| > 5% has
    * ~ zero mass; a sketch regression flips the flag and the row hash).
    * The same twin pattern as the planted-duplicate LSH guarantees:
    * approximate operator, exact SQL-expressible contract. */
  def approxDistinctUsers(s: SparkSession, d: String, rsd: Double = 0.02,
      tol: Double = 0.05): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), rsd).as("est"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * tol)
          .as("within_tol"))
      .orderBy(col("event_type"))
}
