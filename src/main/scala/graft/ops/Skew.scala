package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys (SURVEY §7 / 100 TB posture).
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Bench sessions); these
  * operators cover what AQE cannot: aggregation skew, where one hot
  * group (one URL's triples, one degenerate shingle, one bot user's
  * events) lands on a single reducer regardless of partition splitting.
  */
object Skew {

  /** Two-stage salted aggregation for algebraic aggregates: groupBy
    * (key, salt) pre-aggregates the hot key across `saltBuckets`
    * reducers, then a second tiny aggregation merges the partials.
    *
    * `partials` maps each aggregation to its salted partial form;
    * `merges` recombines partials (e.g. partial `count` → merge `sum`).
    * Both stages are plain hash aggregates — the plan stays
    * whole-stage-codegen'd and AQE-coalescible. */
  def saltedAggregate(df: DataFrame, key: Column, saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    // The salt must be DETERMINISTIC per row: partition-id/monotonic-id
    // salts change when a task is recomputed after a fetch failure, which
    // can drop or double-count rows across the two aggregation stages
    // (the SPARK-23207 nondeterministic-shuffle-key trap). A content hash
    // of the full row is retry-safe and spreads hot keys equally —
    // caveat: byte-identical duplicate rows share a salt bucket, so a hot
    // key consisting of EXACT duplicates needs an upstream uniqueifier.
    // Hash the JSON rendering: xxhash64 rejects MapType columns directly,
    // and df(c) (not col(c)) keeps dotted column names literal.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(to_json(struct(df.columns.map(df(_)).toIndexedSeq: _*))),
        lit(saltBuckets.toLong)).cast("int"))
    salted
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(merges.head, merges.tail: _*)
  }

  /** Convenience: skew-safe count per key. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int = 16): DataFrame =
    saltedAggregate(df, key, saltBuckets,
      partials = Seq(count(lit(1)).as("__n")),
      merges = Seq(sum(col("__n")).as("n")))
      .withColumnRenamed("__key", "key")
}
