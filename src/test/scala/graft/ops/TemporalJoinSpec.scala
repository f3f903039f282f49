package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-data semantics for the temporal joins: the driver corpus
  * exercises the production queries end-to-end (x_asof_join /
  * x_range_join vs the DuckDB inequality-join oracles), so these specs
  * pin exactly the edges the corpus can't reach — equal-timestamp ties,
  * window boundaries, zero-match probes, and pre-epoch bucketing. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofOf: inclusive at-or-before, max-(us,id) tie-break, null when no prior build") {
    val build = Seq(
      (1L, 10L, 100L, 1.0), // key 1: builds at 10, two tied at 20
      (1L, 20L, 200L, 2.0),
      (1L, 20L, 201L, 2.5),
      (3L, 50L, 300L, 9.0)  // key 3: build strictly after the probe
    ).toDF("key", "us", "build_id", "build_value")
    val probe = Seq(
      (1L, 5L, 1000L),  // before any build → null
      (1L, 20L, 1001L), // tie with builds at 20 → inclusive, max id (201)
      (1L, 25L, 1002L), // after the tie → still 201
      (2L, 99L, 1003L), // key with no builds at all → null
      (3L, 40L, 1004L)  // build exists but only later → null
    ).toDF("key", "us", "probe_id")
    val out = TemporalJoin.asofOf(probe, build)
      .select("probe_id", "build_id", "build_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1000L) == ((None, None)))
    assert(out(1001L) == ((Some(201L), Some(2.5))))
    assert(out(1002L) == ((Some(201L), Some(2.5))))
    assert(out(1003L) == ((None, None)))
    assert(out(1004L) == ((None, None)))
  }

  test("rangeOf: [us-len, us) boundaries, zero-match rows present, per-probe sums") {
    val build = Seq(
      (1L, 9L, 100.0),  // just below the window of probe@20 (len 10)
      (1L, 10L, 1.0),   // inclusive lower bound
      (1L, 19L, 2.0),   // inside
      (1L, 20L, 4.0)    // exclusive upper bound — not counted
    ).toDF("key", "us", "build_value")
    val probe = Seq(
      (1L, 20L, 1000L),
      (2L, 20L, 1001L)  // no builds on key 2 → (0, 0.0)
    ).toDF("key", "us", "probe_id")
    val out = TemporalJoin.rangeOf(probe, build, lenUs = 10L)
      .select("probe_id", "n_matches", "sum_value")
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, sv) => k -> ((n, sv)) }.toMap
    assert(out(1000L) == ((2L, 3.0)))
    assert(out(1001L) == ((0L, 0.0)))
  }

  test("rangeOf: pre-epoch timestamps bucket by floor division, not trunc-toward-zero") {
    // probe window [-15, -5): the build at -10 must match. A
    // trunc-toward-zero bucketing maps -10 to bucket -1 but the probe's
    // window start -15 to bucket -1 as well ONLY under floor semantics;
    // with `div` the start lands in bucket -1 vs the build's bucket 0 —
    // planted here because the driver corpus has no negative timestamps.
    val build = Seq(
      (1L, -10L, 7.0),
      (1L, -5L, 9.0),  // == probe.us → end-exclusive, not counted
      (1L, -16L, 1.0)  // below window start
    ).toDF("key", "us", "build_value")
    val probe = Seq((1L, -5L, 1L)).toDF("key", "us", "probe_id")
    val out = TemporalJoin.rangeOf(probe, build, lenUs = 10L)
      .select("n_matches", "sum_value").as[(Long, Double)].head()
    assert(out == ((1L, 7.0)))
  }

  test("floorDiv matches Math.floorDiv over sign/boundary cases") {
    val cases = Seq(-21L, -20L, -15L, -10L, -1L, 0L, 1L, 9L, 10L, 19L,
      Long.MaxValue, Long.MaxValue - 1, Long.MinValue + 1)
    val got = cases.toDF("x")
      .select(TemporalJoin.floorDiv(col("x"), 10L)).as[Long].collect()
    cases.zip(got).foreach { case (x, g) =>
      assert(g == Math.floorDiv(x, 10L), s"floorDiv($x, 10)")
    }
  }

  test("production asof/range queries agree on the driver corpus where the window saturates") {
    // Every purchase whose attribution window [p-1h, p) contains at least
    // one view must ALSO have an as-of match (any view before p works) —
    // a cross-operator implication that needs no oracle.
    val sf = "/root/testdata/sf0.001"
    val asof = TemporalJoin.purchaseAttribution(spark, sf)
      .select(col("purchase_id"), col("view_event_id").isNotNull.as("has_asof"))
    val range = TemporalJoin.purchaseViewWindow(spark, sf)
      .select(col("purchase_id"), (col("n_views_1h") > 0).as("has_range"))
    val broken = asof.join(range, "purchase_id")
      .filter(col("has_range") && !col("has_asof")).count()
    assert(broken == 0)
    assert(asof.count() > 0)
  }
}
