package graft.functions

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int) =
    items.toDF("v").repartition(parts)
      .agg(MisraGries.sketch(col("v"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .as[(String, Long)].collect().toMap

  test("exact when distinct <= capacity, across many partitions and merges") {
    val items = Seq.tabulate(5000)(i => s"key${i % 7}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(sketch(items, k = 8, parts = 13) == exact)
  }

  test("above capacity: est <= true, error <= N/(k+1), heavy item always present") {
    // 4000 occurrences of "heavy" + 6000 spread over 600 light keys;
    // capacity 8 → error bound N/(k+1) = 10000/9 ≈ 1111 < 4000, so the
    // MG guarantee forces "heavy" into the summary with a count that
    // undershoots by at most the bound.
    val items = scala.util.Random.shuffle(
      Seq.fill(4000)("heavy") ++ Seq.tabulate(6000)(i => s"light${i % 600}"))
    val n = items.size
    val k = 8
    val out = sketch(items, k, parts = 11)
    assert(out.size <= k)
    assert(out.contains("heavy"))
    val est = out("heavy")
    assert(est <= 4000L)
    assert(4000L - est <= n / (k + 1), s"est=$est bound=${n / (k + 1)}")
    // every surviving estimate must undershoot its true count
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { case (item, e) =>
      assert(e <= exact(item), s"$item: est $e > true ${exact(item)}")
    }
  }

  test("nulls are skipped, not counted as a key") {
    val out = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("v")
      .agg(MisraGries.sketch(col("v"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("production heavy-hitters query is exact groupBy counts on the driver corpus") {
    val sf = "/root/testdata/sf0.001"
    val got = Sketches.heavyHitters(spark, sf)
      .as[(String, Long)].collect().toMap
    val exact = graft.ops.Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type")).count()
      .as[(String, Long)].collect().toMap
    assert(got == exact)
  }
}
