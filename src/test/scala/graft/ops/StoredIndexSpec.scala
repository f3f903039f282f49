package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The serving-path store read in isolation: only the probed partition
  * directories enter the scan, probed-but-unwritten buckets drop via the
  * existence check, and the all-missing edge returns an EMPTY frame with
  * the contract schema instead of throwing (the integration sweeps in
  * ScaleDesignSpec always probe at least one written bucket, so the
  * empty branch is pinned only here). */
class StoredIndexSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("bucket", LongType)))

  private def writeStore(): String = {
    val dir = graft.Scaffold.cleanupOnExit(java.nio.file.Files
      .createTempDirectory("graft-storedindex-spec").toString)
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 20L), (4L, "d", 30L))
      .toDF("id", "v", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    dir
  }

  test("reads exactly the probed directories; missing buckets drop silently") {
    val dir = writeStore()
    // 10 and 30 exist, 99 was never written
    val df = StoredIndex.readProbed(spark, dir, "bucket",
      Seq(10L, 30L, 99L), schema)
    assert(df.schema.fieldNames.toSeq == Seq("id", "v", "bucket"))
    assert(df.schema("bucket").dataType == LongType,
      "explicit schema must pin the partition column type (inference " +
        "would narrow small dir values to Int)")
    val rows = df.select(col("id"), col("v"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq((1L, "a", 10L), (2L, "b", 10L), (4L, "d", 30L)))
    // the scan's root paths are ONLY the probed-and-existing directories
    val scanPaths = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.getName)
    }.flatten
    assert(scanPaths.sorted == Seq("bucket=10", "bucket=30"),
      s"scan listed more than the probed dirs: $scanPaths")
  }

  test("wide probes take the single-listing branch and agree with point checks") {
    val dir = writeStore()
    // > ListingThreshold values forces the one-listing path; result must
    // be identical to what the narrow (per-value exists) path returns
    val wide = (0L until 40L).map(_ * 10L) // includes 10, 20, 30 + 37 misses
    val viaListing = StoredIndex.readProbed(spark, dir, "bucket", wide, schema)
      .select(col("id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaPoints = StoredIndex.readProbed(spark, dir, "bucket",
        Seq(10L, 20L, 30L), schema)
      .select(col("id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaListing == viaPoints)
    assert(viaListing == Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L)))
  }

  test("caller errors fail fast instead of masquerading as empty results") {
    val dir = writeStore()
    // a store root that was never written is a probe-before-write bug
    intercept[IllegalArgumentException] {
      StoredIndex.readProbed(spark, dir + "-nope", "bucket", Seq(1L), schema)
    }
    // a partition column the store isn't keyed on can never match
    intercept[IllegalArgumentException] {
      StoredIndex.readProbed(spark, dir, "sig", Seq(10L), schema)
    }
    // a value needing Hive path escaping is rejected, not silently missed
    intercept[IllegalArgumentException] {
      StoredIndex.readProbed(spark, dir, "bucket", Seq("a b"), schema)
    }
  }

  test("duplicate probed values scan their directory once") {
    val dir = writeStore()
    val rows = StoredIndex.readProbed(spark, dir, "bucket",
        Seq(10L, 10L, 30L), schema)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(rows == Seq((1L, 10L), (2L, 10L), (4L, 30L)),
      s"duplicated probe values must not duplicate rows: $rows")
  }

  test("all probed buckets missing yields an empty frame with the contract schema") {
    val dir = writeStore()
    val df = StoredIndex.readProbed(spark, dir, "bucket", Seq(98L, 99L), schema)
    assert(df.schema == schema)
    assert(df.count() == 0)
    // and an empty probe set likewise (a query routed to no buckets)
    assert(StoredIndex.readProbed(spark, dir, "bucket", Nil, schema).count() == 0)
  }
}
