package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-schema canary generalized to the documents and events tables
  * (r12 VERDICT item 4), completing the family started by
  * [[EventTimeSchemaSpec]] (events.ts encodings) and
  * [[EmbeddingSchemaSpec]] (embedding element width): the DRIVER owns
  * every testdata schema, and a regeneration can plausibly ship ids as
  * int32, text as un-annotated binary, or measures as float32. Each table
  * is written here in its canonical AND alternate encodings from the same
  * logical rows, and the cheapest operator of each consuming family runs
  * over both — so the next driver-side flip of ANY table fails in this
  * named spec, not as a round-level CORRECTNESS collapse.
  */
class TableSchemaCanarySpec extends graft.SparkSpec {

  // ------------------------------------------------------------ documents

  private val docRows = Seq(
    (1L, "the quick brown fox", "en", "web", 19L),
    (2L, "jumps over the lazy dog", "en", "web", 23L),
    (3L, "the quick brown fox", "en", "mirror", 19L), // exact dup of 1
    (4L, "een kleine nederlandse zin", "nl", "web", 26L),
    (5L, "numbers 1 2 3 and words", "en", "feed", 23L))

  private def docsFixture(alternate: Boolean): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-docs-canary").toString)
    val base = docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val df = if (!alternate) base
    else base
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
      .withColumn("text", encode(col("text"), "UTF-8")) // binary, no UTF8 annotation
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val docsCanonical = docsFixture(alternate = false)
  private lazy val docsAlternate = docsFixture(alternate = true)

  test("documents fixtures carry distinct encodings; loader normalizes both") {
    val raw = spark.read.parquet(s"$docsAlternate/documents.parquet")
    assert(raw.schema("doc_id").dataType === IntegerType)
    assert(raw.schema("text").dataType === BinaryType)
    for (d <- Seq(docsCanonical, docsAlternate)) {
      val t = Tables.documents(spark, d)
      assert(t.schema("doc_id").dataType === LongType, s"doc_id in $d")
      assert(t.schema("text").dataType === StringType, s"text in $d")
      assert(t.schema("n_chars").dataType === LongType, s"n_chars in $d")
    }
  }

  test("exact dedup (dedup family) is documents-encoding-invariant") {
    val a = Dedup.exact(spark, docsCanonical).collect().toSeq
    val b = Dedup.exact(spark, docsAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("token counts (text-analysis family) are documents-encoding-invariant") {
    val a = TextAnalysis.tokenCounts(spark, docsCanonical).collect().toSeq
    val b = TextAnalysis.tokenCounts(spark, docsAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("canonical-encoding loads are identity: plan equals a raw read (no extra Project)") {
    // The 100 TB claim behind the adaptive loaders: on data already in
    // the contract encoding, normalization must cost NOTHING — same
    // optimized plan as reading the parquet directly, so pushdown,
    // pruning, and codegen spans are untouched.
    for (t <- Seq("documents", "events")) {
      val loaded = (if (t == "documents") Tables.documents(spark, docsCanonical)
                    else Tables.events(spark, evCanonical))
      val raw = spark.read.parquet(
        s"${if (t == "documents") docsCanonical else evCanonical}/$t.parquet")
      def shape(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.optimizedPlan.toString.replaceAll("#\\d+", "#x")
      assert(shape(loaded) === shape(raw),
        s"$t loader introduced plan nodes on canonical data")
    }
  }

  test("a genuinely unsupported documents encoding fails loudly, named") {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-docs-bad").toString)
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("text", xxhash64(col("text"))) // text as a NUMBER
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("documents.text"))
  }

  // --------------------------------------------------------------- events

  private val evRows = Seq(
    (1L, 100L * 1000000L, 1L, "view", 1.0),
    (2L, 200L * 1000000L, 1L, "click", 2.0),
    (3L, 4000L * 1000000L, 1L, "purchase", 3.0),
    (4L, 3600L * 1000000L, 2L, "view", 4.0),
    (5L, 3900L * 1000000L, 2L, "purchase", 5.5))

  private def eventsFixture(alternate: Boolean): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-ev-canary").toString)
    val base = evRows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
    val df = if (!alternate) base
    else base
      .withColumn("event_id", col("event_id").cast(IntegerType))
      .withColumn("user_id", col("user_id").cast(IntegerType))
      .withColumn("value", col("value").cast(FloatType))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val evCanonical = eventsFixture(alternate = false)
  private lazy val evAlternate = eventsFixture(alternate = true)

  test("events fixtures carry distinct integral/float widths; loader normalizes") {
    val raw = spark.read.parquet(s"$evAlternate/events.parquet")
    assert(raw.schema("user_id").dataType === IntegerType)
    assert(raw.schema("value").dataType === FloatType)
    for (d <- Seq(evCanonical, evAlternate)) {
      val t = Tables.events(spark, d)
      assert(t.schema("user_id").dataType === LongType, s"user_id in $d")
      assert(t.schema("value").dataType === DoubleType, s"value in $d")
    }
  }

  test("sessionize (temporal family) is events-width-invariant") {
    val a = Sessionize.sessions(spark, evCanonical).collect().toSeq
    val b = Sessionize.sessions(spark, evAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
    assert(a.count(_.getLong(0) == 1L) === 2) // the gap logic really ran
  }

  test("hourly windows (window family) are events-width-invariant") {
    val a = Sessionize.hourlyWindows(spark, evCanonical).collect().toSeq
    val b = Sessionize.hourlyWindows(spark, evAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  // --------------------------------------------------- lineitem + orders
  // (r13 VERDICT item 5): the relational reference-parity queries read
  // these raw until now — a regeneration flipping keys to int32,
  // measures to float32, or dates to tz-adjusted TIMESTAMP / int64 nanos
  // would have surfaced as a round-level CORRECTNESS collapse, the exact
  // failure class the documents/events canaries already absorb.

  private def lineitemFixture(alternate: Boolean): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-li-canary").toString)
    val base = Seq(
      (1L, 10L, 5L, 1, 17.0, 100.5, 0.04, 0.02, "N", "O", 800000000L),
      (1L, 11L, 6L, 2, 36.0, 200.25, 0.09, 0.06, "N", "O", 810000000L),
      // keep disc_price off a round-half-to-even boundary: float32
      // narrowing moves the 8th significand digit, which flips a .xx5
      // half-case under round(…, 2) — a fixture artifact, not a loader
      // defect (50.0 * 0.90 = 45.0, safely interior)
      (2L, 12L, 7L, 1, 8.0, 50.0, 0.10, 0.02, "R", "F", 820000000L),
      (3L, 13L, 8L, 1, 28.0, 75.0, 0.00, 0.04, "A", "F", 830000000L),
      // past q1's shipdate cutoff — proves the filter ran on both encodings
      (3L, 14L, 8L, 2, 99.0, 75.0, 0.00, 0.04, "A", "F", 999999999L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "sec")
      .withColumn("l_shipdate",
        timestamp_seconds(col("sec")).cast(TimestampNTZType)).drop("sec")
    val df = if (!alternate) base
    else base // keys narrow, measures narrow, date tz-adjusted
      .withColumn("l_orderkey", col("l_orderkey").cast(IntegerType))
      .withColumn("l_partkey", col("l_partkey").cast(IntegerType))
      .withColumn("l_quantity", col("l_quantity").cast(FloatType))
      .withColumn("l_discount", col("l_discount").cast(FloatType))
      .withColumn("l_shipdate", col("l_shipdate").cast(TimestampType))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def ordersFixture(alternate: Boolean): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-ord-canary").toString)
    val base = Seq(
      (1L, 7L, "O", 1000.5, 800000000L, "1-URGENT"),
      (2L, 8L, "F", 2000.25, 810000000L, "3-MEDIUM"),
      (3L, 7L, "O", 150.0, 820000000L, "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "sec", "o_orderpriority")
      .withColumn("o_orderdate",
        timestamp_seconds(col("sec")).cast(TimestampNTZType)).drop("sec")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val df = if (!alternate) base
    else base // keys narrow, price narrow, date as int64 NANOS (events-ts style)
      .withColumn("o_orderkey", col("o_orderkey").cast(IntegerType))
      .withColumn("o_custkey", col("o_custkey").cast(IntegerType))
      .withColumn("o_totalprice", col("o_totalprice").cast(FloatType))
      .withColumn("o_orderdate", (unix_micros(col("o_orderdate")
        .cast(TimestampType)) * 1000L).cast(LongType))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  private lazy val liCanonical = lineitemFixture(alternate = false)
  private lazy val liAlternate = lineitemFixture(alternate = true)
  private lazy val ordCanonical = ordersFixture(alternate = false)
  private lazy val ordAlternate = ordersFixture(alternate = true)

  test("lineitem/orders fixtures carry distinct encodings; loaders normalize both") {
    val rawLi = spark.read.parquet(s"$liAlternate/lineitem.parquet")
    assert(rawLi.schema("l_orderkey").dataType === IntegerType)
    assert(rawLi.schema("l_quantity").dataType === FloatType)
    assert(rawLi.schema("l_shipdate").dataType === TimestampType)
    val rawOrd = spark.read.parquet(s"$ordAlternate/orders.parquet")
    assert(rawOrd.schema("o_orderdate").dataType === LongType)
    for (d <- Seq(liCanonical, liAlternate)) {
      val t = Tables.lineitem(spark, d)
      assert(t.schema("l_orderkey").dataType === LongType, s"l_orderkey in $d")
      assert(t.schema("l_linenumber").dataType === LongType, s"l_linenumber in $d")
      assert(t.schema("l_quantity").dataType === DoubleType, s"l_quantity in $d")
      assert(t.schema("l_shipdate").dataType === TimestampNTZType, s"l_shipdate in $d")
    }
    for (d <- Seq(ordCanonical, ordAlternate)) {
      val t = Tables.orders(spark, d)
      assert(t.schema("o_custkey").dataType === LongType, s"o_custkey in $d")
      assert(t.schema("o_orderdate").dataType === TimestampNTZType, s"o_orderdate in $d")
    }
  }

  test("q1 aggregate (agg family) is lineitem-encoding-invariant") {
    // exercises string groups, double sums, AND the shipdate filter — the
    // wall-clock comparison must survive the tz-adjusted alternate.
    val a = Relational.q1Agg(spark, liCanonical).collect().toSeq
    val b = Relational.q1Agg(spark, liAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
    assert(a.size === 3) // N/O, R/F, A/F groups — the agg really grouped
  }

  test("point lookup (lookup family) is orders-encoding-invariant") {
    // date_format over o_orderdate pins the wall clock: an alternate
    // encoding read back through a zone-shifting cast would change the
    // formatted string, not just an internal representation.
    val a = Relational.pointLookup(spark, ordCanonical).collect().toSeq
    val b = Relational.pointLookup(spark, ordAlternate).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("dimension tables (customer/nation/region) are key-width-invariant through the star join") {
    import spark.implicits._
    def dims(alternate: Boolean): String = {
      val dir = graft.Scaffold.cleanupOnExit(
        Files.createTempDirectory("graft-dim-canary").toString)
      def widen(df: DataFrame, cols: String*) =
        if (!alternate) df
        else cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(LongType)))
      def narrow(df: DataFrame, cols: String*) =
        if (!alternate) df
        else cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(IntegerType)))
      // canonical mirrors the driver: region/nation keys int32,
      // customer keys int64; alternate flips BOTH directions
      widen(Seq((0, "EU"), (1, "AM")).toDF("r_regionkey", "r_name"), "r_regionkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/region.parquet")
      widen(Seq((0, "FRANCE", 0), (1, "PERU", 1), (2, "KENYA", 0))
        .toDF("n_nationkey", "n_name", "n_regionkey"), "n_nationkey", "n_regionkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/nation.parquet")
      narrow(Seq((10L, "alice", 0, 12.5, "BUILDING"), (11L, "bob", 2, 7.25, "AUTO"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
        "c_custkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
      dir
    }
    val a = Relational.starJoin(spark, dims(alternate = false)).collect().toSeq
    val b = Relational.starJoin(spark, dims(alternate = true)).collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("parquet DATE date columns (the natural TPC-H encoding) widen to NTZ midnight") {
    import spark.implicits._
    // midnight-aligned wall dates so the DATE narrowing is lossless and
    // the date_format comparison below is exact in both encodings
    def fixture(asDate: Boolean): String = {
      val dir = graft.Scaffold.cleanupOnExit(
        Files.createTempDirectory("graft-ord-date").toString)
      val enc: Column => Column =
        if (asDate) c => c else c => c.cast(TimestampNTZType)
      Seq((1L, 7L, "O", 1000.5, "1995-05-09", "1-URGENT"),
        (2L, 8L, "F", 2000.25, "1995-09-01", "3-MEDIUM"),
        (3L, 7L, "O", 150.0, "1996-01-02", "5-LOW"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "d", "o_orderpriority")
        .withColumn("o_orderdate", enc(to_date(col("d")))).drop("d")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
      dir
    }
    val dateDir = fixture(asDate = true)
    val ntzDir = fixture(asDate = false)
    assert(spark.read.parquet(s"$dateDir/orders.parquet")
      .schema("o_orderdate").dataType === DateType)
    assert(Tables.orders(spark, dateDir)
      .schema("o_orderdate").dataType === TimestampNTZType)
    // date_format pins the wall clock: DATE must read back as midnight
    val a = Relational.pointLookup(spark, ntzDir).collect().toSeq
    val b = Relational.pointLookup(spark, dateDir).collect().toSeq
    assert(a.nonEmpty && a === b)
    assert(a.head.getAs[String]("o_date") === "1995-05-09 00:00:00")
  }

  test("a genuinely unsupported orders encoding fails loudly, named") {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-ord-bad").toString)
    Seq((1L, "x")).toDF("o_orderkey", "o_orderdate") // date as STRING
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val e = intercept[IllegalArgumentException](Tables.orders(spark, dir))
    assert(e.getMessage.contains("orders.o_orderdate"))
  }
}
