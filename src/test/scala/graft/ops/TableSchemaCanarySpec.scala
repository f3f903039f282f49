package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
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
}
