package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harvested-page ingest (SURVEY S2/S3): a directory of HTML files —
  * plain or gzipped — becomes a `(url, html)` DataFrame for
  * [[graft.pipeline.ExtractPipeline]].
  *
  * The reference streams each file and pipes `.gz` paths through
  * `createUnzip()` (lib/rdfa-extractor.js:65-70); Spark's text source
  * applies the Hadoop codec by extension, so gzip is transparent here.
  * `wholetext` keeps one row per file (an HTML document must not be
  * split), and `input_file_name()` carries provenance.
  *
  * 100 TB posture: one whole document per row is the right granularity —
  * parallelism comes from the number of files, and
  * `spark.sql.files.maxPartitionBytes` / `openCostInBytes` control
  * packing of small harvested pages into tasks. Gzipped inputs are
  * per-file work units by nature (non-splittable), which matches the
  * one-page-one-document model.
  */
object PageSource {

  /** Read every HTML/HTML.gz page under `dir`. `urlFor` rewrites the file
    * path to the page's logical URL (the reference resolves share://
    * paths to remote URLs through the triplestore, lib/file-helpers.js —
    * here a pure column rewrite). */
  def readPages(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(s"$dir/*")
      .select(input_file_name().as("path"), col("value").as("html"))
      .withColumn("url", pathToUrl(col("path")))
      .select(col("url"), col("html"), col("path"))

  /** file:/…/name(.html)(.gz) → share://name.html URI (F4 analogue).
    * `input_file_name()` returns a percent-encoded URI path → decoded
    * back to the filesystem name; bare `<name>.gz` files (the reference
    * unzips any .gz regardless of inner extension) still get `.html`. */
  def pathToUrl(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val raw = element_at(split(path, "/"), -1)
    // url_decode is form-decoding: a literal '+' (legal, unencoded in URI
    // paths) would become a space — shield it as %2B first. A stray '%'
    // in a filename makes decoding fail → try_url_decode + fall back to
    // the raw name rather than aborting the scan.
    val decoded = coalesce(
      try_url_decode(regexp_replace(raw, "\\+", "%2B")), raw)
    val base = regexp_replace(decoded, "\\.gz$", "")
    concat(lit("share://"),
      when(base.endsWith(".html"), base).otherwise(concat(base, lit(".html"))))
  }
}
