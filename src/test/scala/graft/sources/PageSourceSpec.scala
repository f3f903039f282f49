package graft.sources

import graft.SparkSpec
import graft.pipeline.ExtractPipeline
import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._

/** S2/S3: plain + gzipped page files through the source into the
  * extraction pipeline. */
class PageSourceSpec extends SparkSpec {
  import spark.implicits._

  private val html =
    """<div about="https://example.org/b/1" vocab="http://schema.org/">
      |<span property="name">Besluit één</span></div>""".stripMargin

  test("plain and .gz files read identically; urls derived from filenames") {
    val dir = Files.createTempDirectory("pages").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.html"), html)
    val gz = new GZIPOutputStream(new FileOutputStream(s"$dir/b.html.gz"))
    gz.write(html.getBytes("UTF-8")); gz.close()

    val pages = PageSource.readPages(spark, dir).cache()
    val rows = pages.select("url", "html").as[(String, String)].collect().toMap
    assert(rows.keySet == Set("share://a.html", "share://b.html"))
    assert(rows.values.toSeq.distinct.size == 1, "gzip must decode to same text")
    assert(rows("share://b.html") == html)

    // feeds the pipeline end-to-end
    val quads = ExtractPipeline.run(spark, pages.select("url", "html"))
    assert(quads.filter(col("predicate.value") === "http://schema.org/name")
      .count() == 2)
    pages.unpersist()
  }
}
