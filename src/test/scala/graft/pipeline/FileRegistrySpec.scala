package graft.pipeline

import graft.SparkSpec
import graft.rdf.Vocab
import org.apache.spark.sql.functions._

class FileRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def manifest = Seq(
    ("http://t/1", "http://g/1", "valid.ttl", 1234L, "http://page/1"))
    .toDF("task", "graph", "file_name", "size", "derived_from")

  test("K2: physical+logical entities with dataSource link") {
    val quads = FileRegistry.fileMetadataQuads(manifest, "2026-01-01T00:00:00Z")
    val bySubject = quads.collect().groupBy(_.getAs[String]("subject"))
    assert(bySubject.size == 2)
    val (physical, logical) = bySubject.keys.partition(_.startsWith("share://"))
    assert(physical.size == 1 && logical.size == 1)
    val link = quads.filter(col("predicate") === Vocab.nieDataSource).collect()
    assert(link.length == 1)
    assert(link.head.getAs[String]("subject") == physical.head)
    assert(link.head.getAs[String]("obj") == logical.head)
    assert(quads.filter(col("predicate") === Vocab.nfoFileSize &&
      col("obj") === "1234").count() == 2)
    assert(physical.head.endsWith(".ttl"))
    // the physical entity's fileName must be the share URI's basename
    val physName = quads.filter(col("subject") === physical.head &&
      col("predicate") === Vocab.nfoFileName).collect().head.getAs[String]("obj")
    assert(s"share://$physName" == physical.head)
  }

  test("K3/K4: containers link files and graphs back to the task") {
    val quads = FileRegistry.containerQuads(manifest)
    val links = quads.filter(col("subject") === "http://t/1" &&
      col("predicate") === Vocab.taskResultsContainer)
    assert(links.count() == 2) // file container + graph container
    assert(quads.filter(col("predicate") === Vocab.taskHasFile).count() == 1)
    assert(quads.filter(col("predicate") === Vocab.taskHasGraph).count() == 1)
  }

  test("F4: share URI ⇄ path rewrite (file-helpers.js:35,91)") {
    val df = Seq("share://a/b.ttl").toDF("u")
      .select(FileRegistry.shareUriToPath(col("u")).as("p"))
    assert(df.as[String].head() == "/share/a/b.ttl")
    val back = df.select(FileRegistry.pathToShareUri(col("p"))).as[String].head()
    assert(back == "share://a/b.ttl")
  }

  test("idempotency: same manifest → same URIs (deterministic minting)") {
    val a = FileRegistry.fileMetadataQuads(manifest, "2026-01-01T00:00:00Z")
      .select("subject").distinct().as[String].collect().toSet
    val b = FileRegistry.fileMetadataQuads(manifest, "2026-01-01T00:00:00Z")
      .select("subject").distinct().as[String].collect().toSet
    assert(a == b)
  }
}
