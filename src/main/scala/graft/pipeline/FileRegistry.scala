package graft.pipeline

import graft.rdf.Vocab
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File/container metadata registration — the INSERT DATA sinks K2-K4
  * (lib/file-helpers.js:103-147, lib/pipeline-import.js:180-218) as quad
  * generators over the written-TTL manifest.
  *
  * Input: a manifest DataFrame with one row per written result file
  * (`task`, `graph`, `file_name`, `size`, `derived_from`). Output: the
  * metadata quads to append to the store. URIs are content-derived
  * (sha1 of task+file name) rather than uuid-minted — deterministic and
  * idempotent under re-runs (same deviation as ExtractPipeline G2).
  */
object FileRegistry {

  private val sharePrefix = "share://"
  private val logicalPrefix = "http://data.lblod.info/id/files/"

  /** F4 share-URI ⇄ filesystem path rewrite (lib/file-helpers.js:35,91). */
  def shareUriToPath(uri: Column): Column =
    regexp_replace(uri, "^share://", "/share/")
  def pathToShareUri(path: Column): Column =
    regexp_replace(path, "^/share/", sharePrefix)

  /** K2: physical (`share://…`) + logical file entities, 10 properties
    * each, `nie:dataSource` linking physical → logical, plus
    * `prov:wasDerivedFrom` (lib/file-helpers.js:108-139). */
  def fileMetadataQuads(manifest: DataFrame, nowIso: String): DataFrame = {
    val id = sha1(concat(col("task"), lit("/"), col("file_name")))
    val logical = concat(lit(logicalPrefix), id)
    val physical = concat(lit(sharePrefix), id, lit("."), col("ext"))
    val m = manifest
      .withColumn("ext", element_at(split(col("file_name"), "\\."), -1))
      .withColumn("logical", logical)
      .withColumn("physical", physical)

    def q(s: Column, p: String, o: Column): Column =
      struct(s.as("subject"), lit(p).as("predicate"), o.cast("string").as("obj"))

    val entityQuads = array(
      // logical entity
      q(col("logical"), Vocab.rdfType, lit(Vocab.nfoFileDataObject)),
      q(col("logical"), Vocab.nfoFileName, col("file_name")),
      q(col("logical"), Vocab.dctFormat, lit("text/turtle")),
      q(col("logical"), Vocab.nfoFileSize, col("size")),
      q(col("logical"), Vocab.dbpediaFileExtension, col("ext")),
      q(col("logical"), Vocab.dctCreated, lit(nowIso)),
      q(col("logical"), Vocab.dctModified, lit(nowIso)),
      q(col("logical"), Vocab.provWasDerivedFrom, col("derived_from")),
      // physical entity mirrors + dataSource link
      q(col("physical"), Vocab.rdfType, lit(Vocab.nfoFileDataObject)),
      q(col("physical"), Vocab.nieDataSource, col("logical")),
      // physical fileName = the share:// URI's basename (same content id)
      q(col("physical"), Vocab.nfoFileName,
        regexp_replace(col("physical"), lit("^share://"), lit(""))),
      q(col("physical"), Vocab.dctFormat, lit("text/turtle")),
      q(col("physical"), Vocab.nfoFileSize, col("size")),
      q(col("physical"), Vocab.dbpediaFileExtension, col("ext")),
      q(col("physical"), Vocab.dctCreated, lit(nowIso)),
      q(col("physical"), Vocab.dctModified, lit(nowIso)))
    m.select(col("graph"), explode(entityQuads).as("q"))
      .select(col("q.subject"), col("q.predicate"), col("q.obj"), col("graph"))
  }

  /** K3/K4: result containers — a file container (`task:hasFile` per
    * file) and a graph container (`task:hasGraph`), both linked from the
    * task via `task:resultsContainer`
    * (lib/pipeline-import.js:37-43, 180-218). */
  def containerQuads(manifest: DataFrame): DataFrame = {
    val fileContainer = concat(
      lit("http://redpencil.data.gift/id/dataContainers/"),
      sha1(concat(col("task"), lit("/files"))))
    val graphContainer = concat(
      lit("http://redpencil.data.gift/id/dataContainers/"),
      sha1(concat(col("task"), lit("/graphs"))))
    val importGraph = concat(
      lit("http://mu.semte.ch/graphs/harvesting/tasks/import/"),
      sha1(col("task")))
    val logical = concat(lit(logicalPrefix),
      sha1(concat(col("task"), lit("/"), col("file_name"))))

    def q(s: Column, p: String, o: Column): Column =
      struct(s.as("subject"), lit(p).as("predicate"), o.cast("string").as("obj"))

    val containerLinks = array(
      q(fileContainer, Vocab.rdfType, lit(Vocab.nfoDataContainer)),
      q(fileContainer, Vocab.taskHasFile, logical),
      q(col("task"), Vocab.taskResultsContainer, fileContainer),
      q(graphContainer, Vocab.rdfType, lit(Vocab.nfoDataContainer)),
      q(graphContainer, Vocab.taskHasGraph, importGraph),
      q(col("task"), Vocab.taskResultsContainer, graphContainer))
    manifest.select(col("graph"), explode(containerLinks).as("q"))
      .select(col("q.subject"), col("q.predicate"), col("q.obj"), col("graph"))
      .distinct()
  }
}
