package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Serving-path reads over partitioned at-rest indexes (the LSH/IVF
  * signature stores, the BM25 term-bucket postings).
  *
  * A probe that opens the store with `read.parquet(base)` pays a full
  * partition DISCOVERY before the partition filter prunes anything: the
  * driver lists every `col=value` directory under the store — ~0.6 s at
  * 256 directories on local disk, and an unbounded object-store listing
  * at the 100 TB layout's 10k-1M buckets — on EVERY probe, for work
  * whose data volume is O(probed buckets). The serving-path read instead
  * enumerates exactly the probed directories (the probe already knows
  * its bucket values — that is what routing computed) and hands Spark
  * those paths with the store's `basePath`, so the partition column
  * still materializes from the directory names and the scan's I/O and
  * listing are both O(probed). Probed values the store never wrote
  * (empty buckets) are dropped by a per-value existence check — one
  * point metadata call each, not a listing.
  *
  * The explicit `dataSchema` is the store's layout contract (stated at
  * each writer); passing it skips footer-based schema inference and
  * pins the partition column's type (directory-name inference would
  * narrow a Long partition value that happens to fit an Int). */
private[ops] object StoredIndex {

  /** Past this many probed values, ONE store listing beats per-value
    * existence checks: each `fs.exists` is a driver metadata round trip
    * (~20 ms against an object store), so a wide probe — the 512/1024-
    * query parity sweeps route to nearly every bucket — would pay
    * thousands of serial round trips where a single LIST (paged, but
    * one logical call) answers them all. Narrow probes (the serving
    * shape: a handful of buckets out of up to millions) stay on point
    * checks, never paying an O(all buckets) listing. */
  private val ListingThreshold = 32

  /** Read only the `partCol=v` directories of `base` for the probed
    * `values`, as a DataFrame with `dataSchema` (which INCLUDES the
    * partition column). Returns an empty frame of the same schema when
    * none of the probed directories exist. No listing/existence result
    * is cached: `base` may be a caller-managed store rewritten in place
    * (the content-keyed temp dirs of `cachedStore` are immutable, but
    * the probe API cannot assume its input is one of them). */
  def readProbed(s: SparkSession, base: String, partCol: String,
      values: Seq[Any], dataSchema: StructType): DataFrame = {
    val hconf = s.sessionState.newHadoopConf()
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(hconf)
    val existing: Seq[String] =
      if (values.size > ListingThreshold) {
        val dirs =
          if (fs.exists(basePath))
            fs.listStatus(basePath).filter(_.isDirectory).map(_.getPath.getName).toSet
          else Set.empty[String]
        values.map(v => s"$partCol=$v").filter(dirs)
          .map(n => new org.apache.hadoop.fs.Path(basePath, n).toString)
      } else
        values.map(v => new org.apache.hadoop.fs.Path(basePath, s"$partCol=$v"))
          .filter(fs.exists).map(_.toString)
    if (existing.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[Row], dataSchema)
    else
      s.read.schema(dataSchema).option("basePath", base).parquet(existing: _*)
  }
}
