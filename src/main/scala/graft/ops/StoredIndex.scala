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

  /** Probed values must be integral (Int/Long and their boxed forms):
    * the directory name is built by plain interpolation, and integral
    * toString is the ONE rendering guaranteed to match Spark's
    * partition-path escaping byte-for-byte. Anything else — strings
    * needing Hive percent-escapes, floats whose toString ("1.0E7",
    * "10.0" vs a store written from Double) differs from the writer's
    * rendering — would silently miss an existing directory, so it is
    * rejected loudly instead. Every store this class serves partitions
    * on numeric buckets (LSH band hashes, IVF cells, term buckets). */
  private def requireIntegral(v: Any): Unit = v match {
    case _: Int | _: Long | _: java.lang.Integer | _: java.lang.Long => ()
    case other => throw new IllegalArgumentException(
      s"partition value '$other' (${other.getClass.getSimpleName}) is not " +
        "an integral bucket id; readProbed builds directory names by " +
        "interpolation, which only matches Spark's partition-path " +
        "rendering for Int/Long (store on numeric buckets)")
  }

  /** Bounded concurrency for narrow-probe existence checks: each
    * `fs.exists` is a driver metadata round trip (~20 ms against an
    * object store), so running up to [[ListingThreshold]] of them
    * serially costs ~640 ms of serving-path latency where eight in
    * flight cost ~80. Eight is small enough never to look like a
    * listing storm to an object store's request limiter. The pool is
    * shared (probes are latency-critical; constructing a pool per probe
    * is avoidable work) and its threads are daemons, so an in-flight
    * check can never hold the JVM open. */
  private val ExistsParallelism = 8

  private lazy val existsPool = {
    val counter = new java.util.concurrent.atomic.AtomicInteger
    java.util.concurrent.Executors.newFixedThreadPool(ExistsParallelism,
      (r: Runnable) => {
        val t = new Thread(r, s"stored-index-exists-${counter.incrementAndGet()}")
        t.setDaemon(true)
        t
      })
  }

  /** Read only the `partCol=v` directories of `base` for the probed
    * `values` (deduplicated — a repeated value must not scan its
    * directory twice), as a DataFrame with `dataSchema` (which INCLUDES
    * the partition column). Probed-but-unwritten buckets drop silently
    * (an empty bucket is a normal serving outcome); a missing store
    * root or a `partCol` that matches NO directory of a non-empty store
    * throws — those are caller errors that the old whole-store read
    * also surfaced, and an empty frame would disguise them as "no
    * candidates". No listing/existence result is cached: `base` may be
    * a caller-managed store rewritten in place (the content-keyed temp
    * dirs of `cachedStore` are immutable, but the probe API cannot
    * assume its input is one of them). */
  def readProbed(s: SparkSession, base: String, partCol: String,
      values: Seq[Any], dataSchema: StructType): DataFrame = {
    val probed = values.distinct
    probed.foreach(requireIntegral)
    val hconf = s.sessionState.newHadoopConf()
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(hconf)
    if (!fs.exists(basePath))
      throw new IllegalArgumentException(
        s"stored-index root does not exist: $base (probe before write?)")
    // a query routed to no buckets reads nothing — and must not pay the
    // listing below (nothing to sanity-check either: no probed value
    // could have matched any layout)
    if (probed.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[Row], dataSchema)
    // one store listing answers every existence question at once past
    // the threshold; below it, per-value point checks (bounded-parallel:
    // each is an independent metadata round trip, so up to
    // ExistsParallelism run in flight) — and the listing, when taken, is
    // REUSED for the layout sanity check so the empty outcome never pays
    // a second one
    val listed: Option[Array[org.apache.hadoop.fs.FileStatus]] =
      if (probed.size > ListingThreshold) Some(fs.listStatus(basePath))
      else None
    val existing: Seq[String] = listed match {
      case Some(statuses) =>
        val dirs = statuses.filter(_.isDirectory).map(_.getPath.getName).toSet
        probed.map(v => s"$partCol=$v").filter(dirs)
          .map(n => new org.apache.hadoop.fs.Path(basePath, n).toString)
      case None =>
        val paths = probed.map(v =>
          new org.apache.hadoop.fs.Path(basePath, s"$partCol=$v"))
        if (paths.size <= 1) paths.filter(fs.exists).map(_.toString)
        else {
          val checks = paths.map(p =>
            p -> existsPool.submit(new java.util.concurrent.Callable[Boolean] {
              def call(): Boolean = fs.exists(p)
            }))
          try checks.collect { case (p, hit) if hit.get() => p.toString }
          catch {
            // a failing metadata call must surface as itself (the
            // IOException the serial path threw), not wrapped in the
            // pool's ExecutionException — and the remaining checks are
            // cancelled rather than left hammering a store that is
            // already erroring
            case e: java.util.concurrent.ExecutionException =>
              checks.foreach(_._2.cancel(true))
              throw e.getCause
          }
        }
    }
    if (existing.isEmpty) {
      // all probed buckets missing: legitimate only if the store's
      // layout is at least KEYED on partCol — a wrong column name can
      // never match, and a store whose data files sit at the root (an
      // unpartitioned write) has no bucket directories to match either;
      // both are caller errors the old whole-store read surfaced as an
      // AnalysisException and must not masquerade as an empty result.
      // Hidden entries (_SUCCESS, .crc) don't make a root "unpartitioned"
      // — a partitioned write of an empty frame leaves only those.
      // Narrow probes pay the one listing only on this failure path.
      val statuses = listed.getOrElse(fs.listStatus(basePath))
      val dirs = statuses.filter(_.isDirectory).map(_.getPath.getName)
      val dataFiles = statuses.filter(st => !st.isDirectory &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      if (dataFiles.nonEmpty && !dirs.exists(_.startsWith(partCol + "=")))
        throw new IllegalArgumentException(
          s"store at $base is not partitioned at all (data files at the " +
            s"root, e.g. ${dataFiles.head.getPath.getName}); readProbed " +
            s"needs a store written with partitionBy('$partCol')")
      if (dirs.nonEmpty && !dirs.exists(_.startsWith(partCol + "=")))
        throw new IllegalArgumentException(
          s"store at $base is not partitioned by '$partCol' " +
            s"(found: ${dirs.take(3).mkString(", ")}…)")
      s.createDataFrame(s.sparkContext.emptyRDD[Row], dataSchema)
    } else
      s.read.schema(dataSchema).option("basePath", base).parquet(existing: _*)
  }
}
