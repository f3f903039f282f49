package graft.ops

import graft.functions.CosineSimilarity
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths, per the north star:
  *   - brute-force top-k: the correctness baseline. The (small) query set
  *     is broadcast against the candidate corpus, scored with the native
  *     [[CosineSimilarity]] expression, ranked per query with a window.
  *     Cost is |Q|·|C| scores but zero shuffle of the corpus — at 100 TB
  *     the corpus stays partition-local and only per-query top-k heaps
  *     (via the partial window aggregation) move.
  *   - LSH-bucketed: random-hyperplane signatures (sign of dot product
  *     with fixed seeded projections) → candidates share a signature
  *     bucket → exact re-score of candidates only. The scale path: the
  *     cross product never materializes.
  */
object Similarity {

  /** Brute-force cosine top-k for query vectors `vec_id < nQueries`. */
  def bruteForceTopK(s: SparkSession, d: String,
      nQueries: Int = 8, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = cands.join(broadcast(queries), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Sign-signature frame shared by the LSH paths: signature bit p =
    * sign(<embedding, plane_{p+planeOffset}>) via the native codegen'd
    * [[graft.functions.SignSignature]] expression (deterministic seeded
    * hyperplanes, weight tables cached per executor). One word holds at
    * most 64 planes — `1L << p` wraps mod 64, so wider signatures
    * compose from multiple words over DISJOINT plane families selected
    * by `planeOffset`, as the SemDeDup banding does. */
  /** The index dimensionality every LSH/SemDeDup path is configured for:
    * [[graft.functions.SignSignature]] nulls the signature of any row
    * with a different embedding length, so stragglers on a mixed-dim
    * corpus drop out of the buckets on BOTH engines (the oracle's literal
    * plane table is this wide) instead of silently staying on one side. */
  private[ops] val IndexDims = 64

  /** Layout contracts of the at-rest stores ([[writeLshPartitioned]] /
    * [[writeIvfPartitioned]] write exactly these columns; the partition
    * column is last) — stated once so the serving-path probes can read
    * the probed directories without schema inference. */
  private[ops] val LshStoreSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("sig", LongType)))
  }
  private[ops] val IvfStoreSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("cell", IntegerType)))
  }

  private[ops] def signedEmbeddings(emb: DataFrame, nPlanes: Int,
      planeOffset: Int = 0): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      graft.functions.SignSignature.of(col("embedding"), nPlanes, planeOffset,
        expectedDims = IndexDims).as("sig"))

  /** Same-bucket candidates exactly re-scored, per-query top-k. */
  private def bucketTopK(signed: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = signed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig"))
    val cands = signed
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("sig"))
    val scored = cands.join(broadcast(queries), Seq("sig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Random-hyperplane LSH bucketing + exact re-score: candidates for a
    * query are exactly the corpus rows with the same `nPlanes`-bit sign
    * signature. Returns per-query top-k within its bucket. */
  def lshTopK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nPlanes: Int = 8): DataFrame =
    bucketTopK(signedEmbeddings(Tables.embeddings(s, d), nPlanes), nQueries, k)

  /** LSH index at rest — the sign-signature twin of the IVF serving
    * layout: the signed corpus is written `partitionBy("sig")`, one
    * directory per signature bucket. The "centroid table" equivalent is
    * the hyperplane family itself, which needs no storage at all: the
    * planes are a pure function of (seed, plane index), so any process
    * regenerates them bit-identically. */
  def writeLshPartitioned(s: SparkSession, d: String, outDir: String,
      nPlanes: Int = 8): Unit =
    signedEmbeddings(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), nPlanes)
      // hash-cluster by the partition column before the partitioned write
      // (guide §6: distribution-mode hash): each bucket directory gets
      // ONE file per writing task that owns it instead of one per input
      // partition — serving probes then open O(1) files per bucket
      .repartition(col("sig"))
      .write.mode("overwrite").partitionBy("sig").parquet(s"$outDir/corpus")

  /** Probe the stored LSH index: query signatures are computed ON THE
    * DRIVER from the same deterministic plane weights the native
    * expression multiplies (same sequential fused multiply-add, so the
    * bits agree by construction), then only the probed signature
    * directories are read — partition pruning cuts the file listing to
    * the queries' buckets. Same serving contract as [[ivfProbeStored]]:
    * query cardinality ≪ corpus (vectors are collected to route them);
    * bulk query sets go through [[lshTopK]]. */
  def lshProbeStored(s: SparkSession, d: String, outDir: String,
      nQueries: Int = 8, k: Int = 5, nPlanes: Int = 8,
      maxDriverQueries: Int = 4096): DataFrame = {
    import s.implicits._
    require(nQueries <= maxDriverQueries,
      s"lshProbeStored routes queries on the driver (nQueries=$nQueries > " +
        s"max $maxDriverQueries); use lshTopK for bulk query sets")
    val planes = graft.functions.SignSignature.planeWeights(nPlanes, 0, IndexDims)
    val qVecs = Tables.embeddings(s, d)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
    val queryRows = qVecs.flatMap { case (qid, e) =>
      // the index width contract (signedEmbeddings pins expectedDims):
      // a mismatched-width query has a null signature — no bucket
      if (e.length != IndexDims) None
      else {
        var sig = 0L
        var p = 0
        while (p < nPlanes) {
          var dot = 0.0
          var h = 0
          while (h < IndexDims) { dot += e(h).toDouble * planes(p)(h); h += 1 }
          if (dot >= 0) sig |= 1L << p
          p += 1
        }
        // mirror the native expression's sentinel remap (a real 64-plane
        // signature equal to the null sentinel is flipped on plane 0) —
        // without it a driver-routed query at nPlanes=64 could probe a
        // signature directory the store never wrote
        if (sig == graft.functions.SignSignature.NullSentinel)
          sig = graft.functions.SignSignature.NullSentinel + 1
        Some((qid, e, sig))
      }
    }.toSeq
    val queries = queryRows.toDF("qid", "qe", "sig")
    val probedSigs = queryRows.map(_._3).distinct.sorted
    // serving-path read: only the probed signature directories are
    // enumerated (StoredIndex scaladoc — a full-store open pays an
    // O(all buckets) listing per probe); the isin stays as a partition
    // filter over the already-restricted paths, keeping the plan's
    // prune explicit (ScaleDesignSpec pins both halves)
    val cands = StoredIndex.readProbed(s, s"$outDir/corpus", "sig",
        probedSigs, LshStoreSchema)
      .filter(col("sig").isin(probedSigs.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("sig"))
    val scored = cands.join(broadcast(queries), Seq("sig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** LSH retrieval *guarantee* under the DuckDB oracle: an identical
    * vector has an identical sign signature, so a planted exact copy of
    * each query at `vec_id + offset` lands in the query's bucket and is
    * its top-1 (cosine 1.0 beats every other candidate — the corpus's
    * max pairwise cosine is ≈0.5). Expected output is SQL-expressible:
    * (q, q+offset, 1.0, 1) per query. */
  def lshDupRetrieval(s: SparkSession, d: String, nQueries: Int = 8,
      nPlanes: Int = 8, offset: Long = 100000L): DataFrame = {
    // one scan: planted copies are generated in-stream by explode-shifting
    // the ids (same rows as the two-scan union, half the passes)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        explode(array(lit(0L), lit(offset))).as("off"))
      .select((col("vec_id") + col("off")).as("vec_id"), col("embedding"))
    // the PRODUCTION signature/bucket/score pipeline, k = 1: shared code
    // guarantees the oracle exercises exactly what lshTopK runs
    bucketTopK(signedEmbeddings(emb, nPlanes), nQueries, k = 1)
  }

  /** Measured recall@k of the production LSH path ([[lshTopK]]) against
    * the exact baseline ([[bruteForceTopK]]): per query, how many of the
    * true top-k the bucketed search returned. The [[slicedTopKAgreement]]
    * pattern — both rankings are deterministic, so the oracle recomputes
    * both sides and the overlap is a hash-checkable number, turning the
    * ANN quality claim from "spec'd once" into "measured every run".
    * (The oracle reproduces the signatures from the same hyperplane
    * doubles via [[graft.functions.SignSignature.planeWeights]].) */
  def lshRecallAtK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nPlanes: Int = 8): DataFrame =
    recallOverlap(bruteForceTopK(s, d, nQueries, k), lshTopK(s, d, nQueries, k, nPlanes))

  /** |exact ∩ ann| per query — the one definition both recall rows (and
    * their oracles) share: left join on (qid, cid), count matches. */
  private def recallOverlap(exact: DataFrame, ann: DataFrame): DataFrame = {
    val e = exact.select(col("qid"), col("cid"))
    val a = ann.select(col("qid").as("aqid"), col("cid").as("acid"))
    e.join(a, col("qid") === col("aqid") && col("cid") === col("acid"), "left")
      .groupBy(col("qid"))
      .agg(count(col("acid")).as("n_common"))
      .orderBy(col("qid"))
  }

  /** Matryoshka-style truncated retrieval: score on only the first
    * `dims` dimensions (MRL-trained embeddings concentrate signal in the
    * prefix, making the truncation the cheap first-pass ranker — 4× less
    * arithmetic and bytes here), then report per-query agreement with
    * the full-dimension top-k: `n_common` of the two top-k sets. The
    * evaluation harness one runs before trusting a truncation level.
    * Same shuffle shape as [[bruteForceTopK]] (broadcast queries, corpus
    * partition-local) — the slice happens inside the scan projection, so
    * only `dims` floats per row are ever scored. */
  def slicedTopKAgreement(s: SparkSession, d: String, dims: Int = 16,
      nQueries: Int = 8, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val cands = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    // ONE pair enumeration scores both variants (the slice is a cheap
    // in-expression projection of the already-loaded vector), and both
    // ranks come from windows over the SAME qid partitioning — a single
    // Exchange, not two join branches re-running the corpus scan.
    val w = Window.partitionBy(col("qid"))
    val scored = cands.join(broadcast(queries), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim_full"),
        round(CosineSimilarity(slice(col("qe"), 1, dims),
          slice(col("ce"), 1, dims)), 4).as("sim_sliced"))
      .withColumn("rn_full",
        row_number().over(w.orderBy(col("sim_full").desc, col("cid"))))
      .withColumn("rn_sliced",
        row_number().over(w.orderBy(col("sim_sliced").desc, col("cid"))))
    scored.filter(col("rn_full") <= k)
      .groupBy(col("qid"))
      .agg(count(when(col("rn_sliced") <= k, 1)).as("n_common"))
      .orderBy(col("qid"))
  }

  /** Symmetric int8 quantization of the embedding column — the standard
    * 4× compression step before ANN indexing at scale (per-vector scale
    * = max|x|/127, q_i = round(x_i/scale)). Pure column algebra over the
    * array: codegen'd, no UDF, embarrassingly parallel; the oracle
    * checks per-vector scale, the quantized checksum, and the max
    * reconstruction error bound (≤ scale/2). */
  def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), dbl.as("x"))
      .withColumn("scale",
        array_max(transform(col("x"), v => abs(v))) / lit(127.0))
    val q = transform(col("x"), v =>
      when(col("scale") === 0.0, lit(0.0)).otherwise(round(v / col("scale"))))
    emb.withColumn("q", q)
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("q_scale"),
        aggregate(col("q"), lit(0.0), (acc, v) => acc + v).cast("long").as("q_sum"),
        round(aggregate(
          zip_with(col("x"), col("q"), (x, v) => abs(x - v * col("scale"))),
          lit(0.0), (acc, e) => greatest(acc, e)), 6).as("max_err"))
      .orderBy(col("vec_id"))
  }

  /** IVF (inverted-file) ANN — the other standard scale path beside LSH:
    * a k-means coarse quantizer partitions the corpus into `nCells`
    * cells; each query exactly re-scores only its `nProbe` nearest cells.
    * At 100 TB the cell assignment is one pass (broadcast centroids),
    * the corpus is written partitioned by cell, and a query touches
    * nProbe/nCells of the data — the centroid table itself is tiny and
    * lives on the driver. Deterministic via the k-means seed. */
  def ivfTopK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, maxTrainRows: Long = 100000L): DataFrame =
    ivfTopKOf(s, Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      trainedCentroids(s, d, nCells, maxTrainRows), nQueries, k, nProbe)

  /** IVF retrieval *guarantee* under the DuckDB oracle — the exact trick
    * [[lshDupRetrieval]] uses: an identical vector has distance 0 to the
    * query, so the planted copy of each query at `vec_id + offset` lands
    * in the query's own k-means cell (ties in cell assignment are
    * irrelevant: IDENTICAL vectors get the SAME assignment), the query's
    * own cell is always among its nProbe probes (self-distance 0 is the
    * minimum), and the copy is the query's top-1 at cosine 1.0 (the
    * corpus's max non-identical pairwise cosine is ≈0.5). Runs the
    * PRODUCTION cell-assign/probe/score pipeline with k = 1; expected
    * output is SQL-expressible: (q, q's min identical partner, 1.0, 1). */
  def ivfDupRetrieval(s: SparkSession, d: String, nQueries: Int = 8,
      nCells: Int = 16, nProbe: Int = 4, offset: Long = 100000L): DataFrame = {
    // one scan: planted copies are generated in-stream by explode-shifting
    // the ids (same rows as the two-scan union, half the passes)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        explode(array(lit(0L), lit(offset))).as("off"))
      .select((col("vec_id") + col("off")).as("vec_id"), col("embedding"))
    // quantizer trained on the doubled corpus (uncached — guarantee-twin
    // corpus, not the serving index); the guarantee argument is rule-free:
    // IDENTICAL vectors get the same assignment under ANY deterministic rule
    ivfTopKOf(s, emb, kmeansCentroids(emb, nCells, maxTrainRows = 100000L),
      nQueries, k = 1, nProbe)
  }

  /** Measured recall@k of an IVF-structured search under the DuckDB
    * oracle. The trained coarse quantizer ([[ivfTopK]]'s seeded k-means)
    * is not SQL-expressible, so ITS quality evidence is the planted-copy
    * guarantee plus the spec'd recall bound; this twin swaps in the one
    * coarse quantizer an oracle CAN replicate — centroids are the
    * `nCells` corpus vectors with the smallest `md5(vec_id || '/ivf')`
    * (a seeded sample, the untrained-quantizer IVF baseline) — and keeps
    * every other stage of the production shape: Voronoi cell assignment
    * (nearest centroid by rounded cosine, centroid-id tie-break),
    * nProbe-nearest-cells probing, exact re-score, per-query top-k,
    * overlap with [[bruteForceTopK]]. Every stage is deterministic and
    * SQL-expressible, so recall@k lands as a hash-checked oracle row.
    *
    * Scale shape: centroid selection is a distributed top-`nCells` (no
    * global sort); assignment is a broadcast cross join against the tiny
    * centroid table aggregated with map-side-combinable max(struct) —
    * one row per vec_id shuffles, embeddings never do. */
  def ivfRecallAtK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // deterministic seeded sample as centroids: top-nCells by md5 order
    // (TakeOrderedAndProject — distributed, no full sort), then COLLECTED
    // to a local relation: the centroid table is tiny and is referenced
    // three times (assignment, probe map ×2) — as a plan subtree each
    // reference would re-run the corpus scan + top-N; as a local relation
    // the corpus pays that scan exactly once (the same centroids-on-the-
    // driver shape ivfTopKOf gets from model.clusterCenters)
    val picked: Array[(Int, Array[Float])] = emb
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit("/ivf"))))
      .orderBy(col("h")).limit(nCells)
      .select(col("h"), col("embedding")).as[(String, Array[Float])]
      .collect().sortBy(_._1).zipWithIndex
      .map { case ((_, e), i) => (i + 1, e) }
    val cent = picked.toSeq.toDF("cell", "cent_e")
    // Voronoi assignment via the shared rule (rounded cosine desc, lowest
    // cell on ties — [[voronoiAssign]]). localCheckpoint: queries and
    // candidates both read `assigned`; as a lazy subtree each side would
    // re-pay the corpus×centroid cross join (the repeated-scan trap the
    // PMI/BM25 operators already close).
    val assigned = voronoiAssign(emb, cent).localCheckpoint()
    // nProbe nearest cells per cell, from the tiny centroid self-join
    val c2 = cent.select(col("cell").as("probe_cell"),
      col("cent_e").as("probe_e"))
    val probes = cent.crossJoin(c2)
      .select(col("cell").as("query_cell"), col("probe_cell"),
        round(CosineSimilarity(col("cent_e"), col("probe_e")), 4).as("psim"))
      .withColumn("pr", row_number().over(Window.partitionBy(col("query_cell"))
        .orderBy(col("psim").desc, col("probe_cell"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_cell"), col("probe_cell"))
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("cell").as("query_cell"))
      .join(broadcast(probes), "query_cell")
    val cands = assigned.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), col("cell").as("probe_cell"))
    // each candidate has one cell and probe pairs are unique → (qid, cid)
    // appears at most once, no dedup needed (same argument as ivfTopKOf)
    val ann = cands.join(broadcast(queries), Seq("probe_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("cid"))))
      .filter(col("rn") <= k)
    recallOverlap(bruteForceTopK(s, d, nQueries, k), ann)
  }

  /** Seeded k-means training over any `(vec_id, embedding)` frame,
    * returning just the centroid table — the tiny index metadata that
    * lives on the driver / beside the data. Cell ASSIGNMENT is kept out
    * of MLlib on purpose: `model.transform` routes through `findClosest`
    * (norm-bound-pruned `fastSquaredDistance`), whose ulp-level shortcuts
    * no SQL oracle can replay — so every consumer assigns with the one
    * explicitly-defined rule [[voronoiAssign]] instead, and the trained
    * centroids become plain literals both engines score identically. */
  private[ops] def kmeansCentroids(embIn: DataFrame, nCells: Int,
      maxTrainRows: Long): Array[Array[Double]] = {
    val emb = embIn.withColumn("features", array_to_vector(col("embedding")))
    // The coarse quantizer trains on a bounded sample: centroids don't
    // need the full corpus, and a full-corpus fit is 10 passes over
    // 100 TB. Seeded sample → deterministic centroids; below the cap the
    // sample IS the corpus, so small-scale results are unchanged. The
    // size probe is `limit(cap+1).count()` — it early-exits after cap+1
    // rows instead of scanning the whole corpus like a bare count().
    // Caps beyond Int.MaxValue can't be probed via limit — take the
    // sampling branch (its fraction clamps to 1.0 on small corpora, so
    // nothing is lost; silently treating the corpus as small would
    // disable the cap entirely).
    val smallCorpus = maxTrainRows < Int.MaxValue &&
      emb.limit((maxTrainRows + 1).toInt).count() <= maxTrainRows
    val train =
      if (smallCorpus) emb
      else {
        // The branch exists BECAUSE the corpus is huge, so it must never
        // pay a full pass just to size the sample. Row count comes from
        // plan statistics (parquet footers / CBO), which cost no job; when
        // the optimizer only knows sizeInBytes, rows are estimated with
        // the schema's defaultSize as the bytes-per-row divisor. That
        // divisor undercounts real rows (arrays are costed at one
        // element), so the row estimate errs HIGH and the fraction errs
        // LOW. Neither direction can break the trainer:
        //   - overshoot is bounded by the trailing hard limit;
        //   - undershoot is bounded by the fraction FLOOR: the limit
        //     probe above proved the corpus exceeds maxTrainRows, so a
        //     fraction of at least floorRows/maxTrainRows yields an
        //     expected sample of at least floorRows (~50 points per
        //     centroid) no matter how wrong the byte-based estimate is.
        val stats = emb.queryExecution.optimizedPlan.stats
        val rowEst = stats.rowCount.map(_.toDouble).getOrElse {
          val bytesPerRow =
            math.max(1, emb.schema.map(_.dataType.defaultSize).sum)
          stats.sizeInBytes.toDouble / bytesPerRow
        }
        val floorRows = 50.0 * nCells
        // 1.3× headroom: Bernoulli sampling undershoots the expectation
        val frac = math.min(1.0,
          math.max(maxTrainRows * 1.3 / math.max(rowEst, 1.0),
            floorRows / maxTrainRows))
        emb.sample(withReplacement = false, frac, seed = 42L)
          .limit(math.min(maxTrainRows, Int.MaxValue.toLong - 1).toInt)
      }
    val kmeans = new KMeans().setK(nCells).setSeed(42L).setMaxIter(10)
    kmeans.fit(train).clusterCenters.map(_.toArray)
  }

  /** Trained-centroid cache keyed by (data dir, content fingerprint,
    * params): the oracle-SQL builder and the query path must see
    * BITWISE-identical centroids in one JVM (train once, serialize the
    * same doubles into the literals the production assignment scores
    * against). The fingerprint (part lengths + mtimes — the
    * StreamDrive.stagedCache rule) keys out in-place rewrites: a corpus
    * regenerated at the same path must retrain, not silently serve
    * centroids of the old data. */
  private val centroidCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, String, Int, Long), Array[Array[Double]]]

  private[ops] def trainedCentroids(s: SparkSession, d: String,
      nCells: Int, maxTrainRows: Long): Array[Array[Double]] =
    centroidCache.getOrElseUpdate(
      (d, graft.Scaffold.fingerprint(s"$d/embeddings.parquet"),
        nCells, maxTrainRows),
      kmeansCentroids(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        nCells, maxTrainRows))

  /** Centroids as a tiny (cell, cent_e) frame, 0-based cell ids. */
  private def centroidFrame(s: SparkSession,
      centroids: Array[Array[Double]]): DataFrame =
    s.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cell", "cent_e")

  /** Voronoi cell assignment with the ONE rule every IVF path (in-memory,
    * at-rest write, stored-probe routing, DuckDB oracle) shares: nearest
    * centroid by rounded cosine, lowest cell id on ties. The centroid
    * table is broadcast; max(struct) is partially aggregable, so only
    * (vec_id, winner) rows shuffle — embeddings never do.
    *
    * Unscorable rows — null/zero-norm embeddings or a width different
    * from the centroids' (cosine null for every centroid) — are OUTSIDE
    * the indexed domain and dropped here, on every path alike: without
    * the filter they would fall through max(struct)'s null ordering into
    * an arbitrary cell on the distributed side while the driver-routed
    * probe (which cannot score them either) drops them, silently
    * breaking stored-vs-in-memory twin parity on mixed corpora. */
  private[ops] def voronoiAssign(emb: DataFrame, cent: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"),
        round(CosineSimilarity(col("embedding"), col("cent_e")), 4).as("csim"),
        col("cell"))
      .filter(col("csim").isNotNull)
      .groupBy(col("vec_id"))
      .agg(first(col("embedding")).as("embedding"),
        max(struct(col("csim"), (-col("cell")).as("neg_id"))).as("w"))
      .select(col("vec_id"), col("embedding"), (-col("w.neg_id")).as("cell"))

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Driver-side mirror of `round(CosineSimilarity(a, b), 4)`: the same
    * sequential double accumulation as [[CosineSimilarity.compute]] and
    * the same `BigDecimal.valueOf`/HALF_UP rounding Spark's `round`
    * compiles to — so driver-routed queries land in exactly the cell the
    * distributed assignment would pick. */
  private def roundedCosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    java.math.BigDecimal.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
  }

  /** nProbe nearest cells per cell, from the (tiny) centroid set —
    * computed on the driver, the same place the centroids live. */
  private[ops] def probeMapOf(centroids: Array[Array[Double]],
      nProbe: Int): Map[Int, Seq[Int]] =
    centroids.indices.map { c =>
      c -> centroids.indices.sortBy(o => dist2(centroids(c), centroids(o)))
        .take(nProbe).toSeq
    }.toMap

  /** Exact re-score of probed candidates, per-query top-k: queries carry
    * `(qid, qe, probe_cell)` (one row per probed cell), candidates
    * `(cid, ce, probe_cell)` (one row per corpus vector — its own cell).
    * Each candidate has exactly one cell and probe pairs are unique, so
    * (qid, cid) appears at most once — no dedup needed. */
  private def probedTopK(queries: DataFrame, cands: DataFrame,
      k: Int): DataFrame = {
    val scored = cands.join(broadcast(queries), Seq("probe_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** The production IVF pipeline over any `(vec_id, embedding)` frame —
    * shared by [[ivfTopK]] and the [[ivfDupRetrieval]] guarantee oracle so
    * the oracle exercises exactly what production runs. `assigned` is
    * localCheckpointed for the same reason [[ivfRecallAtK]]'s is: queries
    * and candidates both read it, and as a lazy subtree each side would
    * re-pay the corpus×centroid assignment. */
  private def ivfTopKOf(s: SparkSession, embIn: DataFrame,
      centroids: Array[Array[Double]], nQueries: Int, k: Int,
      nProbe: Int): DataFrame = {
    val assigned =
      voronoiAssign(embIn, centroidFrame(s, centroids)).localCheckpoint()
    val probeMap = probeMapOf(centroids, nProbe)
    val probes = s.createDataFrame(
      probeMap.toSeq.flatMap { case (c, ps) => ps.map(p => (c, p)) })
      .toDF("query_cell", "probe_cell")
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("cell").as("query_cell"))
      .join(broadcast(probes), "query_cell")
    val cands = assigned
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("cell").as("probe_cell"))
    probedTopK(queries, cands, k)
  }

  /** The `x_sim_ivf` DuckDB oracle, built at dump time: the trained
    * k-means centroids (cached — the query path scores the SAME doubles)
    * and the driver-computed probe map are emitted as literals, and the
    * oracle replays assign → probe → rescore with the exact arithmetic
    * the production plan uses (`round(list_cosine_similarity, 4)` is
    * bitwise-aligned with the native [[CosineSimilarity]] — the invariant
    * every green ANN oracle already rests on). The technique is the
    * hyperplanes-as-literals trick that converted `x_sim_lsh`: any
    * deterministic seeded driver-resident structure is SQL once
    * serialized. */
  def ivfOracleSql(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, maxTrainRows: Long = 100000L): String = {
    val centroids = trainedCentroids(s, d, nCells, maxTrainRows)
    val probeMap = probeMapOf(centroids, nProbe)
    val centVals = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.mkString("[", ", ", "]")}::DOUBLE[])"
    }.mkString(", ")
    val probeVals = probeMap.toSeq.sortBy(_._1).flatMap { case (c, ps) =>
      ps.map(p => s"($c, $p)")
    }.mkString(", ")
    val dims = centroids.headOption.map(_.length).getOrElse(0)
    s"""WITH cent AS (SELECT * FROM (VALUES $centVals) AS t(cell, ce)),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
       |      WHERE embedding IS NOT NULL AND len(embedding) = $dims
       |        AND list_aggregate(list_transform(embedding::DOUBLE[],
       |              v -> abs(v)), 'max') > 0),
       |assigned AS (SELECT vec_id, x, cell FROM (
       |  SELECT e.vec_id, e.x, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.x, c.ce), 4) DESC, c.cell) AS rn
       |  FROM e CROSS JOIN cent c) WHERE rn = 1),
       |probes AS (SELECT * FROM (VALUES $probeVals) AS p(query_cell, probe_cell)),
       |qp AS (SELECT vec_id AS qid, x AS qe, probe_cell
       |       FROM assigned JOIN probes ON assigned.cell = probes.query_cell
       |       WHERE vec_id < $nQueries),
       |ann AS (
       |  SELECT qp.qid, a.vec_id AS cid,
       |    round(list_cosine_similarity(qp.qe, a.x), 4) AS sim,
       |    row_number() OVER (PARTITION BY qp.qid
       |      ORDER BY round(list_cosine_similarity(qp.qe, a.x), 4) DESC, a.vec_id) AS rn
       |  FROM assigned a JOIN qp ON a.cell = qp.probe_cell
       |  WHERE qp.qid <> a.vec_id)
       |SELECT qid, cid, sim, CAST(rn AS INT) AS rn FROM ann
       |WHERE rn <= $k ORDER BY qid, rn""".stripMargin
  }

  /** IVF at rest — the serving layout at 100 TB: the cell-assigned corpus
    * is written `partitionBy("cell")`, one directory per k-means cell, and
    * the centroid table lands beside it (it IS the index metadata: tiny,
    * driver-resident). A probe against the stored index then reads ONLY
    * its probed cell directories — partition pruning cuts the file listing
    * before any I/O happens, so a query touches ~nProbe/nCells of the
    * bytes at rest instead of filtering after a full scan. */
  def writeIvfPartitioned(s: SparkSession, d: String, outDir: String,
      nCells: Int = 16, maxTrainRows: Long = 100000L): Unit = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = trainedCentroids(s, d, nCells, maxTrainRows)
    val assigned = voronoiAssign(emb, centroidFrame(s, centroids))
    // hash-cluster by cell before the partitioned write (see
    // writeLshPartitioned): one file per cell directory
    assigned.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$outDir/corpus")
    s.createDataFrame(centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/centroids")
  }

  /** Per-JVM at-rest index cache for the *_stored correctness queries:
    * one write per (source dir, content fingerprint), probes re-run per
    * invocation — so the driver's hash gate exercises the full
    * write→prune→probe path without paying the write per bench pass.
    * Keyed like [[centroidCache]]: an in-place corpus rewrite re-writes
    * the index. */
  private val storeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), String]

  private[ops] def cachedStore(kind: String, d: String, src: String)(
      write: String => Unit): String =
    storeCache.getOrElseUpdate((kind, d, graft.Scaffold.fingerprint(src)), {
      // registered for exit cleanup BEFORE the cache insert: TrieMap may
      // evaluate racing thunks more than once, and a losing thread's dir
      // must still be removed (Scaffold tracks dirs, not cache winners)
      val dir = graft.Scaffold.cleanupOnExit(java.nio.file.Files
        .createTempDirectory(s"graft-$kind-store").toString)
      write(dir)
      dir
    })

  /** The at-rest IVF pipeline as ONE driver-checkable query: write the
    * cell-partitioned index (cached per JVM), then probe it. Output is
    * identical to [[ivfTopK]] by the shared-rule construction, so the
    * same hash-checked oracle pins the whole write→prune→probe path —
    * at-rest serving graduates from spec-pinned parity to a green
    * CORRECTNESS row of its own. */
  def ivfStoredQuery(s: SparkSession, d: String): DataFrame = {
    val out = cachedStore("ivf", d, s"$d/embeddings.parquet")(
      writeIvfPartitioned(s, d, _))
    ivfProbeStored(s, d, out)
  }

  /** [[ivfStoredQuery]]'s twin for the LSH layout: same signature, same
    * buckets, same oracle as [[lshTopK]]. */
  def lshStoredQuery(s: SparkSession, d: String): DataFrame = {
    val out = cachedStore("lsh", d, s"$d/embeddings.parquet")(
      writeLshPartitioned(s, d, _))
    lshProbeStored(s, d, out)
  }

  /** Query the stored IVF index: quantize the query vectors against the
    * stored centroids ON THE DRIVER (the serving-path shape — no job runs
    * to route a query), then exact-re-score only the probed cell
    * directories. Query vectors come from the source embeddings table
    * (`vec_id < nQueries`, a pushed-down point read); the STORED corpus
    * is touched exclusively through the pruned partition filter.
    *
    * Serving contract: this path `collect()`s the query vectors, so it is
    * for query-set cardinality ≪ corpus — point lookups routed without a
    * Spark job. Bulk query sets (a corpus self-join, an eval sweep) go
    * through [[ivfTopK]], which keeps queries distributed; the
    * `maxDriverQueries` guard makes the boundary explicit instead of
    * letting a caller discover it as a driver OOM. */
  def ivfProbeStored(s: SparkSession, d: String, outDir: String,
      nQueries: Int = 8, k: Int = 5, nProbe: Int = 4,
      maxDriverQueries: Int = 4096): DataFrame = {
    import s.implicits._
    require(nQueries <= maxDriverQueries,
      s"ivfProbeStored routes queries on the driver (nQueries=$nQueries > " +
        s"max $maxDriverQueries); use ivfTopK for bulk query sets")
    val centroids: Array[Array[Double]] =
      s.read.parquet(s"$outDir/centroids")
        .select(col("cell"), col("centroid")).as[(Int, Seq[Double])]
        .collect().sortBy(_._1).map(_._2.toArray)
    val probeMap = probeMapOf(centroids, nProbe)
    val qVecs = Tables.embeddings(s, d)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
    // driver-side quantization with the SAME rule the stored corpus was
    // assigned under (voronoiAssign: rounded cosine desc, lowest cell on
    // ties) — one shared rule, so stored-vs-in-memory parity holds by
    // construction, not by luck on near-equidistant queries. A query the
    // distributed rule cannot score (width mismatch vs the index's
    // centroids, zero norm → null cosine) is unroutable and dropped,
    // mirroring how such rows fall out of every signature path — not an
    // ArrayIndexOutOfBounds / NaN crash on the driver.
    val dims = centroids.headOption.map(_.length).getOrElse(0)
    val queryRows = qVecs.flatMap { case (qid, e) =>
      if (e.length != dims) Nil
      else {
        val ed = e.map(_.toDouble)
        if (ed.forall(_ == 0.0)) Nil
        else {
          val cell = centroids.indices
            .maxBy(c => (roundedCosine(ed, centroids(c)), -c))
          probeMap(cell).map(p => (qid, e, p))
        }
      }
    }.toSeq
    val queries = queryRows.toDF("qid", "qe", "probe_cell")
    val probedCells = queryRows.map(_._3).distinct.sorted
    // serving-path read of only the probed cell directories (StoredIndex
    // scaladoc); the isin stays as the plan's explicit partition filter
    val cands = StoredIndex.readProbed(s, s"$outDir/corpus", "cell",
        probedCells, IvfStoreSchema)
      .filter(col("cell").isin(probedCells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        col("cell").as("probe_cell"))
    probedTopK(queries, cands, k)
  }
}
