package graft

import graft.ops.{Similarity, Tables}
import graft.sources.QuadStore
import graft.streaming.SessionStateOps
import org.apache.spark.sql.functions._

/** Scale-path operators: IVF ANN, custom-state sessionization, bucketed
  * co-located joins. Each approximate/layout variant is asserted against
  * its exact counterpart or its plan shape, not fixed numbers. */
class ScaleDesignSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  /** Partition count + filter presence of the (sole) pruned scan over the
    * stored corpus/postings directory in `df`'s plan. */
  private def prunedScan(df: org.apache.spark.sql.DataFrame,
      dirToken: String): (Int, Boolean) = {
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains(dirToken)) => f
    }
    assert(scans.nonEmpty, s"no file scan over $dirToken found")
    (scans.head.selectedPartitions.partitionCount,
      scans.head.partitionFilters.nonEmpty)
  }

  test("stored-probe parity sweep: LSH and IVF stay pruned and exact at 512-1024 queries") {
    // The serving contract is verified at nQueries=8 by the *_stored
    // correctness rows; this sweep drives the driver-routing path toward
    // maxDriverQueries (512 at sf0.01 = the whole 500-vector table; 1024
    // genuine queries at sf0.1) and asserts BOTH halves of the contract
    // hold as the probed-bucket set grows toward all buckets:
    //   1. exact row parity with the distributed in-memory twin;
    //   2. the stored-corpus scan still prunes BY PARTITION FILTER — the
    //      isin list growing with the query set must never degenerate the
    //      read into an unfiltered full scan, and the partitions read
    //      never exceed the buckets the queries actually probe.
    for ((dir, nq) <- Seq((sf, 512), ("/root/testdata/sf0.1", 1024))) {
      val lshOut = graft.Scaffold.cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft-lshsweep").toString)
      Similarity.writeLshPartitioned(spark, dir, lshOut)
      val lshProbe = Similarity.lshProbeStored(spark, dir, lshOut, nQueries = nq)
      // expected probed set, derived independently of the probe's own
      // routing: queries are vec_id < nq rows of the SAME table the store
      // holds, so the store's own sig column gives their bucket set
      val expectedSigs = spark.read.parquet(s"$lshOut/corpus")
        .filter(col("vec_id") < nq).select("sig").distinct().count()
      val (lshParts, lshFiltered) = prunedScan(lshProbe, "corpus")
      assert(lshFiltered, "LSH stored scan lost its partition filter")
      assert(lshParts <= expectedSigs,
        s"LSH probe read $lshParts partitions for $expectedSigs probed sigs")
      val lshMem = Similarity.lshTopK(spark, dir, nQueries = nq)
        .collect().map(_.toSeq).toSeq
      assert(lshProbe.collect().map(_.toSeq).toSeq == lshMem,
        s"LSH stored/in-memory diverge at nQueries=$nq")

      val ivfOut = graft.Scaffold.cleanupOnExit(
        java.nio.file.Files.createTempDirectory("graft-ivfsweep").toString)
      Similarity.writeIvfPartitioned(spark, dir, ivfOut)
      val ivfProbe = Similarity.ivfProbeStored(spark, dir, ivfOut, nQueries = nq)
      val nCells = new java.io.File(s"$ivfOut/corpus").listFiles()
        .count(_.getName.startsWith("cell="))
      val (ivfParts, ivfFiltered) = prunedScan(ivfProbe, "corpus")
      assert(ivfFiltered, "IVF stored scan lost its partition filter")
      assert(ivfParts <= nCells,
        s"IVF probe read $ivfParts partitions of $nCells stored cells")
      val ivfMem = Similarity.ivfTopK(spark, dir, nQueries = nq)
        .collect().map(_.toSeq).toSeq
      assert(ivfProbe.collect().map(_.toSeq).toSeq == ivfMem,
        s"IVF stored/in-memory diverge at nQueries=$nq")
    }
  }

  test("IVF top-k: k results per query; strong overlap with exact top-k") {
    val exact = Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, sf, nQueries = 8, k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    assert(ivf.size == 40, s"expected 8×5 results, got ${ivf.size}")
    // nProbe=4 of 16 cells scans ~25% of the corpus; random 64-dim data
    // still concentrates near neighbours in nearby cells — require
    // meaningful (not total) recall, stable because kmeans is seeded.
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall vs exact")
  }

  test("ngramJaccard carries no forced broadcast on the per-document sizes table") {
    // The sizes table is O(#documents): a broadcast HINT would override
    // autoBroadcastJoinThreshold and OOM the driver at 100 TB. AQE may
    // still CHOOSE a broadcast at small scale — what must be absent is
    // the hint (ResolvedHint in the analyzed plan).
    val plan = graft.ops.Dedup.ngramJaccard(spark, sf)
      .queryExecution.analyzed.toString
    assert(!plan.contains("ResolvedHint"), s"forced broadcast in:\n$plan")
  }

  test("IVF quantizer trains on a bounded sample above the row cap") {
    // below the cap: identical results (the sample IS the corpus) is
    // covered by the recall test; here assert the cap path still yields
    // k results per query and meaningful recall.
    val capped = Similarity.ivfTopK(spark, sf, nQueries = 8, k = 5,
      maxTrainRows = 100L)
    assert(capped.count() == 40)
  }

  test("lshTopK evaluates the full-corpus signature expression only once") {
    // queries and candidates both derive from the same `signed` frame.
    // The expensive signature projection necessarily appears in both
    // physical branches — what must NOT happen is both branches paying
    // it over the full corpus. The guard: the queries (broadcast) side's
    // `vec_id < 8` filter must be pushed BELOW the projection into the
    // parquet scan, so that branch computes signatures for ≤ nQueries
    // rows; if a regression hoisted the filter above the signature
    // projection, the pushed filter would disappear from the scan.
    val plan = Similarity.lshTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(vec_id,8)"),
      s"queries-side vec_id filter not pushed to the scan:\n$plan")
  }

  test("as-of join plan is pure union+window — zero join operators") {
    // the whole point of the union+window formulation: the textbook
    // inequality join (the oracle's plan) degenerates to a per-key
    // cartesian; the production plan must contain NO join at all
    val plan = graft.ops.TemporalJoin.purchaseAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of plan grew a join:\n$plan")
    assert(plan.contains("Window"), s"as-of plan lost its window:\n$plan")
  }

  test("range join plan is an equi-join on (key, bucket) — never nested-loop/cartesian") {
    val plan = graft.ops.TemporalJoin.purchaseViewWindow(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a non-equi join:\n$plan")
  }

  test("heavy-hitters sketch aggregates partially map-side (only sketches shuffle)") {
    val plan = graft.ops.Sketches.heavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_misra_gries"),
      s"no map-side partial sketch aggregation in:\n$plan")
  }

  test("custom-state sessionization agrees with the window-based operator") {
    val raw = Tables.events(spark, sf)
    val evs = raw
      .select(col("user_id"), Tables.eventMicros(raw).as("us"))
      .as[SessionStateOps.Ev]
    val viaState = SessionStateOps.sessionize(spark, evs, isStreaming = false)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val viaWindow = graft.ops.Sessionize.sessions(spark, sf)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaState == viaWindow)
  }

  test("salted aggregation matches plain groupBy counts (skew path)") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type").as[(String, Long)].collect().toSeq
    val salted = graft.ops.Skew.saltedCount(ev, col("event_type"))
      .orderBy("key").as[(String, Long)].collect().toSeq
    assert(salted == plain)
    // the salted first stage really fans the hot key across buckets
    val firstStageGroups = ev.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)).cast("int"))
      .groupBy(col("event_type"), col("__salt")).count().count()
    assert(firstStageGroups > 5, s"expected >1 salt bucket per key, got $firstStageGroups")
  }

  test("measured ANN recall rows agree with a direct top-k intersection") {
    // the oracle checks both engines compute the same number; this pins
    // that the number IS |ann ∩ exact| per query (8 rows, each in [0, k])
    def overlap(ann: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val a = ann.select("qid", "cid").as[(Long, Long)].collect().toSet
      val e = Similarity.bruteForceTopK(spark, sf, nQueries = 8, k = 5)
        .select("qid", "cid").as[(Long, Long)].collect().toSet
      (0L until 8L).map(q => q -> e.filter(_._1 == q).count(a.contains).toLong).toMap
    }
    val lsh = Similarity.lshRecallAtK(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(lsh.keySet == (0L until 8L).toSet && lsh.values.forall(n => n >= 0 && n <= 5))
    assert(lsh == overlap(Similarity.lshTopK(spark, sf)), "lsh recall != direct overlap")
    val ivf = Similarity.ivfRecallAtK(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(ivf.keySet == (0L until 8L).toSet && ivf.values.forall(n => n >= 0 && n <= 5))
    // 4/16 probed cells ≈ 25% of the corpus; the sampled-quantizer IVF
    // still concentrates neighbours — require meaningful aggregate recall
    // (deterministic: md5-picked centroids, fixed data, seeded nothing)
    assert(ivf.values.sum >= 4, s"IVF recall collapsed: $ivf")
  }

  test("matryoshka slice agreement: full-dim slice agrees totally, counts bounded") {
    // dims = full width → the two top-k sets are identical by definition
    val self = Similarity.slicedTopKAgreement(spark, sf, dims = 64)
      .select("n_common").as[Long].collect()
    assert(self.length == 8 && self.forall(_ == 5), self.mkString(","))
    val sliced = Similarity.slicedTopKAgreement(spark, sf, dims = 16)
      .select("n_common").as[Long].collect()
    assert(sliced.length == 8 && sliced.forall(n => n >= 0 && n <= 5))
  }

  test("adaptive event-time projection keeps scan pruning and filter pushdown") {
    // the schema-adaptive micros projection (Tables.eventMicros) must
    // stay a scan-local column expression: hourlyWindows reads ONLY the
    // three columns it consumes, whatever encoding ts arrives in
    val plan = graft.ops.Sessionize.hourlyWindows(spark, sf)
      .queryExecution.executedPlan.toString
    val schemas = "ReadSchema: (struct<[^>]*>)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.nonEmpty, s"no parquet scan found:\n$plan")
    assert(schemas.forall(s =>
      !s.contains("props") && !s.contains("event_id") && !s.contains("user_id")),
      s"hourlyWindows reads columns it never consumes:\n$schemas")
    // and it must not push the projection below into a join/extra shuffle
    assert(!plan.contains("Join"), s"hourlyWindows grew a join:\n$plan")
    // typedEvents' event_type equality must still reach the parquet scan
    // as a pushed filter — the adaptive time projection sits ABOVE the
    // filter, so pushdown must be unaffected by the ts encoding
    val asof = graft.ops.TemporalJoin.purchaseAttribution(spark, sf)
      .queryExecution.executedPlan.toString
    assert(asof.contains("EqualTo(event_type,view)") &&
      asof.contains("EqualTo(event_type,purchase)"),
      s"event_type filters lost parquet pushdown:\n$asof")
  }

  test("lineitem/orders normalization keeps scan pruning and filter pushdown") {
    // the schema-adaptive contracts added for lineitem/orders (r13
    // VERDICT item 5) wrap every read in a normalization Project; at
    // 100 TB that Project must cost nothing on canonical data — filters
    // still reach the parquet scan and the scan reads only consumed
    // columns, or the q1 scan regresses to all 11 lineitem columns
    val q1 = graft.ops.Relational.q1Agg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"q1 shipdate filter lost parquet pushdown:\n$q1")
    // requiredSchema straight off the scan node — the rendered plan
    // truncates long metadata strings, so string-matching ReadSchema is
    // unreliable for wide tables
    val q1Scans = graft.ops.Relational.q1Agg(spark, sf)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(q1Scans.nonEmpty, "no parquet scan in the q1 plan")
    val q1Cols = q1Scans.flatMap(_.requiredSchema.fieldNames).toSet
    assert(Seq("l_orderkey", "l_partkey", "l_linenumber", "l_tax")
      .forall(!q1Cols.contains(_)),
      s"q1 reads lineitem columns it never consumes: $q1Cols")
    val s8 = graft.ops.Relational.firstLineOfOrder(spark, sf)
      .queryExecution.executedPlan.toString
    assert(s8.contains("EqualTo(l_orderkey,1)"),
      s"s8 point filter lost parquet pushdown:\n$s8")
    val s4 = graft.ops.Relational.pointLookup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(s4.contains("EqualTo(o_orderkey,1)"),
      s"s4 point filter lost parquet pushdown:\n$s4")
  }

  test("splitAssign scans doc_id only — a pure projection, no joins or aggregates") {
    val plan = graft.ops.CorpusPrep.splitAssign(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"split assignment must not read text/lang/source bytes:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"split assignment grew a join/aggregate:\n$plan")
  }

  test("pmiBigrams consumers read the checkpointed counts — zero corpus re-scans") {
    // the naive CTE formulation inlined the corpus subtree into all five
    // consumers (5 parquet scans in one plan); after the tagged-explode
    // rewrite the one corpus scan happens in the eager checkpoint job,
    // so the RESULT plan must contain no parquet scan at all
    val qe = graft.ops.CorpusPrep.pmiBigrams(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Scan parquet"),
      s"a consumer re-scans the corpus instead of the checkpoint:\n$plan")
    // only the two 1-row totals carry broadcast hints; the vocab joins
    // are left to AQE (vocabulary grows with the corpus)
    val hinted = qe.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size == 2 &&
      hinted.exists(_.toString.contains("n_uni")) &&
      hinted.exists(_.toString.contains("n_bi")),
      s"exactly the two 1-row totals must be hinted:\n$hinted")
  }

  test("bm25TopK joins are equi-joins off the checkpointed index; only totals hinted") {
    val qe = graft.ops.Retrieval.bm25TopK(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"bm25 fell back to a cartesian:\n$plan")
    // exactly ONE nested-loop join may appear: the broadcast cross join
    // of the 1-row (n_docs, avgdl) totals. A second one would mean a
    // data-sized join lost its equi keys.
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1,
      s"expected only the 1-row totals cross join as BNLJ:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"a consumer re-scans the corpus instead of the postings index:\n$plan")
    val hinted = qe.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size == 1 && hinted.head.toString.contains("avgdl"),
      s"exactly the 1-row (n_docs, avgdl) totals may carry a hint:\n$hinted")
  }

  test("tf-idf carries no forced broadcast on the vocabulary-sized df table") {
    // document frequencies are one row per distinct word — vocabulary
    // grows with corpus size, so only the 1-row corpus count may carry
    // a hint; the df join must be left to AQE.
    val analyzed = graft.ops.CorpusPrep.tfIdfTopTerms(spark, sf)
      .queryExecution.analyzed
    val hinted = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size == 1, s"expected exactly the 1-row count hint, got:\n$hinted")
    assert(hinted.head.toString.contains("n_docs"),
      "the only hint must be on the corpus-count side")
  }

  test("decontaminate scans documents with pruned columns and broadcasts only the eval side") {
    val qe = graft.ops.CorpusPrep.decontaminate(spark, sf).queryExecution
    // column pruning: the parquet scan must read only doc_id + text
    val scans = qe.executedPlan.toString
    assert(scans.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to (doc_id, text):\n$scans")
    // the broadcast hint sits on the eval (benchmark-suite) side, which
    // is bounded by construction — the train side must not be hinted
    val hinted = qe.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size == 1 && hinted.head.toString.contains("eval_id"),
      s"exactly the eval side must carry the broadcast hint:\n$hinted")
  }

  test("corpus-prep scans are pruned to exactly the referenced columns") {
    // a scan reading all 5 documents columns for a 2-column operator
    // would ship text+source+lang bytes it never uses — at 100 TB that
    // is the difference between a column-pruned scan and a full read
    def assertScan(df: org.apache.spark.sql.DataFrame, want: String): Unit = {
      val schemas = "ReadSchema: (struct<[^>]*>)".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq
      assert(schemas.nonEmpty && schemas.forall(_ == want),
        s"expected every scan to read $want, got $schemas")
    }
    assertScan(graft.ops.CorpusPrep.piiRedact(spark, sf),
      "struct<doc_id:bigint,text:string>")
    assertScan(graft.ops.CorpusPrep.lengthQuantiles(spark, sf),
      "struct<lang:string,n_chars:bigint>")
    assertScan(graft.ops.CorpusPrep.domainCap(spark, sf),
      "struct<doc_id:bigint,source:string>")
    assertScan(graft.ops.CorpusPrep.topNgrams(spark, sf),
      "struct<text:string>")
  }

  test("plan-shape sweep: no production query grows a cartesian/nested-loop join") {
    // regression guard over the WHOLE registered query surface: a future
    // edit that loses an equi-join key silently degenerates to an
    // all-pairs join — fine at sf0.01, fatal at 100 TB. Exemptions are
    // named and justified; everything else must carry zero
    // CartesianProduct and zero BroadcastNestedLoopJoin.
    val allPairsByDesign = Set(
      "x_dedup_semantic", "x_dedup_embed", "x_sim_topk", // labeled exact recall baselines
      "x_emb_slice",                     // truncation-evaluation harness (scores both variants all-pairs)
      "x_lsh_recall", "x_ivf_recall")    // recall rows embed the brute-force side by design
    val boundedBnlj = Set(
      "x_bm25_topk",      // ONE 1-row (n_docs, avgdl) totals cross join — pinned by its own test
      "x_bm25_stored",    // same 1-row totals cross join, served from the stored index
      "x_pmi_bigrams",    // 1-row unigram/bigram totals cross joins — pinned by its own test
      "x_tfidf_top",      // 1-row n_docs cross join — hint audit pinned by its own test
      "x_quality_lm",     // 1-row grand-total cross join (surprisal denominator)
      "x_mix_temperature") // 1-row n_min + 1-row corpus-totals cross joins
    val sfSmall = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (name, _) =>
        name.startsWith("x_stream_") ||  // drives run at construction; result is a memory-sink scan
        allPairsByDesign(name) || boundedBnlj(name)
      }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sfSmall).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
      }
    assert(offenders.isEmpty, s"all-pairs joins crept into:\n${offenders.mkString("\n")}")
  }

  test("IVF index at rest: stored probes prune to their cell directories and match in-memory") {
    val out = graft.Scaffold.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-ivf-store").toString)
    Similarity.writeIvfPartitioned(spark, sf, out)
    val probed = Similarity.ivfProbeStored(spark, sf, out)
    // the stored-corpus scan must be partition-pruned: only the probed
    // cell directories appear in the file index, not all 16
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "no file scan over the stored corpus found")
    val nParts = scans.head.selectedPartitions.partitionCount
    assert(nParts >= 1 && nParts < 16, s"expected a pruned cell subset, read $nParts/16")
    // same quantizer seed + shared probe/rescore code → the stored path
    // returns exactly the in-memory pipeline's rows
    val mem = Similarity.ivfTopK(spark, sf).collect().map(_.toSeq).toSeq
    val st = probed.collect().map(_.toSeq).toSeq
    assert(st == mem, s"stored-index results diverge from in-memory IVF")
  }

  test("LSH index at rest: stored probes prune to their signature directories and match in-memory") {
    val out = graft.Scaffold.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-lsh-store").toString)
    Similarity.writeLshPartitioned(spark, sf, out)
    val probed = Similarity.lshProbeStored(spark, sf, out)
    val nStored = new java.io.File(s"$out/corpus").listFiles()
      .count(_.getName.startsWith("sig="))
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("corpus")) => f
    }
    assert(scans.nonEmpty, "no file scan over the stored corpus found")
    val nParts = scans.head.selectedPartitions.partitionCount
    assert(nParts >= 1 && nParts < nStored,
      s"expected a pruned signature subset, read $nParts/$nStored")
    // driver-side signature = native expression signature (same planes,
    // same arithmetic) → the stored path returns exactly lshTopK's rows
    val mem = Similarity.lshTopK(spark, sf).collect().map(_.toSeq).toSeq
    val st = probed.collect().map(_.toSeq).toSeq
    assert(st == mem, "stored-index LSH results diverge from in-memory LSH")
  }

  test("BM25 index at rest: probe scans no documents, prunes term buckets, matches in-memory") {
    val out = graft.Scaffold.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-bm25-store").toString)
    graft.ops.Retrieval.writeBm25Index(spark, sf, out)
    val probed = graft.ops.Retrieval.bm25ProbeStored(spark, out)
    // the probe must never re-tokenize the corpus: every scan in its plan
    // reads the stored index, none the documents table (sparkPlan, not
    // executedPlan: AQE's adaptive wrapper hides the scans from collect)
    val scanned = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("Location", "")
    }
    assert(scanned.nonEmpty && scanned.forall(!_.contains("documents")),
      s"probe plan scans the corpus: $scanned")
    // identical arithmetic + stored df/dl/totals → exact row parity with
    // the rebuild-per-call path (which is itself oracle-green)
    val mem = graft.ops.Retrieval.bm25TopK(spark, sf).collect().map(_.toSeq).toSeq
    val st = probed.collect().map(_.toSeq).toSeq
    assert(st == mem, "stored-index BM25 diverges from in-memory BM25")
    // the serving shape: ONE query's terms cover a strict subset of the
    // 64 term buckets, and the partition filter prunes the rest
    val qid = spark.read.parquet(s"$out/qterms")
      .select(min(col("query_id"))).head().getLong(0)
    val one = graft.ops.Retrieval.bm25ProbeStored(spark, out,
      queryIds = Some(Seq(qid)))
    val scans = one.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("postings")) => f
    }
    assert(scans.nonEmpty, "no file scan over the stored postings found")
    val nParts = scans.head.selectedPartitions.partitionCount
    assert(nParts >= 1 && nParts < 64, s"expected pruned bucket subset, read $nParts/64")
    // and the single-query probe agrees with the full probe's slice
    val oneRows = one.collect().map(_.toSeq).toSeq
    assert(oneRows == mem.filter(_.head == qid), "pruned probe diverges")
  }

  test("decon index at rest: probe re-tokenizes only the training side, reads only postings columns") {
    // pins what x_decon_stored is ALLOWED to read, so a future bench
    // slowdown in the stored-probe family is attributable by
    // elimination: if these assertions hold, the plan did not regress
    // to re-reading corpus text on the eval side or shipping unneeded
    // index columns — leaving machine IO as the remaining cause.
    val out = graft.Scaffold.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-decon-store").toString)
    graft.ops.CorpusPrep.writeDeconIndex(spark, sf, out)
    val probed = graft.ops.CorpusPrep.deconProbeStored(spark, sf, out)
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        (f.metadata.getOrElse("Location", ""), f.requiredSchema.fieldNames.toSeq)
    }
    // exactly ONE corpus scan — the training side; the eval side must
    // come from the stored gram postings, never the documents table
    val docScans = scans.filter(_._1.contains("documents"))
    assert(docScans.size == 1,
      s"expected exactly one documents scan (the train side), got: $scans")
    assert(docScans.head._2.toSet == Set("doc_id", "text"),
      s"train-side scan not pruned to (doc_id, text): ${docScans.head._2}")
    // the index scan reads only the postings columns it joins on —
    // `bucket` is a partition column and must not appear as data
    val gramScans = scans.filter(_._1.contains("grams"))
    assert(gramScans.nonEmpty, s"no scan over the stored gram postings: $scans")
    assert(gramScans.forall(_._2.toSet == Set("eval_id", "gram")),
      s"postings scan reads beyond (eval_id, gram): $gramScans")
    // the broadcast hint must sit on the benchmark-sized index side
    // (deconJoin's contract) — never on the corpus-sized train side
    val hinted = probed.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hinted.size == 1 && hinted.head.toString.contains("eval_id"),
      s"exactly the stored eval side must carry the broadcast hint:\n$hinted")
    // and the probe output equals the in-memory twin (same grams, same
    // join) — the layout change cannot move rows
    val mem = graft.ops.CorpusPrep.decontaminate(spark, sf).collect().map(_.toSeq).toSeq
    assert(probed.collect().map(_.toSeq).toSeq == mem,
      "stored decon probe diverges from the in-memory twin")
  }

  test("incremental-dedup index at rest: probe reads only index fingerprints plus bounded text fetches") {
    // pins what x_dedup_incr_stored is ALLOWED to read (the r16-verdict
    // gap in the *_stored read-set pins): the batch probe must take
    // prior fingerprints from the at-rest index — never re-hash the
    // prior corpus — and may touch corpus text only for (a) the
    // synthesized new batch and (b) the post-candidate exact verify.
    // the query manages its own per-JVM cached index dir (cachedStore),
    // exactly as the bench runs it — probe that, not a side copy
    val probed = graft.ops.Dedup.incrDedupStoredQuery(spark, sf)
    val scans = probed.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        (f.metadata.getOrElse("Location", ""), f.requiredSchema.fieldNames.toSeq)
    }
    // the fingerprint side comes from the stored index, pruned to its
    // data columns (`bucket` is a partition column, never data)
    val fpScans = scans.filter(_._1.contains("/fp"))
    assert(fpScans.nonEmpty, s"no scan over the stored fp index: $scans")
    assert(fpScans.forall(_._2.toSet == Set("doc_id", "fp")),
      s"fp-index scan reads beyond (doc_id, fp): $fpScans")
    // exactly THREE documents scans, all BATCH-bounded or candidate-
    // bounded: the synthesized new batch twice (candidate generation +
    // its own text for the verify join) and the prior-corpus exact-
    // verify fetch once — a FOURTH would mean the probe re-derived
    // prior fingerprints from corpus text, the regression this test
    // exists to catch (the index would then be decorative)
    val docScans = scans.filter(_._1.contains("documents"))
    assert(docScans.size == 3,
      s"expected exactly three documents scans (2x new batch + verify), got: $scans")
    assert(docScans.forall(_._2.toSet == Set("doc_id", "text")),
      s"documents scans not pruned to (doc_id, text): $docScans")
    // and the stored probe equals the in-memory twin row-for-row
    val mem = graft.ops.Dedup.incrementalDedup(spark, sf).collect().map(_.toSeq).toSeq
    assert(probed.collect().map(_.toSeq).toSeq == mem,
      "stored incremental-dedup probe diverges from the in-memory twin")
  }

  test("bucketed quad tables join and pivot without an exchange") {
    val quads = graft.ops.QuadOps.geoQuads(spark, sf)
      .withColumn("graph", lit("g1"))
    QuadStore.writeBucketed(quads, "quads_bucketed", buckets = 4)
    val t = QuadStore.read(spark, "quads_bucketed")

    // star pivot: groupBy(subject) must reuse the bucket layout
    val pivotPlan = t.groupBy(col("subject"))
      .agg(max(when(col("predicate") === "urn:p:name", col("obj"))))
      .queryExecution.executedPlan.toString
    assert(!pivotPlan.contains("Exchange hashpartitioning"),
      s"bucketed pivot should not shuffle:\n$pivotPlan")

    // self-join on subject between co-bucketed reads: no exchange either
    val a = t.select(col("subject"), col("obj").as("o1"))
    val b = t.select(col("subject"), col("obj").as("o2"))
    val joinPlan = a.join(b, "subject").queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange hashpartitioning"),
      s"co-bucketed join should not shuffle:\n$joinPlan")

    assert(t.count() == quads.count())
    spark.sql("DROP TABLE IF EXISTS quads_bucketed")
  }
}
