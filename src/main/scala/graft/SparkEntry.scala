package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY §2 (key prefix = the
  * SURVEY operator ID); `oracleSql` holds the equivalent DuckDB SQL the
  * driver runs over the same parquet for the hash-match correctness gate.
  * Column names/types and row order are aligned on both sides.
  */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * full reference ETL — RDFa extraction → externalization → provenance →
    * validate/repair → verdict summary — over synthesized harvest pages. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.ExtractPipeline.pipelineSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> ((s, d) => Relational.q1Agg(s, d)),
    "s4_point_lookup"   -> ((s, d) => Relational.pointLookup(s, d)),
    "s8_first_file"     -> ((s, d) => Relational.firstLineOfOrder(s, d)),
    "s10_exists_probe"  -> ((s, d) => Relational.existsProbe(s, d)),
    "p1_delta_filter"   -> ((s, d) => Relational.deltaInsertFilter(s, d)),
    "p7_in_filter"      -> ((s, d) => Relational.inListFilter(s, d)),
    "j1_chain_join"     -> ((s, d) => Relational.chainJoin(s, d)),
    "j2_star_join"      -> ((s, d) => Relational.starJoin(s, d)),
    "j5_recovery_update" -> ((s, d) => Relational.recoveryUpdateSet(s, d)),
    "a1_count_distinct" -> ((s, d) => Relational.countDistinctPages(s, d)),
    "a4_rollup"         -> ((s, d) => Relational.rollupAgg(s, d)),
    "s11_anti_join"     -> ((s, d) => Relational.antiJoin(s, d)),
    "w1_topn_per_group" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "a2_size_stats"     -> ((s, d) => Relational.sizeStats(s, d)),
    "d1_distinct"       -> ((s, d) => Relational.distinctPriorities(s, d)),
    "o1_order_limit_offset" -> ((s, d) => Relational.orderLimitOffset(s, d)),
    "s9_file_url"       -> ((s, d) => QuadOps.fileUrlLookup(s, d)),
    "t_lifecycle_state" -> ((s, d) => QuadOps.taskLifecycleState(s, d)),
    "t_lifecycle_registry" -> ((s, d) => QuadOps.taskLifecycleRegistry(s, d)),
    "t_ntriples_roundtrip" -> ((s, d) => QuadOps.ntriplesRoundtrip(s, d)),
    "t_star_pivot"      -> ((s, d) => QuadOps.starPivot(s, d)),
    "t_chain_join"      -> ((s, d) => QuadOps.chainTraversal(s, d)),
    "p4_validate"       -> ((s, d) => QuadOps.validateCorpus(s, d)),
    "a3_verdict_counts" -> ((s, d) => QuadOps.verdictCounts(s, d)),
    "k9_partition_sizes" -> ((s, d) => QuadOps.partitionFileSizes(s, d)),
    // North-star extension operators (dedup / similarity / text / events /
    // multimodal). Every signature family is oracle-checked: the LSH/
    // SemDeDup hyperplane doubles, the trained IVF centroids, and the
    // minhash permutation constants are baked into the SQL as literals;
    // the simhash votes and winnow rolling hashes are regrown from
    // md5-hex / HUGEINT arithmetic — DuckDB reproduces every bit.
    "x_dedup_exact"     -> ((s, d) => Dedup.exact(s, d)),
    "x_dedup_jaccard"   -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "x_dedup_minhash"   -> ((s, d) => Dedup.minhashLsh(s, d)),
    "x_dedup_simhash"   -> ((s, d) => Dedup.simhash(s, d)),
    "x_dedup_embed"     -> ((s, d) => Dedup.embedCosinePairs(s, d)),
    "x_dedup_clusters"  -> ((s, d) => Dedup.nearDupClusters(s, d)),
    // PPJoin-style prefix-filtered variant at the strict threshold its
    // pruning targets (prefix = ~10% of postings at t=0.9 vs ~50% at 0.5)
    "x_dedup_jaccard_pp" -> ((s, d) => Dedup.ngramJaccardPrefix(s, d, 0.9)),
    // incremental-ingestion dedup: bloom-prefiltered new-batch vs prior
    // corpus, exact-verified — expected matches are SQL-expressible
    "x_dedup_incr"      -> ((s, d) => Dedup.incrementalDedup(s, d)),
    // the SAME incremental dedup served from its at-rest fingerprint+
    // bloom index (hash-once prior corpus, probe per arriving batch)
    "x_dedup_incr_stored" -> ((s, d) => Dedup.incrDedupStoredQuery(s, d)),
    // dup-guarantee variants: the custom-hash operators' *guarantee*
    // (identical input ⇒ identical signature/fingerprint) expressed over
    // a planted-duplicate corpus, where the expected pair set IS
    // SQL-expressible → hash-matched oracle rows for minhash + winnow.
    "x_minhash_dup"     -> ((s, d) => Dedup.minhashDupPairs(s, d)),
    "x_winnow_dup"      -> ((s, d) => TextAnalysis.winnowDupPairs(s, d)),
    "x_simhash_dup"     -> ((s, d) => Dedup.simhashDupPairs(s, d)),
    "x_lsh_dup"         -> ((s, d) => Similarity.lshDupRetrieval(s, d)),
    "x_ivf_dup"         -> ((s, d) => Similarity.ivfDupRetrieval(s, d)),
    "x_sim_topk"        -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "x_sim_lsh"         -> ((s, d) => Similarity.lshTopK(s, d)),
    "x_sim_ivf"         -> ((s, d) => Similarity.ivfTopK(s, d)),
    // the SAME pipelines served from their at-rest layouts (write-once
    // cached per JVM, pruned directory probes) — identical output by the
    // shared-rule construction, so the identical oracles hash-check the
    // whole write→prune→probe path, not just in-memory execution
    "x_sim_lsh_stored"  -> ((s, d) => Similarity.lshStoredQuery(s, d)),
    "x_sim_ivf_stored"  -> ((s, d) => Similarity.ivfStoredQuery(s, d)),
    "x_bm25_stored"     -> ((s, d) => Retrieval.bm25StoredQuery(s, d)),
    // measured recall@k of the ANN paths against the exact baseline —
    // hash-checked every run, not just spec'd once (the oracle rebuilds
    // the LSH signatures from the literal hyperplane doubles; the IVF
    // twin swaps k-means for the SQL-expressible md5-sampled quantizer)
    "x_lsh_recall"      -> ((s, d) => Similarity.lshRecallAtK(s, d)),
    "x_ivf_recall"      -> ((s, d) => Similarity.ivfRecallAtK(s, d)),
    "x_emb_quantize"    -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "x_emb_slice"       -> ((s, d) => Similarity.slicedTopKAgreement(s, d)),
    "x_txt_tokens"      -> ((s, d) => TextAnalysis.tokenCounts(s, d)),
    "x_txt_quality"     -> ((s, d) => TextAnalysis.qualityScores(s, d)),
    "x_txt_langid"      -> ((s, d) => TextAnalysis.langId(s, d)),
    "x_txt_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(s, d)),
    "x_txt_repetition"  -> ((s, d) => TextAnalysis.repetitionSignals(s, d)),
    "x_txt_winnow"      -> ((s, d) => TextAnalysis.winnowFingerprints(s, d)),
    // the composed corpus-prep pipeline: quality ∩ exact-dedup ∩
    // near-dup-cluster survivors → per-language stats
    "x_pipeline_corpus" -> ((s, d) => TextAnalysis.corpusSummary(s, d)),
    // corpus-preparation operators (benchmark decontamination, PII
    // redaction, per-domain caps, deterministic sampling, TF-IDF,
    // corpus n-gram stats) — all oracle-checked
    "x_decontaminate"   -> ((s, d) => CorpusPrep.decontaminate(s, d)),
    // the SAME decontamination served from its at-rest eval-gram index
    // (write-once benchmark postings, probe per corpus snapshot)
    "x_decon_stored"    -> ((s, d) => CorpusPrep.deconStoredQuery(s, d)),
    "x_pii_redact"      -> ((s, d) => CorpusPrep.piiRedact(s, d)),
    "x_domain_cap"      -> ((s, d) => CorpusPrep.domainCap(s, d)),
    "x_sample_strat"    -> ((s, d) => CorpusPrep.stratifiedSample(s, d)),
    // quality-weighted deterministic acceptance sampling (id-hash
    // uniform vs a per-doc acceptance weight)
    "x_sample_weighted" -> ((s, d) => CorpusPrep.weightedSample(s, d)),
    "x_tfidf_top"       -> ((s, d) => CorpusPrep.tfIdfTopTerms(s, d)),
    // training-batch preparation: greedy token-budget sequence packing
    // within fixed id-range groups (the parallel unit)
    "x_pack_sequences"  -> ((s, d) => CorpusPrep.packSequences(s, d)),
    // the composed Gopher-style accept/reject gate with audit reasons
    "x_quality_gate"    -> ((s, d) => CorpusPrep.qualityGate(s, d)),
    // temperature-based language-mixture resampling (alpha = 0.5)
    "x_mix_temperature" -> ((s, d) => CorpusPrep.temperatureMix(s, d)),
    // SemDeDup: components over the exact cosine >= 0.4 embedding graph
    // (the oracle-checkable recall baseline for the bucketed path below)
    "x_dedup_semantic"  -> ((s, d) => Dedup.semanticClusters(s, d)),
    // production SemDeDup: banded-signature candidate buckets → cosine
    // verify → same component tail. Approximate (custom hash family) →
    // rows-only check; recall vs the exact form is spec-asserted and the
    // identical-vector guarantee is oracle-pinned by x_semantic_dup.
    "x_dedup_semantic_lsh" -> ((s, d) => Dedup.semanticClustersLsh(s, d)),
    "x_semantic_dup"    -> ((s, d) => Dedup.semanticDupClusters(s, d)),
    // paragraph-level dedup (10-token chunk proxy), first occurrence kept
    "x_dedup_chunks"    -> ((s, d) => CorpusPrep.chunkDedup(s, d)),
    // duplicated OVERLAPPING 8-token windows (substring-dedup coverage,
    // Lee et al. 2021 shape): per-doc dup-window count + covered tokens
    "x_dedup_spans"     -> ((s, d) => CorpusPrep.spanDedup(s, d)),
    // unigram-LM surprisal in bits/token (CCNet-shape quality signal)
    "x_quality_lm"      -> ((s, d) => CorpusPrep.unigramLmScore(s, d)),
    // deterministic 16-way shuffle-shard assignment for training order
    "x_shuffle_shards"  -> ((s, d) => CorpusPrep.shuffleShards(s, d)),
    // deterministic hash-bucketed train/val/test assignment (stable
    // under corpus growth — position-free)
    "x_split_assign"    -> ((s, d) => CorpusPrep.splitAssign(s, d)),
    "x_ngram_topk"      -> ((s, d) => CorpusPrep.topNgrams(s, d)),
    // bigram collocations by PMI in integer millinats (phrase mining)
    "x_pmi_bigrams"     -> ((s, d) => CorpusPrep.pmiBigrams(s, d)),
    // BM25 lexical retrieval: top-3 corpus docs per eval-slice query
    "x_bm25_topk"       -> ((s, d) => Retrieval.bm25TopK(s, d)),
    "x_len_quantiles"   -> ((s, d) => CorpusPrep.lengthQuantiles(s, d)),
    // GK-sketch scale path, exact below its accuracy (see Scaladoc) —
    // the quantile_disc oracle applies by the exactness corollary
    "x_len_quantiles_sketch" -> ((s, d) => CorpusPrep.lengthQuantilesApprox(s, d)),
    "x_len_ntile"       -> ((s, d) => CorpusPrep.lengthDeciles(s, d)),
    "x_sessionize"      -> ((s, d) => Sessionize.sessions(s, d)),
    "x_user_running"    -> ((s, d) => Sessionize.runningTotals(s, d)),
    // temporal joins: single-shuffle as-of (union+window) and bucketed
    // range join, both verified against DuckDB's inequality-join oracle
    "x_asof_join"       -> ((s, d) => TemporalJoin.purchaseAttribution(s, d)),
    "x_range_join"      -> ((s, d) => TemporalJoin.purchaseViewWindow(s, d)),
    // Misra-Gries heavy hitters: capacity 64 > distinct event types, so
    // the sketch is provably exact here and the GROUP BY oracle applies;
    // the >capacity approximation regime is spec-tested with planted skew
    "x_heavy_hitters"   -> ((s, d) => Sketches.heavyHitters(s, d)),
    // HLL++ distinct-count guarantee twin: exact count + within-5% flag
    "x_approx_users"    -> ((s, d) => Sketches.approxDistinctUsers(s, d)),
    "x_events_funnel"   -> ((s, d) => Sessionize.funnel(s, d)),
    "x_window_hourly"   -> ((s, d) => Sessionize.hourlyWindows(s, d)),
    "x_window_sliding"  -> ((s, d) => Sessionize.slidingWindows(s, d)),
    // batch≡stream equivalence drives: the PRODUCTION streaming pipelines
    // (file source → watermark/state → memory sink) drained over the same
    // events parquet, checked by the same oracle semantics as their batch
    // twins (x_window_hourly / x_sessionize-sans-null-users)
    "x_stream_hourly"   -> ((s, d) => graft.streaming.StreamDrive.hourlyFromFiles(s, d)),
    "x_stream_sliding"  -> ((s, d) => graft.streaming.StreamDrive.slidingFromFiles(s, d)),
    "x_stream_sessionize" -> ((s, d) => graft.streaming.StreamDrive.sessionsFromFiles(s, d)),
    // corpus-side streaming twin: exact-dedup digest aggregation as a
    // streaming agg (constant per-digest state), drained complete
    "x_stream_dedup"    -> ((s, d) => graft.streaming.StreamDrive.dedupFromFiles(s, d)),
    // watermark EVICTION drive (append mode): stale late rows must drop,
    // allowed-late rows must merge — the oracle pins the 2h lateness
    // boundary from both sides (see StreamDrive.hourlyLateFromFiles)
    "x_stream_late"     -> ((s, d) => graft.streaming.StreamDrive.hourlyLateFromFiles(s, d)),
    "x_multimodal_meta" -> ((s, d) => graft.multimodal.Multimodal.mediaMeta(s, d)),
    "x_multimodal_frames" -> ((s, d) => graft.multimodal.Multimodal.frameSamples(s, d)),
    // binary→binary resize shape (content pinned via out_md5) and the
    // media→embedding feature-extract bridge; stub arithmetic is
    // deliberately oracle-recomputable
    "x_mm_resize"       -> ((s, d) => graft.multimodal.Multimodal.resize(s, d)),
    "x_mm_features"     -> ((s, d) => graft.multimodal.Multimodal.features(s, d)),
    // REAL decode conformance: javax.imageio over a fixed fleet of
    // deterministic PNG fixtures — decode, nearest-neighbor resample,
    // re-encode through the production per-partition seam. Output is a
    // pure constant of the seeds (decoded dims + pixel-exact raster
    // md5s), so the oracle pins the real decoder with a literal table.
    "x_mm_decode_real"  -> ((s, _) => graft.multimodal.Multimodal.decodeRealFixture(s)),
    "x_skew_salted"     -> ((s, d) =>
      Skew.saltedCount(Tables.events(s, d), org.apache.spark.sql.functions.col("event_type"))
        .orderBy("key")),
    // The reference's core operator (G1-G4): RDFa extraction pipeline over
    // deterministic synthesized pages. DuckDB can't parse HTML, but the
    // page synthesis is arithmetic in doc_id, so the expected per-page
    // verdict counts ARE SQL-expressible — the oracle derives them
    // relationally (see ExtractPipeline.pipelineSummary); exact triple
    // semantics are additionally pinned by golden fixtures in the specs.
    "rdfa_pipeline"     -> ((s, d) => graft.pipeline.ExtractPipeline.pipelineSummary(s, d)),
    // G2 quad-rewrite + side-table parity, content URI = md5 of payload
    "rdfa_externalize"  -> ((s, d) => graft.pipeline.ExtractPipeline.externalizeSummary(s, d)),
  )

  /** Shared quad-table CTE for the t_* oracles. */
  private val geoQuadsCte: String =
    """WITH quads AS (
      |  SELECT 'urn:nation:' || n_nationkey AS subject, 'urn:p:name' AS predicate, n_name AS obj FROM nation
      |  UNION ALL
      |  SELECT 'urn:nation:' || n_nationkey, 'urn:p:region', 'urn:region:' || n_regionkey FROM nation
      |  UNION ALL
      |  SELECT 'urn:region:' || r_regionkey, 'urn:p:name', r_name FROM region)""".stripMargin

  /** Validator-corpus CTE (must mirror QuadOps.validationCorpus exactly). */
  private val corpusCte: String =
    """WITH corpus AS (
      |  SELECT doc_id, doc_id % 7 AS idx, doc_id % 3 AS s3, doc_id % 2 AS s2,
      |         text, n_chars FROM documents),
      |tagged AS (
      |  SELECT doc_id,
      |    CASE WHEN idx = 0 THEN 'none'
      |         WHEN idx = 1 THEN 'http://www.w3.org/2001/XMLSchema#string'
      |         WHEN idx = 2 THEN 'http://www.w3.org/2001/XMLSchema#boolean'
      |         WHEN idx = 3 THEN 'http://www.w3.org/2001/XMLSchema#date'
      |         WHEN idx = 4 THEN 'http://www.w3.org/2001/XMLSchema#integer'
      |         WHEN idx = 5 THEN 'http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral'
      |         ELSE 'http://www.opengis.net/ont/geosparql#wktLiteral' END AS datatype,
      |    CASE WHEN idx = 0 THEN 'urn:doc:' || doc_id
      |         WHEN idx = 1 THEN substr(text, 1, 20)
      |         WHEN idx = 2 THEN (CASE WHEN s3 = 0 THEN 'true' WHEN s3 = 1 THEN 'TRUE' ELSE 'yes' END)
      |         WHEN idx = 3 THEN (CASE WHEN s2 = 0 THEN '2023-05-04' ELSE '2023/05/04' END)
      |         WHEN idx = 4 THEN (CASE WHEN s3 = 0 THEN CAST(n_chars AS VARCHAR) WHEN s3 = 1 THEN '4.5e2' ELSE 'abc' END)
      |         WHEN idx = 5 THEN '<x/>'
      |         ELSE (CASE WHEN s2 = 0 THEN '<http://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)'
      |                    ELSE '<https://www.opengis.net/def/crs/EPSG/0/31370> POINT(1 2)' END) END AS value,
      |    CASE WHEN idx = 2 THEN (CASE WHEN s3 = 0 THEN 'valid' WHEN s3 = 1 THEN 'corrected' ELSE 'invalid' END)
      |         WHEN idx = 3 THEN (CASE WHEN s2 = 0 THEN 'valid' ELSE 'corrected' END)
      |         WHEN idx = 4 THEN (CASE WHEN s3 = 2 THEN 'invalid' ELSE 'valid' END)
      |         WHEN idx = 5 THEN 'corrected'
      |         WHEN idx = 6 THEN (CASE WHEN s2 = 0 THEN 'valid' ELSE 'corrected' END)
      |         ELSE 'valid' END AS verdict
      |  FROM corpus)""".stripMargin

  /** Base quads of the lifecycle harness (must mirror
    * QuadOps.lifecycleTaskQuads exactly). */
  private val lifecycleCte: String =
    """WITH base AS (
      |  SELECT 'urn:task:' || n_nationkey AS subject, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS predicate, 'http://redpencil.data.gift/vocabularies/tasks/Task' AS obj FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://mu.semte.ch/vocabularies/core/uuid', 'uuid-' || n_nationkey FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://www.w3.org/ns/adms#status', 'http://redpencil.data.gift/id/concept/JobStatus/scheduled' FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://redpencil.data.gift/vocabularies/tasks/operation', 'http://lblod.data.gift/id/jobs/concept/TaskOperation/extracting' FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://purl.org/dc/terms/isPartOf', 'urn:job:' || n_nationkey FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://redpencil.data.gift/vocabularies/tasks/index', CAST(n_nationkey AS VARCHAR) FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://purl.org/dc/terms/created', '2026-01-01T00:00:00Z' FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://purl.org/dc/terms/modified', '2026-01-01T00:00:00Z' FROM nation
      |  UNION ALL SELECT 'urn:task:' || n_nationkey, 'http://redpencil.data.gift/vocabularies/tasks/inputContainer', 'urn:container:' || n_nationkey FROM nation
      |  UNION ALL SELECT 'urn:container:' || n_nationkey, 'http://redpencil.data.gift/vocabularies/tasks/hasFile', 'share://page-' || n_nationkey || '-a.html' FROM nation
      |  UNION ALL SELECT 'urn:container:' || n_nationkey, 'http://redpencil.data.gift/vocabularies/tasks/hasFile', 'share://page-' || n_nationkey || '-b.html' FROM nation)""".stripMargin

  /** Shared by x_dedup_jaccard (t=0.5) and x_dedup_jaccard_pp (t=0.9 —
    * the strict-threshold regime prefix filtering exists for) — the
    * prefix filter is an optimization, not a semantics change. */
  private def jaccardOracle(threshold: Double): String =
    s"""WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT a_id, b_id, round(i * 1.0 / (sa.n + sb.n - i), 3) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
      |WHERE round(i * 1.0 / (sa.n + sb.n - i), 3) >= $threshold ORDER BY a_id, b_id""".stripMargin

  /** The 8×64 hyperplane table behind `x_sim_lsh`, as a DuckDB
    * list-of-lists literal — the EXACT doubles the native
    * [[graft.functions.SignSignature]] expression multiplies against
    * (Double.toString round-trips through DuckDB's correctly-rounded
    * parser), so the oracle reproduces every signature bit and the
    * LSH bucketing is hash-checkable, not just rows-checkable. */
  private lazy val lshPlanesLiteral: String =
    graft.functions.SignSignature.planeWeights(8, 0, 64)
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** `sig` as bit p = (embedding · plane_p >= 0), summed as 2^p — the
    * same integer the native expression assembles with `1L << p`. The
    * outer guard mirrors the native NULL semantics exactly: the engine's
    * signatures run with `expectedDims = 64` (Similarity.IndexDims), so a
    * null, empty, or non-64-dim embedding gets a NULL signature on BOTH
    * sides by construction, and NULL never equi-joins — degenerate rows
    * drop out of the buckets identically instead of colliding into a
    * fake sig=0 bucket here. */
  private lazy val lshSigExpr: String =
    "(CASE WHEN embedding IS NULL OR len(embedding) <> 64 THEN NULL ELSE " +
      (0 until 8).map(p =>
        s"(CASE WHEN list_inner_product(embedding::DOUBLE[], w[${p + 1}]) >= 0" +
          s" THEN ${1L << p} ELSE 0 END)").mkString(" + ") + " END)"

  /** The 192 hyperplanes behind the 48×4 SemDeDup banding (three 64-plane
    * words over the disjoint seeded families planeOffset = 0, 64, 128),
    * as one DuckDB list-of-lists literal. Band b of the production
    * pipeline reads bits 4(b mod 16)..4(b mod 16)+3 of word b div 16 —
    * i.e. GLOBAL planes 4b..4b+3 — so the oracle recomputes every band
    * value from the same doubles the native expression multiplies. */
  private lazy val semPlanesLiteral: String =
    (0 until 3).flatMap(w =>
      graft.functions.SignSignature.planeWeights(64, w * 64, 64))
      .map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")

  /** The 48 band values as a DuckDB list: band b's bit i =
    * (embedding · plane_{4b+i} >= 0), exactly the slice the Spark side
    * takes with `shiftrightunsigned(sig, 4·(b mod 16)) & 15`. */
  private lazy val semBandExprs: String =
    (0 until 48).map { b =>
      (0 until 4).map { i =>
        s"(CASE WHEN list_inner_product(embedding::DOUBLE[], w[${4 * b + i + 1}])" +
          s" >= 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
    }.mkString("[", ", ", "]")

  /** Oracles whose literals only exist after a (cheap, cached) driver-side
    * computation over the verify corpus — the trained k-means centroids
    * behind `x_sim_ivf`. [[Verify]] merges these into the dumped
    * oracle_sql.json after running the queries; the static [[oracleSql]]
    * map stays data-independent. */
  def oracleSqlDynamic(s: SparkSession, d: String): Map[String, String] = {
    // the stored-probe twin is output-identical by construction — one
    // oracle string, two hash gates (in-memory and at-rest)
    val ivf = Similarity.ivfOracleSql(s, d)
    Map("x_sim_ivf" -> ivf, "x_sim_ivf_stored" -> ivf)
  }

  /** A fixed-width hex field of `col` (chars [from, from+len)) as the
    * integer DuckDB expression Σ digit·16^position — the strpos-arithmetic
    * idiom the md5-derived oracles share (DuckDB has no hex→int cast that
    * matches Spark's `conv` directly). */
  private def duckHexInt(col: String, from: Int, len: Int): String =
    (0 until len).map { i =>
      val pow = BigInt(16).pow(len - 1 - i)
      s"(strpos('0123456789abcdef', substring($col, ${from + i}, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** The minhash permutation constants as a VALUES literal — the exact
    * (a_i, b_i) pairs the Spark signatures use (Dedup.minhashPerms). */
  private lazy val minhashPermValues: String =
    graft.ops.Dedup.minhashPerms(32).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** x_dedup_minhash, fully hash-checked: the oracle regrows the exact
    * signature matrix — md5-derived shingle values mod P, the literal
    * permutation constants, per-band packed-BIGINT keys (pairs of minima
    * as hi·2³¹+lo, the same injective arithmetic the Spark side joins
    * on), and the signature-estimated Jaccard — so banding's candidate
    * graph AND its misses are pinned, not just the happy path. */
  private lazy val minhashOracle: String = {
    val p = graft.ops.Dedup.MinhashP
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
       |  FROM toks WHERE len(t) >= 3),
       |hx AS (SELECT doc_id, md5(g) AS hh FROM g),
       |xs AS (SELECT doc_id, ${duckHexInt("hh", 1, 8)} % $p AS x FROM hx),
       |perms AS (SELECT * FROM (VALUES $minhashPermValues) AS pp(i, a, b)),
       |sigs AS (SELECT doc_id, i, min((a * x + b) % $p) AS m
       |         FROM xs CROSS JOIN perms GROUP BY doc_id, i),
       |sigarr AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM sigs GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, band,
       |    sig[band*4+1] * 2147483648 + sig[band*4+2] AS bk1,
       |    sig[band*4+3] * 2147483648 + sig[band*4+4] AS bk2
       |  FROM sigarr CROSS JOIN (SELECT unnest(range(0, 8)) AS band) AS bb),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |  FROM banded a JOIN banded b2
       |    ON a.band = b2.band AND a.bk1 = b2.bk1 AND a.bk2 = b2.bk2
       |   AND a.doc_id < b2.doc_id),
       |est AS (
       |  SELECT c.a_id, c.b_id,
       |    round(len(list_filter(range(1, 33), j -> sa.sig[j] = sb.sig[j])) * 1.0 / 32, 3)
       |      AS est_jaccard
       |  FROM cand c JOIN sigarr sa ON sa.doc_id = c.a_id
       |              JOIN sigarr sb ON sb.doc_id = c.b_id)
       |SELECT a_id, b_id, est_jaccard FROM est
       |WHERE est_jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin
  }

  /** x_dedup_simhash, fully hash-checked: per-token bit-plane votes from
    * md5 hex digits (token hash = first 16 hex chars of md5 = the native
    * expression's first-8-bytes-big-endian long), sign-aggregated, banded
    * 4×16, candidates verified at Hamming ≤ 3 — every stage of the
    * production pipeline replayed bit-for-bit, INCLUDING the
    * [[graft.functions.SimHash64.NullSentinel]] remap: a fingerprint
    * whose only set bit is bit 63 (P ≈ 2⁻⁶⁴ per doc) gets bit 0 flipped
    * on the Spark side, so the `sent`/`bits` CTEs apply the identical
    * flip before banding AND Hamming. */
  private lazy val simhashOracle: String = {
    // bit j of the 64-bit token hash lives in hex char 16 - j/4 (1-based
    // from the left), at in-nibble position j mod 4
    val bitExpr =
      "((strpos('0123456789abcdef', substring(h, 16 - j // 4, 1)) - 1) " +
        ">> (j % 4)) & 1"
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
       |    x -> len(x) > 0)) AS w
       |  FROM documents),
       |th AS (SELECT doc_id, substring(md5(w), 1, 16) AS h FROM tok),
       |rawbits AS (
       |  SELECT doc_id, j,
       |    CASE WHEN sum(CASE WHEN $bitExpr = 1 THEN 1 ELSE -1 END) > 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS j) AS jj
       |  GROUP BY doc_id, j),
       |sent AS (
       |  SELECT doc_id FROM rawbits GROUP BY doc_id
       |  HAVING sum(bit) = 1
       |     AND sum(CASE WHEN j = 63 THEN bit ELSE 0 END) = 1),
       |bits AS (
       |  SELECT b.doc_id, b.j,
       |    CASE WHEN s.doc_id IS NOT NULL AND b.j = 0 THEN 1 ELSE b.bit END AS bit
       |  FROM rawbits b LEFT JOIN sent s ON s.doc_id = b.doc_id),
       |bands AS (
       |  SELECT doc_id, j // 16 AS band, sum(bit << (j % 16)) AS band_val
       |  FROM bits GROUP BY doc_id, j // 16),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |  FROM bands a JOIN bands b2
       |    ON a.band = b2.band AND a.band_val = b2.band_val
       |   AND a.doc_id < b2.doc_id),
       |ham AS (
       |  SELECT c.a_id, c.b_id,
       |    CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS INT) AS hamming
       |  FROM cand c JOIN bits ba ON ba.doc_id = c.a_id
       |              JOIN bits bb ON bb.doc_id = c.b_id AND bb.j = ba.j
       |  GROUP BY c.a_id, c.b_id)
       |SELECT a_id, b_id, hamming FROM ham WHERE hamming <= 3
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** x_txt_winnow, fully hash-checked: the winnow hash is a polynomial
    * rolling hash whose Scala Long arithmetic wraps mod 2⁶⁴ — HUGEINT
    * arithmetic with an explicit `% 2^64` (then a signed re-map) replays
    * it exactly, the window minima come from the same 4-wide sliding
    * window, and the md5 of the sorted comma-joined set must match the
    * Spark digest byte-for-byte. ASCII corpus: unicode(char) = byte. */
  private lazy val winnowOracle: String = {
    val b = BigInt(1000003)
    val (b2, b3, b4) = (b.pow(2), b.pow(3), b.pow(4))
    val m = BigInt(2).pow(64)
    val half = BigInt(2).pow(63)
    // ::HUGEINT on every term: b3/b2 fit in BIGINT, so without the cast
    // DuckDB keeps those products in INT64 and overflows
    val poly = s"(unicode(substring(text, p, 1))::HUGEINT * $b4 + " +
      s"unicode(substring(text, p + 1, 1))::HUGEINT * $b3 + " +
      s"unicode(substring(text, p + 2, 1))::HUGEINT * $b2 + " +
      s"unicode(substring(text, p + 3, 1))::HUGEINT * $b + " +
      s"unicode(substring(text, p + 4, 1)))"
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |pos AS (
       |  SELECT doc_id, text, n - 4 AS ngrams,
       |         CAST(unnest(range(1, n - 3)) AS INT) AS p
       |  FROM d WHERE n >= 5),
       |hv AS (
       |  SELECT doc_id, ngrams, p,
       |    CAST(CASE WHEN u >= $half THEN u - $m ELSE u END AS BIGINT) AS h
       |  FROM (SELECT doc_id, ngrams, p, $poly % $m AS u FROM pos)),
       |wm AS (
       |  SELECT doc_id, ngrams, p,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY p
       |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
       |  FROM hv),
       |sel AS (
       |  SELECT DISTINCT doc_id, m FROM wm WHERE ngrams > 4 AND p <= ngrams - 3
       |  UNION
       |  SELECT doc_id, min(h) AS m FROM hv WHERE ngrams <= 4 GROUP BY doc_id),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_h,
       |         array_to_string(list(m ORDER BY m), ',') AS fps
       |  FROM sel GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(a.n_h, 0) AS INT) AS n_hashes,
       |       md5(coalesce(a.fps, '')) AS fp_md5
       |FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The x_dedup_incr oracle, shared verbatim by its at-rest
    * stored-index twin (output-identical pipelines → one oracle, two
    * gates). */
  private lazy val incrDedupOracle: String =
    """WITH newb AS (
      |  SELECT doc_id + 200000 AS new_id,
      |    CASE WHEN doc_id % 3 = 0 THEN text ELSE text || ' v2' END AS text
      |  FROM documents)
      |SELECT n.new_id, p.doc_id AS prior_id
      |FROM newb n JOIN documents p ON n.text = p.text
      |ORDER BY new_id, prior_id""".stripMargin

  /** The x_decontaminate oracle, shared verbatim by its at-rest
    * stored-index twin (output-identical pipelines → one oracle, two
    * gates). */
  private lazy val deconOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 4
      |    THEN list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))
      |    ELSE []::VARCHAR[] END)) AS gram
      |  FROM toks)
      |SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
      |FROM grams tr JOIN grams ev USING (gram)
      |WHERE tr.doc_id % 97 != 0 AND ev.doc_id % 97 = 0
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY train_id, eval_id""".stripMargin

  /** The x_bm25_topk oracle, shared verbatim by its at-rest stored-probe
    * twin (output-identical pipelines → one oracle, two gates). */
  private lazy val bm25Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
      |    x -> len(x) > 0)) AS term
      |  FROM documents),
      |postings AS (
      |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |qterms AS (
      |  SELECT DISTINCT doc_id AS query_id, term FROM postings
      |  WHERE doc_id % 97 = 0),
      |corpus AS (SELECT * FROM postings WHERE doc_id % 97 <> 0),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM corpus GROUP BY doc_id),
      |dfr AS (SELECT term, count(DISTINCT doc_id) AS df
      |        FROM corpus GROUP BY term),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
      |        FROM dl),
      |w AS (
      |  SELECT q.query_id, c.doc_id,
      |    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
      |      (tf * (1.2 + 1.0)) /
      |      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) * 1000)
      |      AS BIGINT) AS w_milli
      |  FROM corpus c JOIN qterms q USING (term) JOIN dfr USING (term)
      |    JOIN dl USING (doc_id), tot),
      |sc AS (
      |  SELECT query_id, doc_id,
      |    CAST(sum(w_milli) AS BIGINT) AS score_milli
      |  FROM w GROUP BY query_id, doc_id),
      |r AS (
      |  SELECT query_id, doc_id, score_milli,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
      |  FROM sc)
      |SELECT query_id, rank, doc_id, score_milli FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** The x_sim_lsh oracle, shared verbatim by its at-rest stored-probe
    * twin (output-identical pipelines → one oracle, two gates). */
  private lazy val simLshOracle: String =
    s"""$lshSigCtes,
       |scored AS (
       |  SELECT qid, cid, round(list_cosine_similarity(qe, ce), 4) AS sim
       |  FROM c JOIN q USING (sig) WHERE qid <> cid),
       |ranked AS (
       |  SELECT qid, cid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
       |  FROM scored)
       |SELECT qid, cid, sim, CAST(rn AS BIGINT) AS rn FROM ranked
       |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin

  /** Shared CTE prefix for the LSH oracles: hyperplanes → signatures →
    * query/candidate frames. */
  private lazy val lshSigCtes: String =
    s"""WITH pl AS (SELECT $lshPlanesLiteral AS w),
       |s AS (SELECT vec_id, embedding, $lshSigExpr AS sig FROM embeddings, pl),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, sig FROM s WHERE vec_id < 8),
       |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce, sig FROM s)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "t_lifecycle_state" -> (lifecycleCte +
      """
        |SELECT subject, predicate, obj FROM (
        |  SELECT subject, predicate, obj FROM base
        |  WHERE NOT (subject = 'urn:task:1'
        |             AND predicate IN ('http://www.w3.org/ns/adms#status',
        |                               'http://purl.org/dc/terms/modified'))
        |  UNION ALL SELECT 'urn:task:1', 'http://www.w3.org/ns/adms#status',
        |    'http://redpencil.data.gift/id/concept/JobStatus/success'
        |  UNION ALL SELECT 'urn:task:1', 'http://purl.org/dc/terms/modified',
        |    '2026-02-01T00:00:00Z')
        |ORDER BY subject, predicate, obj""".stripMargin),
    // registration volume: per-predicate counts are arithmetic in the
    // per-task page count (2). Per valid file: logical entity 10 props +
    // physical entity 10 props; containers: file + import-graph + graph
    // (3 entities with type/uuid; hasFile on the first two; one hasGraph;
    // 3 resultsContainer links).
    "t_lifecycle_registry" ->
      """WITH n AS (SELECT CAST(2 AS BIGINT) AS files)
        |SELECT predicate, n FROM (
        |  SELECT 'http://dbpedia.org/ontology/fileExtension' AS predicate, 2 * files AS n FROM n
        |  UNION ALL SELECT 'http://mu.semte.ch/vocabularies/core/uuid', 2 * files + 3 FROM n
        |  UNION ALL SELECT 'http://purl.org/dc/terms/created', 2 * files FROM n
        |  UNION ALL SELECT 'http://purl.org/dc/terms/creator', 2 * files FROM n
        |  UNION ALL SELECT 'http://purl.org/dc/terms/format', 2 * files FROM n
        |  UNION ALL SELECT 'http://purl.org/dc/terms/modified', 2 * files FROM n
        |  UNION ALL SELECT 'http://redpencil.data.gift/vocabularies/tasks/hasFile', 2 * files FROM n
        |  UNION ALL SELECT 'http://redpencil.data.gift/vocabularies/tasks/hasGraph', 1 FROM n
        |  UNION ALL SELECT 'http://redpencil.data.gift/vocabularies/tasks/resultsContainer', 3 FROM n
        |  UNION ALL SELECT 'http://www.semanticdesktop.org/ontologies/2007/01/19/nie#dataSource', files FROM n
        |  UNION ALL SELECT 'http://www.semanticdesktop.org/ontologies/2007/03/22/nfo#fileName', 2 * files FROM n
        |  UNION ALL SELECT 'http://www.semanticdesktop.org/ontologies/2007/03/22/nfo#fileSize', 2 * files FROM n
        |  UNION ALL SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 2 * files + 3 FROM n
        |  UNION ALL SELECT 'http://www.w3.org/ns/prov#wasDerivedFrom', files FROM n)
        |ORDER BY predicate""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(avg(l_quantity), 2) AS avg_qty, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s4_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date, o_orderpriority
        |FROM orders WHERE o_orderkey = 1""".stripMargin,
    "s8_first_file" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey = 1 ORDER BY l_linenumber LIMIT 1""".stripMargin,
    "s10_exists_probe" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "p1_delta_filter" ->
      """WITH g AS (
        |  SELECT user_id, list(struct_pack(event_id := event_id, event_type := event_type)
        |                       ORDER BY event_id, event_type) AS inserts
        |  FROM events GROUP BY user_id),
        |x AS (SELECT user_id, unnest(inserts) AS ins FROM g)
        |SELECT user_id, ins.event_id AS event_id FROM x
        |WHERE ins.event_type = 'signup' ORDER BY event_id""".stripMargin,
    "p7_in_filter" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "j1_chain_join" ->
      """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "j2_star_join" ->
      """SELECT c_custkey, c_name, n_name, r_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey""".stripMargin,
    "j5_recovery_update" ->
      """SELECT o_orderkey, o_orderstatus AS old_status, 'failed' AS new_status
        |FROM orders WHERE o_orderstatus = 'O'
        |AND o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey""".stripMargin,
    "a1_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a4_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |count(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "s11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "w1_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders WHERE o_custkey < 100)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "a2_size_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |round(avg(length(text)), 2) AS avg_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "d1_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "o1_order_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000 OFFSET 500""".stripMargin,
    "s9_file_url" ->
      """WITH quads AS (
        |  SELECT 'urn:remote:' || n_nationkey AS subject,
        |         'http://www.semanticdesktop.org/ontologies/2007/01/19/nie#url' AS predicate,
        |         'http://example.org/files/' || n_name AS obj, 'urn:graph:a' AS graph
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:remote:' || n_nationkey,
        |         'http://www.semanticdesktop.org/ontologies/2007/01/19/nie#url',
        |         'http://example.org/files/' || n_name, 'urn:graph:b'
        |  FROM nation)
        |SELECT DISTINCT obj AS url FROM quads
        |WHERE subject = 'urn:remote:1'
        |AND predicate = 'http://www.semanticdesktop.org/ontologies/2007/01/19/nie#url'
        |ORDER BY url""".stripMargin,
    "t_ntriples_roundtrip" ->
      """SELECT subject, line FROM (
        |  SELECT 'urn:nation:' || n_nationkey AS subject,
        |         '<urn:nation:' || n_nationkey || '> <urn:p:name> "' || n_name || '" .' AS line
        |  FROM nation
        |  UNION ALL
        |  SELECT 'urn:nation:' || n_nationkey,
        |         '<urn:nation:' || n_nationkey || '> <urn:p:regionkey> "' || n_regionkey ||
        |         '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
        |  FROM nation) ORDER BY line""".stripMargin,
    "t_star_pivot" -> (geoQuadsCte +
      """
        |SELECT subject, max(CASE WHEN predicate = 'urn:p:name' THEN obj END) AS name,
        |       max(CASE WHEN predicate = 'urn:p:region' THEN obj END) AS region
        |FROM quads GROUP BY subject ORDER BY subject""".stripMargin),
    "t_chain_join" -> (geoQuadsCte +
      """
        |SELECT nn.obj AS nation_name, rn.obj AS region_name
        |FROM quads l
        |JOIN quads nn ON nn.subject = l.subject AND nn.predicate = 'urn:p:name'
        |JOIN quads rn ON rn.subject = l.obj AND rn.predicate = 'urn:p:name'
        |WHERE l.predicate = 'urn:p:region' ORDER BY nation_name""".stripMargin),
    "p4_validate" -> (corpusCte +
      """
        |SELECT doc_id, datatype, value, verdict FROM tagged ORDER BY doc_id""".stripMargin),
    "a3_verdict_counts" -> (corpusCte +
      """
        |SELECT verdict, count(*) AS n FROM tagged GROUP BY verdict ORDER BY verdict""".stripMargin),
    "k9_partition_sizes" -> (corpusCte +
      """
        |SELECT
        |  CAST(sum(CASE WHEN verdict IN ('valid', 'corrected') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_file,
        |  CAST(sum(CASE WHEN verdict IN ('invalid', 'corrected') THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_file,
        |  CAST(sum(CASE WHEN verdict = 'corrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_corrected_file
        |FROM tagged""".stripMargin),
    "x_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "x_dedup_minhash" -> minhashOracle,
    "x_dedup_simhash" -> simhashOracle,
    "x_txt_winnow" -> winnowOracle,
    "x_dedup_jaccard" -> jaccardOracle(0.5),
    // same relation at the strict threshold the prefix filter targets
    "x_dedup_jaccard_pp" -> jaccardOracle(0.9),
    "x_dedup_incr" -> incrDedupOracle,
    // at-rest twin is output-identical → one oracle, two gates
    "x_dedup_incr_stored" -> incrDedupOracle,
    "x_dedup_embed" ->
      """WITH p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a_id, b_id, sim FROM p ORDER BY sim DESC, a_id, b_id LIMIT 20""".stripMargin,
    // connected components over the Jaccard pair graph: cluster_id = min
    // reachable doc_id, via a recursive CTE transitive closure
    "x_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM inter
        |  JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
        |  WHERE round(i * 1.0 / (sa.n + sb.n - i), 3) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT d.doc_id,
        |  CAST(least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS BIGINT) AS cluster_id
        |FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    // the guarantee, stated exactly: identical shingle SETS ⇔ identical
    // k=128 signatures. On this corpus that is the planted (d, d+100000)
    // pairs, but the oracle derives the set relation itself so it stays
    // correct even on a corpus with duplicate original texts.
    "x_minhash_dup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shset
        |  FROM toks WHERE len(t) >= 3),
        |corpus AS (
        |  SELECT doc_id, shset FROM sh
        |  UNION ALL SELECT doc_id + 100000, shset FROM sh)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM corpus a JOIN corpus b ON a.shset = b.shset AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,
    // equal-text pairs over the doubled corpus (simhash fp equality is
    // the candidate filter; digest verification makes the relation exact)
    "x_simhash_dup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,
    // each query's smallest identical-embedding partner in the doubled
    // corpus is its top-1 at cosine 1.0 — derived from the data (like
    // the sibling dup oracles) rather than hardcoding (q, q+100000), so
    // a natural embedding duplicate can't break the gate
    "x_lsh_dup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings)
        |SELECT a.vec_id AS qid, CAST(min(b.vec_id) AS BIGINT) AS cid,
        |       1.0 AS sim, CAST(1 AS BIGINT) AS rn
        |FROM corpus a JOIN corpus b
        |  ON a.embedding = b.embedding AND a.vec_id <> b.vec_id
        |WHERE a.vec_id < 8 GROUP BY a.vec_id ORDER BY qid""".stripMargin,
    // IVF guarantee, same derivation: an identical vector shares the
    // query's k-means cell (identical input ⇒ identical assignment), the
    // query's own cell is always probed (self-distance 0), and cosine 1.0
    // beats every non-identical candidate — so the production IVF
    // pipeline at k=1 must return each query's smallest
    // identical-embedding partner. rn is the Spark-side row_number (INT).
    "x_ivf_dup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings)
        |SELECT a.vec_id AS qid, CAST(min(b.vec_id) AS BIGINT) AS cid,
        |       1.0 AS sim, CAST(1 AS INT) AS rn
        |FROM corpus a JOIN corpus b
        |  ON a.embedding = b.embedding AND a.vec_id <> b.vec_id
        |WHERE a.vec_id < 8 GROUP BY a.vec_id ORDER BY qid""".stripMargin,
    // like x_minhash_dup, the oracle derives the relation itself (equal
    // interleaved texts ⇔ equal fingerprint sets) instead of hardcoding
    // (d, d+100000) — robust even if a corpus contained two identical
    // whitespace-free texts where the id interleaving is a no-op.
    "x_winnow_dup" ->
      """WITH it AS (
        |  SELECT doc_id, regexp_replace(text, '\s+', ' ' || doc_id || ' ', 'g') AS t
        |  FROM documents),
        |eligible AS (SELECT doc_id, t FROM it WHERE octet_length(encode(t)) >= 5),
        |corpus AS (
        |  SELECT doc_id, t FROM eligible
        |  UNION ALL SELECT doc_id + 100000, t FROM eligible)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |FROM corpus a JOIN corpus b ON a.t = b.t AND a.doc_id < b.doc_id
        |ORDER BY a_id, b_id""".stripMargin,
    "x_sim_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce FROM embeddings),
        |scored AS (
        |  SELECT qid, cid, round(list_cosine_similarity(qe, ce), 4) AS sim
        |  FROM q CROSS JOIN c WHERE qid <> cid),
        |ranked AS (
        |  SELECT qid, cid, sim,
        |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |  FROM scored)
        |SELECT qid, cid, sim, CAST(rn AS BIGINT) AS rn FROM ranked
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    // the production LSH path, fully oracle-checked: identical hyperplane
    // doubles → identical signature bits → identical buckets; rescoring
    // and ranking then mirror x_sim_topk's (already-green) arithmetic
    "x_sim_lsh" -> simLshOracle,
    // at-rest twin: same buckets, same rescore — same oracle
    "x_sim_lsh_stored" -> simLshOracle,
    // measured recall@k: |LSH top-k ∩ exact top-k| per query — the
    // x_emb_slice agreement pattern applied to the production ANN path
    "x_lsh_recall" ->
      s"""$lshSigCtes,
        |ann AS (SELECT qid, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |    ORDER BY round(list_cosine_similarity(qe, ce), 4) DESC, cid) AS rn
        |  FROM c JOIN q USING (sig) WHERE qid <> cid) WHERE rn <= 5),
        |ex AS (SELECT qid, cid FROM (
        |  SELECT q.qid, c.cid, row_number() OVER (PARTITION BY q.qid
        |    ORDER BY round(list_cosine_similarity(q.qe, c.ce), 4) DESC, c.cid) AS rn
        |  FROM c CROSS JOIN q WHERE q.qid <> c.cid) WHERE rn <= 5)
        |SELECT e.qid, CAST(count(a.cid) AS BIGINT) AS n_common
        |FROM ex e LEFT JOIN ann a ON e.qid = a.qid AND e.cid = a.cid
        |GROUP BY e.qid ORDER BY e.qid""".stripMargin,
    // measured recall@k of the IVF shape under the one coarse quantizer
    // an oracle can replicate: centroids = the 16 corpus vectors with the
    // smallest md5(vec_id || '/ivf'); Voronoi assign (rounded cosine,
    // centroid-id tie-break), probe 4 nearest cells, exact re-score.
    // The trained k-means path (x_sim_ivf) keeps its planted-copy oracle.
    "x_ivf_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |cent AS (
        |  SELECT row_number() OVER (ORDER BY h) AS centroid_id, x AS cent_e
        |  FROM (SELECT x, md5(CAST(vec_id AS VARCHAR) || '/ivf') AS h
        |        FROM e ORDER BY h LIMIT 16)),
        |assigned AS (SELECT vec_id, x, cell FROM (
        |  SELECT e.vec_id, e.x, c.centroid_id AS cell,
        |         row_number() OVER (PARTITION BY e.vec_id
        |           ORDER BY round(list_cosine_similarity(e.x, c.cent_e), 4) DESC,
        |                    c.centroid_id) AS rn
        |  FROM e CROSS JOIN cent c) WHERE rn = 1),
        |probes AS (SELECT query_cell, probe_cell FROM (
        |  SELECT a.centroid_id AS query_cell, b.centroid_id AS probe_cell,
        |         row_number() OVER (PARTITION BY a.centroid_id
        |           ORDER BY round(list_cosine_similarity(a.cent_e, b.cent_e), 4) DESC,
        |                    b.centroid_id) AS pr
        |  FROM cent a CROSS JOIN cent b) WHERE pr <= 4),
        |qp AS (
        |  SELECT vec_id AS qid, x AS qe, probe_cell
        |  FROM assigned JOIN probes ON assigned.cell = probes.query_cell
        |  WHERE vec_id < 8),
        |ann AS (SELECT qid, cid FROM (
        |  SELECT qp.qid, a.vec_id AS cid,
        |         row_number() OVER (PARTITION BY qp.qid
        |           ORDER BY round(list_cosine_similarity(qp.qe, a.x), 4) DESC,
        |                    a.vec_id) AS rn
        |  FROM assigned a JOIN qp ON a.cell = qp.probe_cell
        |  WHERE qp.qid <> a.vec_id) WHERE rn <= 5),
        |ex AS (SELECT qid, cid FROM (
        |  SELECT q2.qid, c2.vec_id AS cid,
        |         row_number() OVER (PARTITION BY q2.qid
        |           ORDER BY round(list_cosine_similarity(q2.qe, c2.x), 4) DESC,
        |                    c2.vec_id) AS rn
        |  FROM e c2 CROSS JOIN (SELECT vec_id AS qid, x AS qe FROM e
        |                        WHERE vec_id < 8) q2
        |  WHERE q2.qid <> c2.vec_id) WHERE rn <= 5)
        |SELECT x.qid, CAST(count(a2.cid) AS BIGINT) AS n_common
        |FROM ex x LEFT JOIN ann a2 ON x.qid = a2.qid AND x.cid = a2.cid
        |GROUP BY x.qid ORDER BY x.qid""".stripMargin,
    "x_emb_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS x,
        |         list_aggregate(list_transform(embedding::DOUBLE[], e -> abs(e)), 'max') / 127.0 AS s
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, x, s,
        |         list_transform(x, e -> CASE WHEN s = 0 THEN 0.0 ELSE round(e / s) END) AS qv
        |  FROM v)
        |SELECT vec_id, round(s, 6) AS q_scale,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  round(list_aggregate(list_transform(range(1, len(x) + 1),
        |        i -> abs(x[i] - qv[i] * s)), 'max'), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "rdfa_pipeline" ->
      """SELECT 'http://harvest.example.org/page/' || doc_id AS url,
        |  CAST(4 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
        |         + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_valid,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_corrected,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_invalid
        |FROM documents ORDER BY url""".stripMargin,
    // G2: the %3 pages' rdf:HTML payload is arithmetic in (doc_id, text),
    // so the externalized content AND its md5-minted file URI are
    // relationally derivable — DuckDB recomputes the innerHtml
    // serialization ('<p>…</p>') and the content hash byte-for-byte.
    "rdfa_externalize" ->
      """SELECT 'http://harvest.example.org/page/' || doc_id AS url,
        |  'http://data.lblod.info/id/files/' ||
        |    md5('<p>' || substring(text, 1, 20) || '</p>') AS file_uri,
        |  '<p>' || substring(text, 1, 20) || '</p>' AS content
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY url""".stripMargin,
    "x_emb_slice" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
        |full_s AS (
        |  SELECT qid, cid,
        |    round(list_cosine_similarity(qe::DOUBLE[], ce::DOUBLE[]), 4) AS sim
        |  FROM c JOIN q ON qid != cid),
        |full_t AS (SELECT qid, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |  FROM full_s) WHERE rn <= 5),
        |sl_s AS (
        |  SELECT qid, cid,
        |    round(list_cosine_similarity((qe[1:16])::DOUBLE[], (ce[1:16])::DOUBLE[]), 4) AS sim
        |  FROM c JOIN q ON qid != cid),
        |sl_t AS (SELECT qid, cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rn
        |  FROM sl_s) WHERE rn <= 5)
        |SELECT f.qid, CAST(count(s.cid) AS BIGINT) AS n_common
        |FROM full_t f LEFT JOIN sl_t s ON f.qid = s.qid AND f.cid = s.cid
        |GROUP BY f.qid ORDER BY f.qid""".stripMargin,
    "x_txt_tokens" ->
      """SELECT doc_id, length(text) AS n_chars,
        |CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws_tokens,
        |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_txt_quality" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS INT) AS n_tokens,
        |    length(regexp_replace(lower(text), '\s', '', 'g')) AS n_nonws,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS n_stop,
        |    len(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
        |    length(text) AS n_chars
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  round(n_nonws * 1.0 / n_tokens, 3) AS avg_token_len,
        |  round(n_stop * 1.0 / n_tokens, 3) AS stopword_ratio,
        |  round(n_alpha * 1.0 / n_chars, 3) AS alpha_ratio,
        |  (n_tokens >= 5 AND n_tokens <= 100000
        |   AND round(n_stop * 1.0 / n_tokens, 3) > 0.001
        |   AND round(n_nonws * 1.0 / n_tokens, 3) < 12) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "x_txt_langid" ->
      """WITH s AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS INT) AS en_score,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht)\b')) AS INT) AS de_score,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|y|los)\b')) AS INT) AS es_score,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|de|et|les|des)\b')) AS INT) AS fr_score
        |  FROM documents)
        |SELECT doc_id, labeled_lang, en_score, de_score, es_score, fr_score,
        |  CASE WHEN greatest(en_score, de_score, es_score, fr_score) = 0 THEN 'und'
        |       WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score THEN 'en'
        |       WHEN de_score >= es_score AND de_score >= fr_score THEN 'de'
        |       WHEN es_score >= fr_score THEN 'es'
        |       ELSE 'fr' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,
    "x_txt_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_txt_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |         ELSE [] END AS g2,
        |    CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |         ELSE [] END AS g3
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CASE WHEN len(g2) = 0 THEN 0.0
        |       ELSE round((len(g2) - len(list_distinct(g2))) * 1.0 / len(g2), 3) END AS dup_2gram_frac,
        |  CASE WHEN len(g3) = 0 THEN 0.0
        |       ELSE round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3), 3) END AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "x_pipeline_corpus" ->
      """WITH RECURSIVE m AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS INT) AS n_tokens,
        |    length(regexp_replace(lower(text), '\s', '', 'g')) AS n_nonws,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS n_stop
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id FROM m
        |  WHERE n_tokens >= 5 AND n_tokens <= 100000
        |    AND round(n_stop * 1.0 / n_tokens, 3) > 0.001
        |    AND round(n_nonws * 1.0 / n_tokens, 3) < 12),
        |exact_surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a_id, b_id FROM inter
        |  JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
        |  WHERE round(i * 1.0 / (sa.n + sb.n - i), 3) >= 0.5),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        |cluster_surv AS (
        |  SELECT d.doc_id FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
        |  GROUP BY d.doc_id
        |  HAVING least(d.doc_id, coalesce(min(r.v), d.doc_id)) = d.doc_id),
        |final AS (
        |  SELECT * FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM kept)
        |    AND doc_id IN (SELECT doc_id FROM exact_surv)
        |    AND doc_id IN (SELECT doc_id FROM cluster_surv))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens
        |FROM final GROUP BY lang ORDER BY lang""".stripMargin,
    "x_decontaminate" -> deconOracle,
    // at-rest twin is output-identical → one oracle, two gates (the
    // bm25Oracle precedent)
    "x_decon_stored" -> deconOracle,
    "x_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' tel +' || (doc_id + 32000000000) ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\+[0-9]{8,}')) AS INT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{8,}', '<PHONE>', 'g')) AS red_md5
        |FROM p ORDER BY doc_id""".stripMargin,
    "x_domain_cap" ->
      """SELECT doc_id, source, rk FROM (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY source, rk""".stripMargin,
    "x_sample_strat" ->
      """SELECT lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substring(md5(doc_id::VARCHAR), 32, 1) IN ('0','1','2')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  round(sum(CASE WHEN substring(md5(doc_id::VARCHAR), 32, 1) IN ('0','1','2')
        |           THEN 1 ELSE 0 END) * 1.0 / count(*), 3) AS rate
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x_sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST((strpos('0123456789abcdef',
        |            substring(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16 +
        |         (strpos('0123456789abcdef',
        |            substring(md5(doc_id::VARCHAR), 2, 1)) - 1) AS BIGINT) AS u,
        |    CAST(floor(256.0 * least(1.0, n_chars / 500.0)) AS BIGINT) AS cut
        |  FROM documents)
        |SELECT doc_id, n_chars, u, cut FROM d
        |WHERE u < cut ORDER BY doc_id""".stripMargin,
    "x_tfidf_top" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |                        x -> len(x) > 0)) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.word, round(tf.tf * ln(n.n_docs * 1.0 / df.df), 3) AS score
        |  FROM tf JOIN df USING (word) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, word, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS BIGINT) AS rn
        |  FROM scored)
        |SELECT doc_id, word, score, rn FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,
    // greedy packing is a sequential recurrence per group — the oracle
    // steps it with a recursive CTE over the per-group row_number chain
    // (one recursion depth per doc in the largest group)
    "x_pack_sequences" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, doc_id // 100 AS grp,
        |         len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS nt
        |  FROM documents),
        |r AS (
        |  SELECT grp, doc_id, nt,
        |         row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
        |  FROM t),
        |packed AS (
        |  SELECT grp, rn, doc_id, nt, CAST(0 AS BIGINT) AS bin, nt AS run
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.grp, r.rn, r.doc_id, r.nt,
        |    CASE WHEN p.run + r.nt > 512 AND p.run > 0 THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.run + r.nt > 512 AND p.run > 0 THEN r.nt ELSE p.run + r.nt END
        |  FROM packed p JOIN r ON r.grp = p.grp AND r.rn = p.rn + 1)
        |SELECT doc_id, grp, bin, nt AS n_tokens FROM packed ORDER BY doc_id""".stripMargin,
    "x_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
        |    CASE WHEN len(w) = 0 THEN 0.0 ELSE
        |      round(length(regexp_replace(text, '\s', '', 'g')) * 1.0 / len(w), 3)
        |      END AS mean_word_len,
        |    CASE WHEN len(w) < 2 THEN 0.0 ELSE round(
        |      (len(w) - 1 - len(list_distinct(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i+1])))) * 1.0 / (len(w) - 1), 3) END
        |      AS dup_2gram_frac,
        |    (list_contains(w, 'the') AND list_contains(w, 'a')) AS has_stopwords
        |  FROM t)
        |SELECT doc_id, n_tokens, mean_word_len, dup_2gram_frac, has_stopwords,
        |  (dup_2gram_frac <= 0.05 AND mean_word_len BETWEEN 3 AND 10
        |   AND has_stopwords AND n_tokens BETWEEN 40 AND 100000) AS pass,
        |  concat_ws(',',
        |    CASE WHEN dup_2gram_frac > 0.05 THEN 'dup_2gram' END,
        |    CASE WHEN mean_word_len < 3 OR mean_word_len > 10 THEN 'mean_word_len' END,
        |    CASE WHEN NOT has_stopwords THEN 'stopwords' END,
        |    CASE WHEN n_tokens < 40 OR n_tokens > 100000 THEN 'word_count' END)
        |    AS fail_reasons
        |FROM m ORDER BY doc_id""".stripMargin,
    // keep rule is bitwise-reproducible: sqrt(n_min/n_l) on correctly-
    // rounded doubles, and the per-doc uniform is exact integer
    // arithmetic (doc_id * knuth-mix mod 1e5)
    "x_mix_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
        |m AS (SELECT min(n_before) AS n_min FROM c),
        |f AS (SELECT lang, n_before, sqrt(n_min * 1.0 / n_before) AS kf FROM c, m),
        |k AS (
        |  SELECT d.lang, count(*) AS n_kept
        |  FROM documents d JOIN f USING (lang)
        |  WHERE ((d.doc_id * 2654435761) % 100000) / 100000.0 < kf
        |  GROUP BY d.lang),
        |tot AS (SELECT sum(n_before) AS tb, sum(n_kept) AS tk FROM f JOIN k USING (lang))
        |SELECT f.lang, f.n_before, k.n_kept, round(f.kf, 4) AS keep_frac,
        |  round(f.n_before * 1.0 / tot.tb, 4) AS share_before,
        |  round(k.n_kept * 1.0 / tot.tk, 4) AS share_after
        |FROM f JOIN k USING (lang) CROSS JOIN tot ORDER BY lang""".stripMargin,
    // same closure shape as x_dedup_clusters, over the embedding cosine
    // graph (CosineSimilarity == list_cosine_similarity bitwise)
    "x_dedup_semantic" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT e.vec_id,
        |  CAST(least(e.vec_id, coalesce(min(r.v), e.vec_id)) AS BIGINT) AS cluster_id
        |FROM embeddings e LEFT JOIN reach r ON r.u = e.vec_id
        |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin,
    // the PRODUCTION bucketed SemDeDup path, fully oracle-checked: the
    // literal hyperplane doubles reproduce every band value, so DuckDB
    // regrows the same candidate graph (pairs agreeing in ANY of the 48
    // bands), verifies it with the same rounded cosine threshold, and
    // closes the same components — including banding's misses: a
    // threshold pair whose signatures disagree in every band is absent
    // from BOTH engines' edge sets, so the approximation itself is what
    // the hash pins, not just the happy path
    "x_dedup_semantic_lsh" ->
      s"""WITH RECURSIVE pl AS (SELECT $semPlanesLiteral AS w),
        |sig AS (SELECT vec_id, embedding FROM embeddings
        |        WHERE embedding IS NOT NULL AND len(embedding) = 64),
        |bv AS (SELECT vec_id, $semBandExprs AS bvals FROM sig, pl),
        |banded AS (
        |  SELECT vec_id, band, bvals[band + 1] AS band_val
        |  FROM bv, (SELECT unnest(range(0, 48)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
        |  FROM banded a JOIN banded b2
        |    ON a.band = b2.band AND a.band_val = b2.band_val
        |   AND a.vec_id < b2.vec_id),
        |pairs AS (
        |  SELECT c.a_id, c.b_id FROM cand c
        |  JOIN sig ea ON ea.vec_id = c.a_id
        |  JOIN sig eb ON eb.vec_id = c.b_id
        |  WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[],
        |        eb.embedding::DOUBLE[]), 4) >= 0.4),
        |edges AS (
        |  SELECT a_id AS u, b_id AS v FROM pairs
        |  UNION ALL SELECT b_id, a_id FROM pairs),
        |reach AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
        |SELECT e.vec_id,
        |  CAST(least(e.vec_id, coalesce(min(r.v), e.vec_id)) AS BIGINT) AS cluster_id
        |FROM embeddings e LEFT JOIN reach r ON r.u = e.vec_id
        |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin,
    // SemDeDup guarantee through the PRODUCTION bucketed pipeline:
    // identical embeddings share every signature band, verify at cosine
    // 1.0, and cluster together; at t=0.9 nothing non-identical verifies
    // (max genuine pairwise cosine ≈0.5), so the output is exactly the
    // equal-embedding equivalence classes labeled by min vec_id —
    // derived via the (transitive) equality join, not hardcoded offsets,
    // so a natural embedding duplicate can't break the gate.
    "x_semantic_dup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings)
        |SELECT a.vec_id, CAST(min(b.vec_id) AS BIGINT) AS cluster_id
        |FROM corpus a JOIN corpus b ON a.embedding = b.embedding
        |GROUP BY a.vec_id ORDER BY a.vec_id""".stripMargin,
    // chunk hashing: DuckDB list slice w[a:b] is INCLUSIVE (b-a+1 elems);
    // rn=1 marks the globally-first occurrence of each chunk digest
    "x_dedup_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |u AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(0, CAST(ceil(len(w) * 1.0 / 10) AS INT))) AS BIGINT) AS idx,
        |    unnest(list_transform(range(0, CAST(ceil(len(w) * 1.0 / 10) AS INT)),
        |      k -> array_to_string(w[k*10+1:k*10+10], ' '))) AS s
        |  FROM t),
        |c AS (
        |  SELECT doc_id, idx, md5(s) AS h,
        |         CAST(len(list_filter(string_split_regex(s, '\s+'),
        |           x -> len(x) > 0)) AS BIGINT) AS nt
        |  FROM u),
        |r AS (
        |  SELECT doc_id, nt,
        |         row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
        |  FROM c)
        |SELECT doc_id, count(*) AS n_chunks,
        |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
        |  sum(CASE WHEN rn = 1 THEN nt ELSE 0 END)::BIGINT AS kept_tokens,
        |  round(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 3)
        |    AS dup_frac
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // overlapping-window substring dedup: DuckDB groups by the window
    // TEXT where Spark groups by its md5 — identical partitions (md5 is
    // injective on these strings; chunk-dedup precedent). The coverage
    // sweep is the same single lead() union-of-intervals on both sides.
    "x_dedup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |tot AS (
        |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |         CAST(greatest(0, len(t) - 7) AS BIGINT) AS n_windows
        |  FROM toks),
        |w AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(0, greatest(0, len(t) - 7))) AS BIGINT) AS pos,
        |    unnest(list_transform(range(1, greatest(1, len(t) - 6)),
        |      i -> array_to_string(t[i:i+7], ' '))) AS win
        |  FROM toks),
        |dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
        |occ AS (
        |  SELECT doc_id, pos,
        |         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |  FROM w WHERE win IN (SELECT win FROM dup)),
        |cov AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows,
        |    CAST(sum(CASE WHEN nxt IS NULL THEN 8
        |                  ELSE least(8, nxt - pos) END) AS BIGINT) AS covered_tokens
        |  FROM occ GROUP BY doc_id)
        |SELECT t.doc_id, t.n_tokens, t.n_windows,
        |  coalesce(c.dup_windows, 0) AS dup_windows,
        |  coalesce(c.covered_tokens, 0) AS covered_tokens,
        |  CASE WHEN t.n_tokens > 0
        |    THEN round(coalesce(c.covered_tokens, 0) * 1.0 / t.n_tokens, 3)
        |    ELSE 0.0 END AS covered_frac
        |FROM tot t LEFT JOIN cov c USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    // per-word surprisal quantized to integer millibits BEFORE the
    // per-doc sum — exact integer aggregation, no float reduction-order
    // drift on either engine
    "x_quality_lm" ->
      """WITH ww AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0)) AS w
        |  FROM documents),
        |v AS (SELECT w, count(*) AS cnt FROM ww GROUP BY w),
        |tot AS (SELECT sum(cnt) AS total FROM v),
        |lp AS (
        |  SELECT w, CAST(round(log2(cnt * 1.0 / total) * 1000) AS BIGINT)
        |    AS millibits
        |  FROM v, tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  sum(millibits)::BIGINT AS sum_millibits,
        |  round(-sum(millibits) * 1.0 / (count(*) * 1000.0), 3)
        |    AS bits_per_token
        |FROM ww JOIN lp USING (w)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_shuffle_shards" ->
      """WITH d AS (
        |  SELECT doc_id, md5('42:' || doc_id) AS digest FROM documents)
        |SELECT doc_id,
        |  CAST(strpos('0123456789abcdef', substring(digest, 1, 1)) - 1
        |    AS BIGINT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY strpos('0123456789abcdef', substring(digest, 1, 1))
        |    ORDER BY digest, doc_id) AS BIGINT) AS pos
        |FROM d ORDER BY shard, pos""".stripMargin,
    "x_split_assign" ->
      """WITH d AS (
        |  SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |    AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 'e6' THEN 'train'
        |       WHEN bucket < 'f3' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM d ORDER BY doc_id""".stripMargin,
    // same integer-millinat fixed point as x_quality_lm; the top-k is
    // ordered on the rounded integer so the tie-break is exact
    "x_pmi_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS n_w
        |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |nuni AS (SELECT sum(n_w) AS n_uni FROM uni),
        |grams AS (
        |  SELECT unnest(CASE WHEN len(t) >= 2
        |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE []::VARCHAR[] END) AS gram
        |  FROM toks),
        |bi0 AS (SELECT gram, count(*) AS n_ab FROM grams GROUP BY gram),
        |nbi AS (SELECT sum(n_ab) AS n_bi FROM bi0),
        |bi AS (
        |  SELECT gram, n_ab, split_part(gram, ' ', 1) AS wa,
        |         split_part(gram, ' ', 2) AS wb
        |  FROM bi0 WHERE n_ab >= 5)
        |SELECT gram, n_ab,
        |  CAST(round(ln((n_ab * 1.0 / n_bi) /
        |    ((ua.n_w * 1.0 / n_uni) * (ub.n_w * 1.0 / n_uni))) * 1000)
        |    AS BIGINT) AS pmi_millinats
        |FROM bi JOIN uni ua ON ua.w = bi.wa JOIN uni ub ON ub.w = bi.wb,
        |     nuni, nbi
        |ORDER BY pmi_millinats DESC, gram LIMIT 20""".stripMargin,
    // BM25 constants written as the same literal double ops as the Spark
    // side (k1 + 1, 1 - b unfolded) so both engines round identically;
    // score fixed-pointed to milli-units, rank on the integer
    "x_bm25_topk" -> bm25Oracle,
    // at-rest twin: stored postings carry the same tf/df/dl/totals the
    // in-memory build derives — same scores, same oracle
    "x_bm25_stored" -> bm25Oracle,
    "x_ngram_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |grams AS (
        |  SELECT unnest(CASE WHEN len(t) >= 2
        |    THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE []::VARCHAR[] END) AS gram
        |  FROM toks)
        |SELECT gram, count(*) AS n_occ FROM grams
        |GROUP BY gram ORDER BY n_occ DESC, gram LIMIT 20""".stripMargin,
    // NTILE tie-broken by doc_id on both sides → total order → exact
    "x_len_ntile" ->
      """WITH t AS (
        |  SELECT lang, doc_id, n_chars,
        |         CAST(ntile(10) OVER (PARTITION BY lang
        |           ORDER BY n_chars, doc_id) AS BIGINT) AS decile
        |  FROM documents)
        |SELECT lang, decile, count(*) AS n_docs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM t GROUP BY lang, decile ORDER BY lang, decile""".stripMargin,
    "x_len_quantiles_sketch" ->
      """SELECT lang, count(*) AS n_docs,
        |  quantile_disc(n_chars, 0.25) AS p25,
        |  quantile_disc(n_chars, 0.5) AS p50,
        |  quantile_disc(n_chars, 0.75) AS p75,
        |  quantile_disc(n_chars, 0.99) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x_len_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.25), 2) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 2) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 2) AS p75,
        |  round(quantile_cont(n_chars, 0.99), 2) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x_events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')
        |    AND user_id IS NOT NULL),
        |s1 AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS t0
        |       FROM e GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(us) AS t1 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t0 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t1 GROUP BY e.user_id)
        |SELECT count(*) AS n_users,
        |  count(s1.t0) AS n_step1_view,
        |  count(s2.t1) AS n_step2_click,
        |  count(s3.t2) AS n_step3_purchase
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,
    // temporal-join oracles use the textbook inequality-join formulation
    // on purpose: an independent plan shape checking the cheap bucketed/
    // windowed Spark plans. Tie-break (us DESC, event_id DESC → rn=1)
    // mirrors the Spark side's last-over-(us, tag, build_id) exactly.
    "x_asof_join" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value
        |           FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
        |      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |m AS (SELECT p.event_id AS pid, v.event_id AS view_event_id,
        |             v.value AS view_value,
        |             row_number() OVER (PARTITION BY p.event_id
        |               ORDER BY v.us DESC, v.event_id DESC) AS rn
        |      FROM p JOIN v ON v.user_id = p.user_id AND v.us <= p.us)
        |SELECT p.event_id AS purchase_id, p.user_id, p.us AS purchase_us,
        |       m.view_event_id, m.view_value
        |FROM p LEFT JOIN m ON m.pid = p.event_id AND m.rn = 1
        |ORDER BY purchase_id""".stripMargin,
    "x_range_join" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, value
        |           FROM events WHERE event_type = 'view' AND user_id IS NOT NULL),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
        |      FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL)
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       count(v.event_id) AS n_views_1h,
        |       round(coalesce(sum(v.value), 0), 2) AS sum_view_value
        |FROM p LEFT JOIN v ON v.user_id = p.user_id
        |  AND v.us >= p.us - 3600000000 AND v.us < p.us
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin,
    // exact because sketch capacity (64) exceeds the key cardinality —
    // the Misra-Gries no-reduction corollary; see Sketches.heavyHitters
    "x_heavy_hitters" ->
      """SELECT event_type AS item, count(*) AS est_count FROM events
        |WHERE event_type IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    // the within_tol flag is computed Spark-side from the HLL estimate;
    // the oracle pins the exact count and demands the flag hold
    "x_approx_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  true AS within_tol
        |FROM events
        |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ties on us ordered by event_id on BOTH sides so the cumulative
    // double additions run in the same sequence (exact compare)
    "x_user_running" ->
      """SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
        |  round(sum(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_value,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000, event_id) AS seq
        |FROM events WHERE user_id IS NOT NULL
        |ORDER BY user_id, seq""".stripMargin,
    "x_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        |l AS (SELECT user_id, us,
        |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS gap FROM e),
        |f AS (SELECT user_id, us,
        |        CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
        |sess AS (SELECT user_id, us,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT) AS sess_id FROM f)
        |SELECT user_id, sess_id, count(*) AS n_events, min(us) AS start_us,
        |       max(us) AS end_us, max(us) - min(us) AS duration_us
        |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    "x_window_hourly" ->
      """SELECT epoch_ns(ts) // 1000 // 3600000000 AS hour_bucket, event_type,
        |count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streaming drive must agree with the batch hourly oracle exactly
    "x_stream_hourly" ->
      """SELECT epoch_ns(ts) // 1000 // 3600000000 AS hour_bucket, event_type,
        |count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // streaming sessionization ≡ batch sessions, minus null user_ids
    // (the typed streaming key is a primitive long; exclusion is pinned
    // on both sides)
    "x_stream_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        |           WHERE user_id IS NOT NULL),
        |l AS (SELECT user_id, us,
        |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS gap FROM e),
        |f AS (SELECT user_id, us,
        |        CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM l),
        |sess AS (SELECT user_id, us,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us) AS BIGINT) AS sess_id FROM f)
        |SELECT user_id, sess_id, count(*) AS n_events, min(us) AS start_us,
        |       max(us) AS end_us, max(us) - min(us) AS duration_us
        |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,
    // min/count are order-insensitive, so the drained streaming state
    // table equals the batch GROUP BY regardless of batch boundaries
    "x_stream_dedup" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    // the watermark rule, stated as batch arithmetic: the drive feeds the
    // corpus in order, then a late batch of (stale first-hour copies,
    // allowed-late last-hour copies); with the watermark at max - 2h the
    // stale copies drop and the last-hour copies merge — so the expected
    // table is hourly counts over events ∪ last-hour events. Any
    // eviction/lateness deviation moves a count and fails the hash.
    "x_stream_late" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type, value FROM events),
        |mx AS (SELECT max(us) AS mu FROM e),
        |inp AS (
        |  SELECT us, event_type, value FROM e
        |  UNION ALL
        |  SELECT us, event_type, value FROM e, mx WHERE us >= mu - 3600000000)
        |SELECT us // 3600000000 AS hour_bucket, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM inp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streaming drive must agree with the batch sliding oracle exactly
    "x_stream_sliding" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type, value FROM events),
        |w AS (
        |  SELECT ((us - i * 1800000000) // 1800000000) * 1800000000 AS window_start_us,
        |         event_type, value
        |  FROM e, unnest(range(0, 2)) AS t(i))
        |SELECT window_start_us, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM w WHERE window_start_us >= 0
        |GROUP BY window_start_us, event_type
        |ORDER BY window_start_us, event_type""".stripMargin,
    "x_window_sliding" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, event_type, value FROM events),
        |w AS (
        |  SELECT ((us - i * 1800000000) // 1800000000) * 1800000000 AS window_start_us,
        |         event_type, value
        |  FROM e, unnest(range(0, 2)) AS t(i))
        |SELECT window_start_us, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM w WHERE window_start_us >= 0
        |GROUP BY window_start_us, event_type
        |ORDER BY window_start_us, event_type""".stripMargin,
    "x_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         octet_length(encode(text)) // (doc_id % 30 + 1) AS frame_size,
        |         unnest(generate_series(1, CAST(doc_id % 30 + 1 AS INT), 5)) AS fi
        |  FROM documents)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |       CAST(frame_size * (fi - 1) AS BIGINT) AS frame_offset
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "x_skew_salted" ->
      """SELECT event_type AS key, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY key""".stripMargin,
    "x_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
        |CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
        |CAST(doc_id % 30 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the resized CONTENT is pinned, not just its size: the corpus is
    // ASCII (chars = bytes), so every-2nd-byte equals every-2nd-char
    // and DuckDB can rebuild the resized string and hash it
    "x_mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    octet_length(encode(text)) % 640 + 1 AS w,
        |    (octet_length(encode(text)) * 7) % 480 + 1 AS h,
        |    md5(array_to_string(
        |      [text[i] for i in range(1, octet_length(encode(text)) + 1, 2)],
        |      '')) AS out_md5
        |  FROM documents)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST((w + 1) // 2 AS INT) AS out_width,
        |  CAST((h + 1) // 2 AS INT) AS out_height,
        |  CAST(n AS BIGINT) AS n_bytes,
        |  CAST((n + 1) // 2 AS BIGINT) AS out_bytes, out_md5
        |FROM m ORDER BY doc_id""".stripMargin,
    "x_mm_features" ->
      """SELECT doc_id,
        |  (octet_length(encode(text)) * 1) % 1000 / 1000.0 AS f0,
        |  (octet_length(encode(text)) * 2) % 1000 / 1000.0 AS f1,
        |  (octet_length(encode(text)) * 3) % 1000 / 1000.0 AS f2,
        |  (octet_length(encode(text)) * 4) % 1000 / 1000.0 AS f3,
        |  (octet_length(encode(text)) * 5) % 1000 / 1000.0 AS f4,
        |  (octet_length(encode(text)) * 6) % 1000 / 1000.0 AS f5,
        |  (octet_length(encode(text)) * 7) % 1000 / 1000.0 AS f6,
        |  (octet_length(encode(text)) * 8) % 1000 / 1000.0 AS f7
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The expected table is a CONSTANT of the fixture seeds: real
    // javax.imageio decode + nearest-neighbor resample of synthesized
    // PNGs is pixel-exact across JVMs (TYPE_INT_RGB getRGB), so the
    // decoded dimensions and resized-raster md5s below were computed
    // once and pinned — the oracle hash-checks the real decoder without
    // DuckDB needing a PNG codec.
    "x_mm_decode_real" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(out_width AS BIGINT) AS out_width,
        |  CAST(out_height AS BIGINT) AS out_height, reencoded, out_md5
        |FROM (VALUES
        |  (0, 3, 2, 2, 1, true, '3f352fe885bc092c076d3ab1bf7fcf58'),
        |  (1, 4, 3, 2, 2, true, '897dcb555c14de0a626ef3ce76930092'),
        |  (2, 5, 4, 3, 2, true, 'd2492527647ed6ba33297f5940a7bb7c'),
        |  (3, 6, 5, 3, 3, true, '5a54a67de15930e317193baf83792bf4'),
        |  (4, 7, 6, 4, 3, true, '0b9834f760797f325117d8b1f1e9786e'),
        |  (5, 3, 7, 2, 4, true, 'fcf68174bf656df2e70591cc3b029d27'),
        |  (6, 4, 8, 2, 4, true, 'a23aa6f7e21a07b3302ec93b3112bcfc'),
        |  (7, 5, 2, 3, 1, true, 'de2f4fc4835a2385f9cbe0d0debc5cf6'),
        |  (8, 6, 3, 3, 2, true, 'add798371b98cd3eb5916a62a1ab18aa'),
        |  (9, 7, 4, 4, 2, true, '3129db51dfa851c7844b2fa501178cc7'),
        |  (10, 3, 5, 2, 3, true, 'a03f78b4d408ed0c5e7aa57473fb78f2'),
        |  (11, 4, 6, 2, 3, true, 'fcaff251005065e6456eeb34eabe2656'),
        |  (12, 5, 7, 3, 4, true, '4f5b9fc081261b66b129abe24e5ffe8d'),
        |  (13, 6, 8, 3, 4, true, '05563de2f8e8e35768328d80636a0eff'),
        |  (14, 7, 2, 4, 1, true, 'da1010a9e00fc5e55d7f42b86714bd10'),
        |  (15, 3, 3, 2, 2, true, '44eb9bd93f0060ce8afdef2124587750'),
        |  (16, 4, 4, 2, 2, true, '85ad4b66be13268f10588ff0bb70a329'),
        |  (17, 5, 5, 3, 3, true, '24e0f59951987cf42d0b443ecd136dd6'),
        |  (18, 6, 6, 3, 3, true, '4ed5e772a367aae0ef121acd97e5f073'),
        |  (19, 7, 7, 4, 4, true, '3d2f00d37ef229766555b8c91d24f449')
        |) AS t(doc_id, width, height, out_width, out_height, reencoded, out_md5)
        |ORDER BY doc_id""".stripMargin,
  )
}
