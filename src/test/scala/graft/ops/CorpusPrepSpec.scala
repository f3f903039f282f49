package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-preparation operator invariants (decontamination, PII, caps,
  * sampling, TF-IDF, n-gram stats). Assertions are relational properties
  * that hold at any scale factor, not pinned row values. */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  /** Per-doc distinct gram sets via the operator's OWN tokenizer/gram
    * builder (private[ops]) — the spec's brute-force oracle can't drift
    * from the operator's gram semantics. */
  private def gramSets(dir: String, n: Int) = Tables.documents(spark, dir)
    .select(col("doc_id"), CorpusPrep.tokens(col("text")).as("t"))
    .select(col("doc_id"),
      array_distinct(CorpusPrep.wordGrams(col("t"), n)).as("grams"))

  test("tokens/wordGrams match a hand-written fixture (independent of production code)") {
    // the other oracles in this suite reuse the production helpers, so
    // this literal fixture is the in-suite independent check of gram
    // construction itself (an off-by-one here can't hide behind reuse)
    val rows = Seq("a b  c d e", " x ", "p q", "").toDF("text")
      .select(CorpusPrep.tokens(col("text")).as("t"))
      .select(col("t"),
        CorpusPrep.wordGrams(col("t"), 2).as("g2"),
        CorpusPrep.wordGrams(col("t"), 4).as("g4"))
      .as[(Seq[String], Seq[String], Seq[String])].collect()
    assert(rows(0) == ((Seq("a", "b", "c", "d", "e"),
      Seq("a b", "b c", "c d", "d e"), Seq("a b c d", "b c d e"))))
    assert(rows(1) == ((Seq("x"), Nil, Nil)))
    assert(rows(2) == ((Seq("p", "q"), Seq("p q"), Nil)))
    assert(rows(3) == ((Nil, Nil, Nil)))
  }

  test("decontaminate returns exactly the train×eval pairs sharing >=2 distinct 4-grams") {
    // sf0.01's eval slice yields a single boundary pair — also assert at
    // sf0.001 where near-identical planted docs give high-count pairs,
    // so the join/threshold logic is exercised away from the boundary.
    var sf001Pairs = Set.empty[(Long, Long, Long)]
    for (dir <- Seq(sf, "/root/testdata/sf0.001")) {
      val g = gramSets(dir, 4)
      val ev = g.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("grams").as("eg"))
      val tr = g.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id").as("train_id"), col("grams").as("tg"))
      // brute-force oracle: small cross join (|eval| is tiny by construction)
      val expected = tr.crossJoin(ev)
        .select(col("train_id"), col("eval_id"),
          size(array_intersect(col("tg"), col("eg"))).as("n"))
        .filter(col("n") >= 2)
        .select(col("train_id"), col("eval_id"), col("n").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      val got = CorpusPrep.decontaminate(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected,
        s"$dir: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
      assert(got.nonEmpty, s"$dir: eval slice should be contaminated")
      if (dir.endsWith("sf0.001")) sf001Pairs = got
    }
    // the non-boundary case really occurred: sf0.001 has pairs well above
    // the minShared=2 threshold
    assert(sf001Pairs.exists(_._3 >= 5),
      "expected at least one high-overlap contamination pair")
  }

  test("stored decon index probe matches the in-memory pipeline; eval slice never re-read") {
    val got = CorpusPrep.deconStoredQuery(spark, sf)
    assert(got.collect().toSeq ===
      CorpusPrep.decontaminate(spark, sf).collect().toSeq)
    // serving contract: the probe re-tokenizes ONLY the training corpus —
    // exactly one documents scan; the eval grams come from the store
    val scans = got.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("documents.parquet")) => f
    }
    assert(scans.size == 1,
      s"probe must scan documents exactly once (training side), got ${scans.size}")
    assert(got.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("decon-store")) => f
    }.nonEmpty, "probe does not read the stored eval-gram index")
  }

  test("piiRedact finds exactly the planted PII and leaves clean docs byte-identical") {
    val red = CorpusPrep.piiRedact(spark, sf)
    val joined = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("orig_md5"))
      .join(red, "doc_id")
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        (col("red_md5") === col("orig_md5")).as("untouched"))
      .as[(Long, Int, Int, Boolean)].collect()
    joined.foreach { case (id, ne, np, untouched) =>
      assert(ne == (if (id % 5 == 0) 1 else 0), s"doc $id emails=$ne")
      assert(np == (if (id % 7 == 0) 1 else 0), s"doc $id phones=$np")
      // clean docs pass through byte-identical; planted ones must change
      assert(untouched == (id % 5 != 0 && id % 7 != 0), s"doc $id")
    }
  }

  test("domainCap keeps the k smallest doc_ids per source with contiguous ranks") {
    val k = 10
    val capped = CorpusPrep.domainCap(spark, sf, k)
    val bad = capped.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"))
      .filter(col("n") > k || col("n") =!= col("maxrk")).count()
    assert(bad == 0, "ranks must be 1..n<=k per source")
    // every kept doc_id must be <= the k-th smallest id of its source
    val viaSort = Tables.documents(spark, sf)
      .groupBy("source").agg(slice(sort_array(collect_list("doc_id")), 1, k).as("ids"))
      .select(col("source"), explode(col("ids")).as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    val got = capped.select("doc_id").as[Long].collect().toSet
    assert(got == viaSort)
  }

  test("stratifiedSample is deterministic and close to the 3/16 target rate") {
    val a = CorpusPrep.stratifiedSample(spark, sf).collect()
    val b = CorpusPrep.stratifiedSample(spark, sf).collect()
    assert(a.sameElements(b), "hash sampling must be run-independent")
    val (tot, samp) = a.map(r => (r.getLong(1), r.getLong(2)))
      .reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    val rate = samp.toDouble / tot
    assert(rate > 0.10 && rate < 0.28, s"overall rate $rate vs expected 0.1875")
  }

  test("tfIdfTopTerms emits k descending-scored terms per doc") {
    val top = CorpusPrep.tfIdfTopTerms(spark, sf, 3)
    val perDoc = top.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // rn is 1..3 and scores are non-increasing in rn order
    val viol = top.as("a").join(top.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rn") < col("b.rn") &&
          col("a.score") < col("b.score")).count()
    assert(viol == 0, "scores must be non-increasing with rank")
    assert(perDoc.filter(col("n") =!= 3).count() == 0, "3 terms per doc")
    assert(top.filter(col("score") < 0).count() == 0, "ln(N/df) >= 0 since df <= N")
  }

  test("approx length quantiles track the exact percentiles within sketch error") {
    val exact = CorpusPrep.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    CorpusPrep.lengthQuantilesApprox(spark, sf).collect().foreach { r =>
      val approx = Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      exact(r.getString(0)).zip(approx).foreach { case (e, a) =>
        // accuracy 10000 → rank error ≤ 1/10000: on these group sizes the
        // sketch is exact up to interpolation; allow a loose 10% band
        assert(math.abs(a - e) <= math.max(1.0, e * 0.1),
          s"lang=${r.getString(0)} exact=$e approx=$a")
      }
    }
    // the >accuracy regime: accuracy 50 over sf's largest group forces
    // compression — values must still land within the rank-error band
    // of the exact percentile values (here: within the observed range)
    val lo = CorpusPrep.lengthQuantilesApproxAt(spark, sf, accuracy = 50)
      .collect()
    lo.foreach { r =>
      val approx = Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(approx == approx.sorted, s"quantiles must be monotone: $approx")
    }
  }

  test("incremental dedup finds exactly the equal-text pairs; bloom really prunes") {
    val docs = Tables.documents(spark, sf)
    // derive the expected relation from the DATA (equal-text join), not
    // from the planted arithmetic alone: sf0.1's prior corpus contains
    // duplicate-text groups, so verbatim re-arrivals also match their
    // prior doubles (the oracle rule: state the exact relation)
    val newb = docs.select((col("doc_id") + 200000L).as("new_id"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v2"))).as("text"))
    val expected = newb.join(docs, Seq("text"))
      .select(col("new_id"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    val planted = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 200000L).as("new_id"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(planted.subsetOf(expected), "every verbatim re-arrival must match")
    val got = Dedup.incrementalDedup(spark, sf).as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    // the bloom prefilter must do its job: at fpp=3% only re-arrivals
    // plus ~3% of modified docs may pass, far below the full batch
    val prior = docs.select(xxhash64(col("text")).as("fp"))
    val bloom = prior.stat.bloomFilter("fp", 1000L.max(docs.count()), 0.03)
    val batchFps = docs.select(
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(col("text"), lit(" v2"))).as("text"))
      .select(xxhash64(col("text")).as("fp")).as[Long].collect()
    val candidates = batchFps.count(bloom.mightContainLong)
    assert(candidates < batchFps.length * 0.5,
      s"bloom passed $candidates of ${batchFps.length}")
    assert(candidates >= expected.size, "no false negatives allowed")
  }

  test("stored incremental-dedup index probe matches the in-memory pipeline") {
    val got = Dedup.incrDedupStoredQuery(spark, sf)
    assert(got.collect().toSeq ===
      Dedup.incrementalDedup(spark, sf).collect().toSeq)
    // serving contract: prior text is never re-hashed — the probe reads
    // fingerprints from the store, so it scans documents strictly fewer
    // times than the in-memory twin (which derives priorFp from text)
    def docScans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("documents.parquet")) => f
      }.size
    assert(docScans(got) < docScans(Dedup.incrementalDedup(spark, sf)),
      "stored probe must not re-derive prior fingerprints from text")
    assert(got.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("dedupincr-store")) => f
    }.nonEmpty, "probe does not read the stored fingerprint index")
  }

  test("stored twins match their in-memory pipelines on an eval-less corpus (empty index)") {
    // doc_ids 1..50 contain no multiple of 97 → the eval slice is empty,
    // the stored gram index has no data files, and the probe must return
    // empty like the in-memory twin (schema inference over a file-less
    // partitioned dir would throw instead — the explicit-schema reads)
    val dir = graft.Scaffold.cleanupOnExit(java.nio.file.Files
      .createTempDirectory("graft-decon-empty").toString)
    (1 to 50).map(i => (i.toLong, s"alpha beta gamma delta epsilon doc $i", "en", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(CorpusPrep.decontaminate(spark, dir).count() === 0)
    assert(CorpusPrep.deconStoredQuery(spark, dir).count() === 0)
    // the dedup stored twin over the same tiny corpus: every 3rd doc
    // re-arrives verbatim, so both paths agree and are non-empty
    assert(Dedup.incrDedupStoredQuery(spark, dir).collect().toSeq ===
      Dedup.incrementalDedup(spark, dir).collect().toSeq)
  }

  test("packSequences reproduces an exact sequential greedy fold per group") {
    val cap = 512; val gsz = 100
    val got = CorpusPrep.packSequences(spark, sf, cap, gsz)
      .select("doc_id", "grp", "bin", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // independent greedy recompute on the driver from (doc_id, n_tokens)
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(CorpusPrep.tokens(col("text"))).cast("long").as("nt"))
      .as[(Long, Long)].collect().toMap
    val expected = toks.keys.toSeq.sorted.groupBy(_ / gsz).flatMap {
      case (grp, ids) =>
        var bin = 0L; var run = 0L
        ids.map { id =>
          val nt = toks(id)
          if (run + nt > cap && run > 0) { bin += 1; run = nt }
          else run += nt
          (id, grp, bin, nt)
        }
    }.toSet
    assert(got.length == toks.size, "one row per document")
    assert(got.toSet == expected,
      s"first diff: ${(got.toSet -- expected).take(3)}")
    // capacity invariant: a bin exceeds cap only as a single oversized doc
    got.groupBy(r => (r._2, r._3)).foreach { case ((g, b), rows) =>
      assert(rows.map(_._4).sum <= cap || rows.size == 1,
        s"grp $g bin $b overfilled with ${rows.size} docs") }
    // the fold actually overflowed (bins beyond 0 exist)
    assert(got.map(_._3).max >= 1, "expected multiple bins per group")
  }

  test("qualityGate metrics recompute exactly and verdicts are self-consistent") {
    val rows = CorpusPrep.qualityGate(spark, sf).collect()
    def r3(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rows.length == texts.size)
    var fired = Set.empty[String]
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = texts(id).split("\\s+").filter(_.nonEmpty)
      // independent driver-side recompute of every metric
      assert(r.getAs[Int]("n_tokens") == w.length, s"doc $id n_tokens")
      assert(r.getAs[Double]("mean_word_len") ==
        r3(w.map(_.length).sum.toDouble / w.length), s"doc $id mwl")
      val g2 = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val dup2 = if (g2.isEmpty) 0.0
        else r3((g2.size - g2.distinct.size).toDouble / g2.size)
      assert(r.getAs[Double]("dup_2gram_frac") == dup2, s"doc $id dup2")
      assert(r.getAs[Boolean]("has_stopwords") ==
        (w.contains("the") && w.contains("a")), s"doc $id stopwords")
      // verdict consistency: pass <=> no reasons, reasons match the metrics
      val reasons = Seq(
        if (dup2 > 0.05) Some("dup_2gram") else None,
        if (r.getAs[Double]("mean_word_len") < 3.0 ||
          r.getAs[Double]("mean_word_len") > 10.0) Some("mean_word_len") else None,
        if (!r.getAs[Boolean]("has_stopwords")) Some("stopwords") else None,
        if (w.length < 40 || w.length > 100000) Some("word_count") else None
      ).flatten
      assert(r.getAs[Boolean]("pass") == reasons.isEmpty, s"doc $id pass")
      assert(r.getAs[String]("fail_reasons") == reasons.mkString(","),
        s"doc $id reasons")
      fired ++= reasons
    }
    // the corpus must exercise the gate: passes, fails, and at least the
    // three rules that can fire on this vocabulary (mean_word_len is
    // documented as structurally inert here)
    assert(rows.exists(_.getAs[Boolean]("pass")))
    assert(Set("dup_2gram", "stopwords", "word_count").subsetOf(fired),
      s"rules that fired: $fired")
  }

  test("temperatureMix recomputes exactly and flattens the language mixture") {
    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val before = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val nMin = before.values.min
    val kf = before.map { case (l, n) => l -> math.sqrt(nMin.toDouble / n) }
    val kept = docs.filter { case (id, l) =>
      ((id * 2654435761L) % 100000L).toDouble / 100000.0 < kf(l) }
      .groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val totB = before.values.sum; val totK = kept.values.sum
    val expected = before.keys.map { l =>
      (l, before(l), kept(l), r4(kf(l)),
        r4(before(l).toDouble / totB), r4(kept(l).toDouble / totK))
    }.toSet
    val got = CorpusPrep.temperatureMix(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // the rarest language is kept in full; the mixture flattens (max share
    // shrinks, min share grows — the point of temperature sampling)
    val minLang = before.minBy(_._2)._1
    assert(kf(minLang) == 1.0 && kept(minLang) == before(minLang))
    val shB = before.map { case (l, n) => n.toDouble / totB }
    val shA = kept.map { case (l, n) => n.toDouble / totK }
    assert(shA.max < shB.max && shA.min > shB.min,
      s"before=[${shB.min},${shB.max}] after=[${shA.min},${shA.max}]")
  }

  test("chunkDedup reproduces exact first-occurrence chunk accounting") {
    // sf0.001 has near-identical doc pairs → real cross-doc dup chunks
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // driver-side ground truth on chunk STRINGS (md5 is an engine detail)
    val chunks = texts.flatMap { case (id, txt) =>
      val w = txt.split("\\s+").filter(_.nonEmpty)
      w.grouped(10).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" "), c.length.toLong) }
    }
    val firstOcc = chunks.groupBy(_._3).map { case (_, occ) =>
      occ.minBy(o => (o._1, o._2)) }.toSet
    val expected = chunks.groupBy(_._1).map { case (id, cs) =>
      val kept = cs.filter(firstOcc.contains)
      (id, cs.length.toLong, (cs.length - kept.length).toLong,
        kept.map(_._4).sum)
    }.toSet
    val got = CorpusPrep.chunkDedup(spark, d)
      .select("doc_id", "n_chunks", "n_dup_chunks", "kept_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    assert(got.map(_._3).sum > 0, "corpus should exercise cross-doc dup chunks")
    assert(got.exists(_._3 == 0), "and some docs must be fully novel")
  }

  test("unigramLmScore recomputes exactly from driver-side unigram counts") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val docs = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty) }
    val counts = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val total = counts.values.sum.toDouble
    // same quantization as the operator: round-half-up to integer
    // millibits per word, then exact integer sums
    val millibits = counts.map { case (w, c) =>
      w -> BigDecimal(math.log(c / total) / math.log(2.0) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }
    def r3(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, w) =>
      val s = w.map(millibits).sum
      (id, w.length.toLong, s, r3(-s.toDouble / (w.length * 1000.0)))
    }.toSet
    val got = CorpusPrep.unigramLmScore(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // the signal discriminates: scores vary across the corpus
    assert(got.map(_._4).size > 1)
  }

  test("shuffleShards is an exact deterministic permutation into 16 shards") {
    val ids = Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val digests = ids.map(id => id -> md5hex(s"42:$id"))
    val expected = digests.groupBy { case (_, h) =>
      "0123456789abcdef".indexOf(h.head).toLong }.toSeq.flatMap {
      case (shard, members) =>
        members.sortBy { case (id, h) => (h, id) }.zipWithIndex.map {
          case ((id, _), i) => (id, shard, i + 1L) }
    }.toSet
    val got = CorpusPrep.shuffleShards(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // all 16 shards populated; per-shard positions are contiguous 1..n
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet == (0L until 16L).toSet)
    byShard.foreach { case (sh, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq,
        s"shard $sh positions not contiguous") }
    // a different seed produces a different order
    val reseeded = CorpusPrep.shuffleShards(spark, sf, seed = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(reseeded != got)
  }

  test("topNgrams agrees with a direct recount of its reported grams") {
    val top = CorpusPrep.topNgrams(spark, sf, 2, 20).as[(String, Long)].collect()
    assert(top.length == 20)
    assert(top.map(_._2).sliding(2).forall(w => w(0) >= w(1)), "counts descending")
    // recount WITHOUT per-doc dedup (occurrence counts, not doc frequency)
    val all = Tables.documents(spark, sf)
      .select(CorpusPrep.tokens(col("text")).as("t"))
      .select(explode(CorpusPrep.wordGrams(col("t"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    top.foreach { case (gram, n) => assert(all(gram) == n, s"count mismatch for '$gram'") }
  }

  test("splitAssign matches a JVM md5 oracle and is stable under corpus growth") {
    val ids = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    val expected = ids.map { id =>
      val b = md5hex(id.toString).substring(0, 2)
      (id, b, if (b < "e6") "train" else if (b < "f3") "val" else "test")
    }.toSet
    val got = CorpusPrep.splitAssign(spark, sf)
      .as[(Long, String, String)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // roughly 90/5/5 (wide bars at 500 docs); all three splits present
    val frac = got.groupBy(_._3).view.mapValues(_.size.toDouble / ids.length)
    assert(frac("train") > 0.8 && frac("train") < 0.96, frac.toMap.toString)
    assert(frac.getOrElse("val", 0.0) > 0.0 && frac.getOrElse("test", 0.0) > 0.0)
    // growth stability: assignment is a pure function of doc_id — the
    // same doc gets the same split when computed over HALF the corpus
    val half = CorpusPrep.splitAssignOf(
      Tables.documents(spark, sf).filter(col("doc_id") % 2 === 0))
      .as[(Long, String, String)].collect().toSet
    assert(half == expected.filter(_._1 % 2 == 0))
  }

  test("weightedSample matches a JVM md5 oracle; weight boundaries behave") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val expected = docs.flatMap { case (id, nc) =>
      val h = md5hex(id.toString)
      val u = java.lang.Long.parseLong(h.substring(0, 2), 16)
      val cut = math.floor(256.0 * math.min(1.0, nc / 500.0)).toLong
      if (u < cut) Some((id, nc, u, cut)) else None
    }.toSet
    val got = CorpusPrep.weightedSample(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // boundary weights: w >= 1 always kept, w = 0 never kept
    val fx = CorpusPrep.weightedSampleOf(Seq(
      (1L, "", 500L), (2L, "", 9999L), (3L, "", 0L))
      .toDF("doc_id", "text", "n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(fx == Set(1L, 2L), fx.toString)
  }

  test("pmiBigrams recomputes exactly from driver-side counts; fixture pins the formula") {
    val top = CorpusPrep.pmiBigrams(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(top.length == 20)
    assert(top.map(_._3).sliding(2).forall(w => w(0) >= w(1)), "pmi descending")
    // brute-force driver recompute over production tokenization
    val uni = Tables.documents(spark, sf)
      .select(explode(CorpusPrep.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val bi = Tables.documents(spark, sf)
      .select(CorpusPrep.tokens(col("text")).as("t"))
      .select(explode(CorpusPrep.wordGrams(col("t"), 2)).as("g"))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val nUni = uni.values.sum.toDouble
    val nBi = bi.values.sum.toDouble
    // HALF_UP (away from zero), the convention BOTH engines use: Scala's
    // math.round is floor(x+0.5), which rounds an exact negative .5
    // millinat toward +inf and would make this driver oracle flaky even
    // when Spark and DuckDB agree
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = bi.collect { case (g, nab) if nab >= 5 =>
      val Array(a, b) = g.split(" ", 2)
      val pmi = halfUp(math.log((nab / nBi) /
        ((uni(a) / nUni) * (uni(b) / nUni))) * 1000)
      (g, nab, pmi)
    }.toSeq.sortBy(t => (-t._3, t._1)).take(20)
    assert(top.toSeq == expected,
      s"first diff: ${top.toSeq.zip(expected).find(p => p._1 != p._2)}")
    // literal fixture: "x y" ×6 docs, "p q" ×3, one 6-token filler doc →
    // 14 bigram occurrences, 24 tokens; only "x y" clears minCount=5.
    // P(x y)=6/14, P(x)=P(y)=6/24 → PMI = ln(6.857…) → 1926 millinats
    val docs = (Seq.fill(6)("x y") ++ Seq.fill(3)("p q") ++
      Seq("f1 f2 f3 f4 f5 f6")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fx = CorpusPrep.pmiBigramsOf(docs, k = 10, minCount = 5)
      .as[(String, Long, Long)].collect()
    assert(fx.toSeq == Seq(("x y", 6L,
      BigDecimal(math.log((6.0 / 14.0) / ((6.0 / 24.0) * (6.0 / 24.0))) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
  }

  test("qualityGate zero guard: whitespace-only and empty documents fail cleanly") {
    val passing = "the a " + (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, "   \t  "), (2L, ""), (3L, passing)).toDF("doc_id", "text")
    val byId = CorpusPrep.qualityGateOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = byId(id)
      assert(!r.anyNull, s"doc $id must not NULL-propagate: $r")
      assert(r.getAs[Double]("mean_word_len") == 0.0, s"doc $id mwl")
      assert(!r.getAs[Boolean]("pass"), s"doc $id must fail")
      assert(r.getAs[String]("fail_reasons").split(",").toSet
        == Set("mean_word_len", "stopwords", "word_count"), s"doc $id reasons")
    }
    assert(byId(3L).getAs[Boolean]("pass"), byId(3L).toString)
  }

  test("spanDedup matches a driver-side overlapping-window recompute") {
    // sf0.001 has near-identical doc pairs → real cross-doc duplicated
    // windows at arbitrary alignments (what chunkDedup's disjoint
    // chunks cannot see)
    val d = "/root/testdata/sf0.001"
    val w = 8
    val texts = Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect()
    // ground truth on window STRINGS (md5 keying is an engine detail)
    val docToks = texts.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty) }
    val wins = docToks.flatMap { case (id, toks) =>
      (0 to toks.length - w).map(p => (id, p, toks.slice(p, p + w).mkString(" "))) }
    val dup = wins.groupBy(_._3).collect { case (s, occ) if occ.length >= 2 => s }.toSet
    val expected = docToks.map { case (id, toks) =>
      val ps = wins.collect { case (`id`, p, s) if dup(s) => p }.sorted
      val covered = ps.zipAll(ps.drop(1).map(Some(_)), -1, None).map {
        case (p, Some(n)) => math.min(w, n - p).toLong
        case (_, None)    => w.toLong
      }.sum
      val n = toks.length.toLong
      (id, n, math.max(0, n - (w - 1)), ps.length.toLong, covered,
        if (n > 0) BigDecimal(covered.toDouble / n)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0)
    }.toSet
    val got = CorpusPrep.spanDedup(spark, d, w)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    assert(got.exists(_._4 > 0), "corpus should exercise duplicated windows")
    assert(got.exists(_._4 == 0), "and some docs must be fully novel")
  }

  test("spanDedup handles short docs, alignment shifts, and interval merging") {
    // doc 1 / doc 2 share an 8-token span at DIFFERENT alignments; doc 3
    // repeats it internally twice (overlapping coverage must merge, not
    // double-count); doc 4 is shorter than the window (0 windows); doc 5
    // is novel text
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"$span delta epsilon zeta"),
      (3L, s"$span $span"),
      (4L, "tiny doc only"),
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val got = CorpusPrep.spanDedupOf(docs, 8)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc1: 11 tokens, 4 windows, 1 dup (the span at pos 2) → 8 covered
    assert(got(1L) == ((1L, 11L, 4L, 1L, 8L, 0.727)))
    // doc2: 11 tokens, span at pos 0 → 8 covered of 11
    assert(got(2L) == ((2L, 11L, 4L, 1L, 8L, 0.727)))
    // doc3 "s1..s8 s1..s8": windows at pos 0 and 8 are the base span
    // (duplicated corpus-wide); pos 1..7 are rotations occurring once
    // each → not dup. Coverage min(8, 8-0) + 8 = 16 of 16 tokens — the
    // two overlapping-at-the-boundary intervals must merge, not sum to
    // more than the doc length.
    assert(got(3L) == ((3L, 16L, 9L, 2L, 16L, 1.0)))
    // doc4: 3 tokens → no windows
    assert(got(4L) == ((4L, 3L, 0L, 0L, 0L, 0.0)))
    // doc5: 10 tokens, 3 windows, none duplicated
    assert(got(5L) == ((5L, 10L, 3L, 0L, 0L, 0.0)))
  }
}
