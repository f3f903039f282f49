package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("bm25TopK matches an independent driver-side BM25 over production tokens") {
    val got = Retrieval.bm25TopK(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // independent recompute: plain Scala collections off the raw corpus
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), CorpusPrep.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
    val (qdocs, cdocs) = toks.partition(_._1 % 97 == 0)
    val postings = cdocs.map { case (id, t) =>
      id -> t.groupBy(identity).view.mapValues(_.size.toLong).toMap }.toMap
    val dl = postings.view.mapValues(_.values.sum).toMap
    val n = dl.size.toDouble
    val avgdl = dl.values.sum.toDouble / n
    val dfm = postings.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (k1, b) = (1.2, 0.75)
    val expected = qdocs.flatMap { case (qid, qt) =>
      val qs = qt.distinct
      postings.toSeq.flatMap { case (did, tfm) =>
        // only pairs sharing >= 1 term exist in the operator's join
        val terms = qs.flatMap(t => tfm.get(t).map(tf => (t, tf)))
        if (terms.isEmpty) None
        // per-term HALF_UP fixed-pointing BEFORE the sum, mirroring the
        // operator: the aggregate is integer, hence order-insensitive
        else Some((qid, did, terms.map { case (t, tf) =>
          val df = dfm(t)
          BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl(did) / avgdl)) * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum))
      }.sortBy { case (_, did, s) => (-s, did) }.take(3).zipWithIndex
        .map { case ((q, did, s), i) => (q, i + 1L, did, s) }
    }.toSet
    assert(got.toSet == expected,
      s"extra=${(got.toSet -- expected).take(3)} " +
        s"missing=${(expected -- got.toSet).take(3)}")
  }

  test("bm25TopK ranks a planted near-copy of the query first") {
    // query = doc 0 (0 % 97 == 0); doc 1 repeats all query terms, doc 3
    // shares one, doc 2 shares none
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "zeta eta theta iota"),
      (3L, "alpha kappa lambda mu")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25fx").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fx = Retrieval.bm25TopK(spark, tmp)
      .as[(Long, Long, Long, Long)].collect()
    assert(fx.map(_._1).distinct.sameElements(Array(0L)), fx.mkString(","))
    assert(fx.length == 2, fx.mkString(","))
    assert((fx(0)._2, fx(0)._3) == ((1L, 1L)), fx.mkString(","))
    assert((fx(1)._2, fx(1)._3) == ((2L, 3L)), fx.mkString(","))
    assert(!fx.exists(_._3 == 2L))
  }
}
