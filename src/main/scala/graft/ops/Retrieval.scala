package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring (extension operators): rank corpus documents
  * against a query set — the curation primitive behind "find training
  * documents similar to this eval/seed set" and lexical-retrieval
  * baselines beside the embedding ANN operators in [[Similarity]]. */
object Retrieval {

  /** BM25 top-`k` corpus documents per query (Robertson–Walker, TREC-3).
    * The query set is the deterministic `doc_id % 97 == 0` slice (the
    * [[CorpusPrep.decontaminate]] eval-slice convention); every other
    * document is corpus. Query terms enter as a distinct set (standard
    * unweighted-query BM25);
    * `idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))` (the non-negative
    * RSJ form), term saturation `tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))`
    * with the usual k1 = 1.2, b = 0.75. Scores report in integer
    * milli-units (the fixed-point oracle precedent) and the per-query
    * top-k ranks on (score_milli DESC, doc_id) — an integer total order,
    * identical on both engine and oracle.
    *
    * Shape at scale: ONE corpus pass builds the inverted index —
    * (doc_id, term, tf) postings — which is checkpointed: materializing
    * the index once and deriving document lengths, document frequencies,
    * the query-term table, and the totals FROM it is the standard
    * index-build shape (the alternative inlines the corpus subtree into
    * all five consumers). Postings join query terms as a term equi-join
    * with no forced broadcast (a query set can be arbitrarily large; AQE
    * promotes when it fits), the (query, doc) partial sums aggregate
    * map-side, and the top-k is a per-query window over k·|queries|
    * candidates — never a global sort. The two 1-row totals (N, avgdl)
    * are forced broadcast. */
  def bm25TopK(s: SparkSession, d: String, k: Int = 3,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = Tables.documents(s, d)
      .select(col("doc_id"), explode(CorpusPrep.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val qterms = postings.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("query_id"), col("term"))
    val corpus = postings.filter(col("doc_id") % 97 =!= 0)
    val dl = corpus.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
    // postings rows are unique per (doc_id, term) by construction, so a
    // plain count IS the document frequency — countDistinct would add a
    // second dedup aggregation over the largest table for nothing
    val df = corpus.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val totals = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    corpus
      .join(qterms, "term")
      .join(df, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .select(col("query_id"), col("doc_id"),
        // constants stay as the LITERALS (k1 + 1, 1 - b evaluated as
        // double ops, not Scala-folded): the oracle writes the same
        // expressions, so both engines round identically at every step.
        // Each per-term weight fixed-points to integer milli-units BEFORE
        // the sum: the aggregate is then exact integer arithmetic —
        // order-insensitive under any partitioning (a double sum rounded
        // after the fact could flip at a .0005 boundary depending on
        // scan order, silently breaking the hash gate)
        round(log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) +
            lit(b) * col("dl") / col("avgdl"))) * 1000)
          .cast("long").as("w_milli"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_milli")).as("score_milli"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_milli").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_milli"))
      .orderBy(col("query_id"), col("rank"))
  }
}
