package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (north-star extensions): token counting, quality scoring, language ID,
  * fingerprinting. All pure column expressions — one parquet scan, no
  * UDFs, fully codegen'd, trivially parallel at 100 TB.
  */
object TextAnalysis {

  /** Count of regex matches in a column (codegen'd; no array
    * materialization cost beyond the match list). */
  private def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern)))

  /** Token counting: whitespace tokens plus a BPE-ish segmentation
    * (letter runs / digit runs / single punctuation), the standard cheap
    * proxy for subword token counts. */
  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      matchCount(col("text"), "(\\S+)").as("n_ws_tokens"),
      matchCount(lower(col("text")), "([a-z]+|[0-9]+|[^a-z0-9\\s])").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  private val stopwordPattern = "\\b(the|a|of|and|to|in|is)\\b"

  /** Quality scoring: length/token/stopword-ratio heuristics (the usual
    * pre-training filters, e.g. C4-style). Ratios rounded for oracle
    * stability. */
  def qualityScores(s: SparkSession, d: String): DataFrame = {
    val t = lower(col("text"))
    val nTokens = matchCount(t, "(\\S+)")
    val nStop = matchCount(t, s"($stopwordPattern)")
    val nAlpha = matchCount(t, "([a-z])")
    val df = Tables.documents(s, d).select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      round(length(regexp_replace(t, "\\s", "")).cast("double") / nTokens, 3)
        .as("avg_token_len"),
      round(nStop.cast("double") / nTokens, 3).as("stopword_ratio"),
      round(nAlpha.cast("double") / length(col("text")), 3).as("alpha_ratio"))
    df.withColumn("keep",
      (col("n_tokens") >= 5) && (col("n_tokens") <= 100000) &&
        (col("stopword_ratio") > 0.001) && (col("avg_token_len") < 12))
      .orderBy(col("doc_id"))
  }

  /** Stopword-profile language ID (n-gram-free heuristic: count hits of
    * per-language function-word sets; argmax with a fixed tie order). */
  def langId(s: SparkSession, d: String): DataFrame = {
    val t = lower(col("text"))
    val en = matchCount(t, "(\\b(the|a|of|and|to|in|is)\\b)")
    val de = matchCount(t, "(\\b(der|die|und|das|ist|nicht)\\b)")
    val es = matchCount(t, "(\\b(el|la|de|que|y|los)\\b)")
    val fr = matchCount(t, "(\\b(le|la|de|et|les|des)\\b)")
    Tables.documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("en_score"), de.as("de_score"), es.as("es_score"), fr.as("fr_score"))
      .withColumn("predicted",
        when(greatest(col("en_score"), col("de_score"), col("es_score"),
          col("fr_score")) === 0, "und")
          .when(col("en_score") >= col("de_score") &&
            col("en_score") >= col("es_score") &&
            col("en_score") >= col("fr_score"), "en")
          .when(col("de_score") >= col("es_score") &&
            col("de_score") >= col("fr_score"), "de")
          .when(col("es_score") >= col("fr_score"), "es")
          .otherwise("fr"))
      .orderBy(col("doc_id"))
  }

  /** Canonical-form document fingerprint: md5 of the whitespace-collapsed
    * lowercased text. The exact-dedup key (D5-style tag-and-split happens
    * on groupBy of this column). */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .orderBy(col("doc_id"))

  /** Rolling-hash winnowing fingerprints (custom codegen'd expression):
    * per-document selected-hash counts plus the fingerprint array size —
    * the substring-overlap detector that md5/SimHash can't provide. */
  def winnowFingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      graft.functions.Winnow(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("n_hashes"),
        // a stable digest of the fingerprint set for rows-only checking
        xxhash64(to_json(struct(col("fp")))).as("fp_digest"))
      .orderBy(col("doc_id"))
}
