package graft

import graft.functions.{CosineSimilarity, ShingleHashes, SimHash64, Winnow}
import graft.rdf.ParseNTriple
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text)…")`
  * works next to the Column API.
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)                       // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n,
      s"$name expects $n argument(s), got ${args.length}")
    args
  }

  /** The registration list itself — public so specs can install exactly
    * these builders (name, info, builder) into a live registry and
    * exercise the SAME code the config-based extension path injects. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash document fingerprint."),
      (args: Seq[Expression]) => SimHash64(arity("simhash64", 1)(args).head)),
    (FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "cosine_similarity(a, b) - cosine similarity of two float or double " +
          "arrays (per-side element width, double accumulation)."),
      (args: Seq[Expression]) => {
        val a = arity("cosine_similarity", 2)(args); CosineSimilarity(a(0), a(1))
      }),
    (FunctionIdentifier("parse_ntriple"),
      info("parse_ntriple",
        "parse_ntriple(line) - parse an N-Triples line into a quad struct."),
      (args: Seq[Expression]) => ParseNTriple(arity("parse_ntriple", 1)(args).head)),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text) - distinct word-3-gram xxhash64 shingle hashes."),
      (args: Seq[Expression]) =>
        ShingleHashes(arity("shingle_hashes", 1)(args).head, 3)),
    (FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint",
        "winnow_fingerprint(text) - winnowing rolling-hash fingerprint set."),
      (args: Seq[Expression]) =>
        Winnow(arity("winnow_fingerprint", 1)(args).head, 5, 4)),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, fp) - probe a serialized bloom filter " +
          "(binary literal, putLong-built) with a long fingerprint; " +
          "false means certainly absent."),
      (args: Seq[Expression]) => {
        val a = arity("bloom_might_contain", 2)(args)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(a(0), a(1))
      }),
    (FunctionIdentifier("js_date_reformat"),
      info("js_date_reformat",
        "js_date_reformat(value) - reformat a date lexical form the way " +
          "the reference repair stage's JS `new Date` round-trip does " +
          "(node-corpus-pinned emulation); NULL for Invalid Date."),
      (args: Seq[Expression]) =>
        graft.rdf.JsDateReformat(arity("js_date_reformat", 1)(args).head,
          withTime = false)),
    (FunctionIdentifier("js_datetime_reformat"),
      info("js_datetime_reformat",
        "js_datetime_reformat(value) - dateTime twin of js_date_reformat " +
          "(unpadded H:m:s tail, fixTriple.js:197-214)."),
      (args: Seq[Expression]) =>
        graft.rdf.JsDateReformat(arity("js_datetime_reformat", 1)(args).head,
          withTime = true)))

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}
