package graft.ops

import graft.functions.CosineSimilarity
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

  /** Random-hyperplane LSH bucketing + exact re-score: candidates for a
    * query are exactly the corpus rows with the same `nPlanes`-bit sign
    * signature; each bucket is re-scored with the native expression.
    * Returns per-query top-k within its bucket.
    *
    * Hyperplanes are deterministic pseudo-random: component h of plane p
    * is seeded murmur3 `hash(p, h)` mapped to [-0.5, 0.5) — stable across
    * runs and executors with no RNG state to ship. */
  def lshTopK(s: SparkSession, d: String, nQueries: Int = 8, k: Int = 5,
      nPlanes: Int = 8): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // signature bit p = sign(<embedding, plane_p>)
    val sigBits = (0 until nPlanes).map { p =>
      val weights = transform(sequence(lit(0), size(col("embedding")) - 1),
        h => hash(lit(p), h).cast("double") / lit(4294967296.0))
      val dot = aggregate(
        zip_with(col("embedding"), weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    val signed = emb.select(col("vec_id"), col("embedding"),
      sigBits.reduce(_.bitwiseOR(_)).as("sig"))
    val queries = signed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("sig"))
    val cands = signed
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("sig"))
    val scored = cands.join(broadcast(queries), Seq("sig"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(CosineSimilarity(col("qe"), col("ce")), 4).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }
}
