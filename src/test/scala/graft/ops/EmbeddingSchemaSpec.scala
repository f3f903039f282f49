package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata-schema canary for the embeddings table, twin of
  * [[EventTimeSchemaSpec]]: the driver owns `embedding`'s element width,
  * and a regeneration shipping `array<double>` instead of `array<float>`
  * must not break the similarity/dedup family (every typed read is
  * `Array[Float]` — an un-normalized double column fails encoder
  * analysis). [[Tables.embeddings]] normalizes to float32 at the scan;
  * this spec pins that both widths load and produce identical results.
  */
class EmbeddingSchemaSpec extends graft.SparkSpec {

  // 12 deterministic 64-dim vectors; values exactly representable in
  // float32 (k/64) so the double→float cast is lossless and the two
  // encodings must agree EXACTLY, not just within rounding
  private val dim = 64
  private def vec(seed: Int): Seq[Float] =
    (0 until dim).map(j => (((seed * 31 + j * 7) % 64).toFloat / 64f))

  private def fixture(asDouble: Boolean): String = {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-emb-canary").toString)
    val base = (0 until 12).map(i => (i.toLong, vec(i), i % 3))
      .toDF("vec_id", "embedding", "label")
    val df = if (asDouble)
      base.withColumn("embedding",
        col("embedding").cast("array<double>"))
    else base
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val floatDir = fixture(asDouble = false)
  private lazy val doubleDir = fixture(asDouble = true)

  test("fixtures carry the two distinct element widths; loader normalizes both to float32") {
    assert(spark.read.parquet(s"$floatDir/embeddings.parquet")
      .schema("embedding").dataType === ArrayType(FloatType, true))
    assert(spark.read.parquet(s"$doubleDir/embeddings.parquet")
      .schema("embedding").dataType === ArrayType(DoubleType, true))
    for (d <- Seq(floatDir, doubleDir))
      assert(Tables.embeddings(spark, d).schema("embedding").dataType ===
        ArrayType(FloatType, true), s"loader did not normalize $d")
  }

  test("brute-force top-k is element-width-invariant") {
    val a = Similarity.bruteForceTopK(spark, floatDir, nQueries = 4, k = 3)
      .collect().toSeq
    val b = Similarity.bruteForceTopK(spark, doubleDir, nQueries = 4, k = 3)
      .collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("cosine near-dup pairs are element-width-invariant") {
    val a = Dedup.embedCosinePairs(spark, floatDir, topN = 10)
      .collect().toSeq
    val b = Dedup.embedCosinePairs(spark, doubleDir, topN = 10)
      .collect().toSeq
    assert(a.nonEmpty && a === b)
  }

  test("an unsupported embedding type fails loudly with a named cause") {
    import spark.implicits._
    val dir = graft.Scaffold.cleanupOnExit(
      Files.createTempDirectory("graft-emb-canary-bad").toString)
    (0 until 3).map(i => (i.toLong, s"not-a-vector-$i"))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.embeddings(spark, dir)
    }
    assert(e.getMessage.contains("embeddings.embedding"))
  }
}
