package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SignSignatureSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic, partition-independent, equal inputs give equal signatures") {
    val vecs = Seq.tabulate(64)(i =>
      (i.toLong, Array.tabulate(16)(d => (math.sin(i * 17 + d) * 10).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def sigs(parts: Int) = df.repartition(parts)
      .select(col("vec_id"), SignSignature.of(col("embedding"), 32).as("sig"))
      .as[(Long, Long)].collect().toMap
    val a = sigs(1)
    assert(a == sigs(13)) // partitioning must not change signatures
    // an exact copy must share its original's signature
    val dup = df.unionAll(df.select((col("vec_id") + 1000L).as("vec_id"),
        col("embedding")))
      .select(col("vec_id"), SignSignature.of(col("embedding"), 32).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(vecs.forall { case (id, _) => dup(id) == dup(id + 1000L) })
  }

  test("disjoint plane families: word 0 and word 1 signatures are independent") {
    val df = Seq.tabulate(256)(i =>
      (i.toLong, Array.tabulate(16)(d => (math.cos(i * 31 + d * 7) * 5).toFloat)))
      .toDF("vec_id", "embedding")
    val words = df.select(
      SignSignature.of(col("embedding"), 64, 0).as("w0"),
      SignSignature.of(col("embedding"), 64, 64).as("w1"))
      .as[(Long, Long)].collect()
    assert(words.exists { case (w0, w1) => w0 != w1 },
      "disjoint families should not reproduce the same word")
    // bits are roughly balanced over pseudo-random input (sanity, wide bar)
    val ones = words.map { case (w0, _) => java.lang.Long.bitCount(w0) }.sum
    val frac = ones.toDouble / (words.length * 64)
    assert(frac > 0.3 && frac < 0.7, s"bit-one fraction $frac")
  }

  test("cache-key fields are range-checked, never silently aliased") {
    // planeOffset packs into a 20-bit key field; beyond it two different
    // plane families would collide on one cache entry
    val arr = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1.0f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    intercept[IllegalArgumentException] {
      SignSignature(arr, 16, 1 << 20)
    }
    assert(SignSignature(arr, 16, (1 << 20) - 1) != null)
    // dims comes from data, checked at weight build: a 2^20-component
    // embedding must fail loudly instead of serving an aliased table
    val big = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.fill(1 << 20)(0.5f))
    intercept[IllegalArgumentException] {
      SignSignature.compute(big, 16, 0, isDouble = false)
    }
  }

  test("configured expectedDims nulls mismatched-width rows (oracle agreement by construction)") {
    // a mixed-dim corpus: 64-dim rows sign normally, a 32-dim straggler
    // must get a NULL signature — not a signature from a 32-wide plane
    // table that would keep it in Spark's buckets while the fixed-width
    // oracle drops it (ADVICE r8)
    val rows = Seq(
      (1L, Array.tabulate(64)(d => d.toFloat / 64)),
      (2L, Array.tabulate(32)(d => d.toFloat / 32)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        SignSignature.of(col("embedding"), 16, expectedDims = 64).as("sig"))
      .as[(Long, Option[Long])].collect().toMap
    assert(rows(1L).isDefined, "matching width must sign")
    assert(rows(2L).isEmpty, "mismatched width must be null")
    // adaptive default still signs any width
    val adaptive = Seq((3L, Array.tabulate(32)(d => d.toFloat / 32)))
      .toDF("vec_id", "embedding")
      .select(SignSignature.of(col("embedding"), 16).as("sig"))
      .as[Option[Long]].collect()
    assert(adaptive.head.isDefined)
  }

  test("null array gives null; null element and empty array give null, not garbage") {
    val rows = spark.sql(
      """SELECT * FROM VALUES
        |(1L, array(cast(1.0 as float), cast(-2.0 as float))),
        |(2L, cast(null as array<float>)),
        |(3L, array(cast(1.0 as float), cast(null as float))),
        |(4L, cast(array() as array<float>))
        |t(vec_id, embedding)""".stripMargin)
      .select(col("vec_id"), SignSignature.of(col("embedding"), 16).as("sig"))
      .as[(Long, Option[Long])].collect().toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty)
    assert(rows(3L).isEmpty)
    // empty ≠ all-set degenerate signature (that would bucket every
    // malformed row together), and ≠ a task-killing exception
    assert(rows(4L).isEmpty)
  }
}
