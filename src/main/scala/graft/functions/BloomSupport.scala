package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** The one place that touches Spark's bloom internals: serialization of a
  * `util.sketch.BloomFilter` and its evaluation as a codegen'd catalyst
  * predicate (`BloomFilterMightContain`, the machinery behind Spark's own
  * runtime row filtering). Hash contract: the filter must have been built
  * over LONG fingerprints (`putLong`, which `df.stat.bloomFilter` on a
  * long column uses) and probed with the same long value —
  * `mightContainLong` on both sides, so an `xxhash64(text)` column works
  * symmetrically. Kept in one object because the catalyst API is
  * `private[sql]`-adjacent and has moved before (see ColumnBridge). */
object BloomSupport {

  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(bloom, fingerprint)` over a serialized filter: a
    * stateless, codegen'd predicate — false ⇒ certainly absent. */
  def mightContain(bloomBytes: Array[Byte], fingerprint: Column): Column =
    ColumnBridge.toColumn(BloomFilterMightContain(
      Literal(bloomBytes), ColumnBridge.toExpr(fingerprint)))
}
