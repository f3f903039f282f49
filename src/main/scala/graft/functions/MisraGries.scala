package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries '82) as a native
  * aggregate: a bounded map of at most `k` (item, counter) pairs. When
  * the map would exceed `k` entries, every counter drops by the
  * (k+1)-th largest and non-positive entries are evicted — the classic
  * frequency-estimation invariant
  *
  *   true_count - N/(k+1)  <=  est_count  <=  true_count
  *
  * which the MERGE operation preserves (sum counts pairwise, apply the
  * same reduction — Agarwal et al., "Mergeable Summaries", PODS'12), so
  * the bound holds across any partitioning / AQE re-plan, and any item
  * with frequency above N/(k+1) is guaranteed present in the output.
  * Corollary used by the oracle: with at most `k` distinct inputs no
  * reduction ever fires anywhere, and the sketch is EXACT — equal to
  * `GROUP BY` counts.
  *
  * Per-group state is O(k) regardless of input size; inputs stream
  * through partial aggregation map-side, so only P·k pairs ever shuffle
  * (P = partitions) — the scale path for "top talkers" over 100 TB where
  * an exact groupBy on a high-cardinality key would shuffle every row.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"sketch capacity must be >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.updateWith(key) { c => Some(c.getOrElse(0L) + 1L) }
      if (buf.size > k) reduceTo(buf)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.updateWith(key) { prev => Some(prev.getOrElse(0L) + c) }
    }
    if (buf.size > k) reduceTo(buf)
    buf
  }

  /** Subtract the (k+1)-th largest counter from all and evict the
    * non-positive — leaves at most k entries in one pass. */
  private def reduceTo(buf: mutable.HashMap[String, Long]): Unit = {
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val sub = counts(counts.length - (k + 1))
    buf.filterInPlace((_, c) => c - sub > 0)
    buf.mapValuesInPlace((_, c) => c - sub)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val keyBytes = new Array[Byte](len)
      in.readFully(keyBytes)
      buf(new String(keyBytes, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** `misra_gries(col, k)` as an aggregate Column producing a sorted
    * `array<struct<item:string, est_count:bigint>>`. */
  def sketch(col: Column, k: Int): Column =
    ColumnBridge.toColumn(
      new MisraGries(ColumnBridge.toExpr(col), k).toAggregateExpression())
}
