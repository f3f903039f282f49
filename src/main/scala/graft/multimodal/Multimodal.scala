package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension): media travel as
  * opaque `binary` columns with a typed metadata struct alongside; decode /
  * feature-extraction runs per partition against batches of payload bytes.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment — see [[StubDecoder]]): it derives deterministic fake
  * dimensions from the payload bytes. Everything Spark-side is real and
  * load-bearing: the schema, the binary encoding, the mapPartitions batch
  * shape (one decoder instance per partition, never per row — the same
  * lifecycle a JNI/FFmpeg/PIL-backed decoder needs), and the column-
  * pruning-friendly split of cheap metadata vs heavy payload.
  */
object Multimodal {

  /** Typed metadata produced by decode. */
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** documents → (doc_id, media_type, payload) binary rows: the ingest
    * shape for any media table. Payload = utf-8 bytes of the text stands
    * in for image bytes; the pipeline does not care what's inside. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), lit("image/fake").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake in place of a real media library.
    * One instance per partition; `decode` is the per-payload hot call.
    * A real implementation swaps the body for e.g. an ImageIO/FFmpeg call
    * without touching the Spark plumbing around it. */
  final class StubDecoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = if (payload == null) 0L else payload.length.toLong
      MediaMeta(docId, n,
        width = (n % 640L).toInt + 1,
        height = ((n * 7L) % 480L).toInt + 1,
        n_frames = (docId % 30L).toInt + 1)
    }
  }

  /** Decode / feature-extract over the binary column: mapPartitions so the
    * (expensive, in real life) decoder is constructed once per partition
    * and fed a batch iterator — the Scala analogue of a pandas-batched
    * decode UDF. */
  def decodeMeta(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, d)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new StubDecoder
        rows.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
  }

  /** Oracle-checkable projection of the decode output. */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    decodeMeta(s, d).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling — the video-pipeline fan-out shape: every `stride`-th
    * frame index per document becomes its own row with a byte offset into
    * the payload, ready for a per-frame decode stage. Pure explode — one
    * row in, n_frames/stride rows out, no shuffle; at 100 TB the frame
    * rows carry (doc_id, offset) pointers, never payload copies. */
  def frameSamples(s: SparkSession, d: String, stride: Int = 5): DataFrame =
    decodeMeta(s, d).toDF()
      // frame size = payload bytes / frame count (integer division) —
      // offsets stay inside the payload for every frame
      .withColumn("frame_size",
        floor(col("n_bytes") / col("n_frames")).cast("long"))
      .select(col("doc_id"), col("frame_size"),
        explode(sequence(lit(1), col("n_frames"), lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_size") * (col("frame_idx") - 1)).cast("long").as("frame_offset"))
      .orderBy(col("doc_id"), col("frame_idx"))
}
