package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
    height: Long, frames: Long)

/** Multimodal column plumbing (SURVEY.md §2.A): treat image/audio/video as
  * opaque `binary` columns and run decode / feature-extraction as
  * partition-batched typed transforms.
  *
  * The decode itself is a STUB — image/audio codecs are not available in
  * this environment — deriving deterministic fake dimensions from the byte
  * stream. Everything around it is the real production shape: binary
  * column, `Dataset[T]` encoder schema, per-partition iteration (one
  * decoder instance per partition, amortized over the batch), no driver
  * collection.
  */
object Multimodal {

  /** Attach a binary payload column (here: utf-8 bytes of `text`; in
    * production: the raw media bytes read from the store).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decoder: deterministic pseudo-dimensions from byte length. A real
    * deployment swaps only this function for an image/audio codec call.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 24)
  }

  /** Partition-batched decode of (doc_id, payload) → typed metadata. */
  def extractMeta(spark: SparkSession, withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "decoder" per partition — the amortization point for a real codec
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
