package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. */
final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
    height: Long, frames: Long)

/** One sampled frame of a media payload: byte extent + stub feature. */
final case class FrameSample(doc_id: Long, frame_id: Long, frame_start: Long,
    frame_len: Long, feature: Long)

/** Aspect-preserving thumbnail plan for a media payload. */
final case class Thumbnail(doc_id: Long, width: Long, height: Long,
    thumb_w: Long, thumb_h: Long, thumb_bytes: Long)

/** One analysis window of an audio-like payload: offset + frame features. */
final case class AudioWindow(doc_id: Long, win_id: Long, start: Long,
    energy: Long, peak: Long)

/** Perceptual hash of a media payload (average-hash family). */
final case class PHash(doc_id: Long, phash: Long)

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

  /** Resize planning: fit each image's stub dimensions into a `box`×`box`
    * thumbnail preserving aspect ratio (integer floor scaling, never
    * upscaled), with the projected thumbnail byte cost (3 bytes/pixel).
    * The real pixel resample replaces the byte-cost arithmetic only; the
    * decode-once-then-derive plumbing is the production shape.
    */
  def planThumbnails(spark: SparkSession, withPayloadDf: DataFrame,
      box: Long): Dataset[Thumbnail] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decodeStub(id, bytes)
          val w = m.width
          val h = m.height
          val (tw, th) =
            if (w <= box && h <= box) (w, h) // never upscale
            else if (w >= h) (box, math.max(1L, h * box / w))
            else (math.max(1L, w * box / h), box)
          Thumbnail(id, w, h, tw, th, tw * th * 3)
        }
      }
  }

  /** Audio-style analysis windows over a payload: the byte stream is read
    * as 8-bit PCM samples and cut into fixed `win`-sample frames every
    * `hop` samples (the 25 ms / 10 ms speech-frame convention), each
    * reduced to integer features (energy around a fixed 64 bias + peak
    * sample). Only fully-contained windows are emitted; a document shorter
    * than one window yields no rows. Same executor-side flatMap expansion
    * shape as [[sampleFrames]]; a real deployment swaps the sample
    * arithmetic for a codec's PCM decode.
    */
  def audioWindows(spark: SparkSession, withPayloadDf: DataFrame,
      win: Int, hop: Int): Dataset[AudioWindow] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length
          val nWin = if (n >= win) (n - win) / hop + 1 else 0
          (0 until nWin).iterator.map { w =>
            val start = w * hop
            var e = 0L
            var p = 0L
            var i = start
            while (i < start + win) {
              val s = bytes(i) & 0xff
              val c = (s - 64).toLong
              e += c * c
              if (s > p) p = s
              i += 1
            }
            AudioWindow(id, w, start, e, p)
          }
        }
      }
  }

  /** Perceptual hashing of an image-like payload (the average-hash /
    * aHash family — the pHash shape minus the DCT, which needs a pixel
    * decode this container lacks): the byte stream is cut into `bits`
    * equal extents (the "pixel blocks"), and bit b is set when extent b's
    * mean is >= the global mean — cross-multiplied in exact integers
    * (`sum_b * n >= total * len_b`) so the hash replays verbatim in any
    * SQL engine. Near-identical payloads differ in few extents, so their
    * hashes sit within a small Hamming distance — the image analog of
    * d04's SimHash for text. Same per-partition typed-decode shape as
    * [[extractMeta]]; a real deployment swaps the extent sums for
    * grayscale block means after the codec call.
    */
  def pHashes(spark: SparkSession, withPayloadDf: DataFrame,
      bits: Int): Dataset[PHash] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          var total = 0L
          var i = 0
          while (i < n) { total += bytes(i) & 0xff; i += 1 }
          var h = 0L
          var b = 0
          while (b < bits) {
            val lo = b * n / bits
            val hi = (b + 1) * n / bits
            var s = 0L
            var k = lo
            while (k < hi) { s += bytes(k) & 0xff; k += 1 }
            // exact 128-bit compare of s*n vs total*(hi-lo): the plain
            // Long products bound by ~255*n^2/bits overflow for payloads
            // around 1 GB — inconsistent with the 100 TB framing even
            // though unreachable with the stub payloads. multiplyHigh +
            // unsigned-low compare is exact for any payload size and
            // bit-identical to the old compare below the overflow line.
            val h1 = Math.multiplyHigh(s, n.toLong)
            val l1 = s * n
            val h2 = Math.multiplyHigh(total, (hi - lo).toLong)
            val l2 = total * (hi - lo)
            val ge = if (h1 != h2) h1 > h2
              else java.lang.Long.compareUnsigned(l1, l2) >= 0
            if (ge) h |= 1L << b
            b += 1
          }
          PHash(id, h)
        }
      }
  }

  /** Frame sampling over a video-like payload: the stub "container" has
    * `1 + n % 24` equal byte-extent frames; every `stride`-th frame
    * (always including frame 0) is decoded to a feature — here a byte-sum
    * stub; in production the per-frame pixel decode. The plumbing is the
    * production shape: one flatMap row per sampled frame (row-count
    * expansion happens on the executors, batched per partition), byte
    * extents computed from the container header, nothing on the driver.
    */
  def sampleFrames(spark: SparkSession, withPayloadDf: DataFrame,
      stride: Int): Dataset[FrameSample] = {
    import spark.implicits._
    withPayloadDf.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length.toLong
          val frames = 1 + n % 24
          (0L until frames).iterator.filter(_ % stride == 0).map { f =>
            val start = f * n / frames
            val end = (f + 1) * n / frames
            var s = 0L
            var i = start.toInt
            while (i < end) { s += bytes(i) & 0xff; i += 1 }
            FrameSample(id, f, start, end - start, s % 997)
          }
        }
      }
  }
}
