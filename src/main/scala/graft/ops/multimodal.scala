package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in partition-local batches.
  *
  * The Spark-side shape is real — typed rows, mapPartitions batch boundary
  * (the Scala analogue of a pandas-batch UDF), schema in/out — while the
  * decoder itself is a clearly-marked deterministic STUB (no image/audio
  * libraries in this environment): it "decodes" the payload into byte-level
  * metadata. Swapping [[MediaDecoder.decode]] for a real JNI/library call
  * changes nothing in the plan.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, header_hex: String,
                             feat_sum: Long)

  /** STUB decoder: stands in for image/audio decode + feature extraction.
    * Deterministic byte-level "features": size, 8-byte header hex,
    * sum of the first 4 byte values (matches the SQL oracle exactly). */
  object MediaDecoder {
    def decode(batch: Iterator[MediaRow]): Iterator[MediaMeta] =
      batch.map { m =>
        val header = m.payload.take(8).map("%02X".format(_)).mkString
        val featSum = m.payload.take(4).map(_.toLong & 0xffL).sum
        MediaMeta(m.doc_id, m.payload.length.toLong, header, featSum)
      }
  }

  /** documents.text → opaque binary payload (the ingest shape a real
    * media table would have: id + bytes + metadata). */
  def payloads(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: one decoder invocation per partition, preserving
    * partitioning — no shuffle. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(MediaDecoder.decode _)
  }

  private val P = 1000000007L
  private def fp(bytes: Iterator[Byte]): Long =
    bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xffL)) % P)

  final case class MediaResized(doc_id: Long, n_bytes_out: Long,
                                sample_sum: Long, sample_fp: Long)
  final case class MediaFrame(doc_id: Long, frame_no: Long,
                              frame_bytes: Long, frame_fp: Long)

  /** STUB resize: stands in for an image downscale. Keeps every
    * `stride`-th payload byte (a 1-D stride-2/4 "pixel" subsample) and
    * emits size + checksum + rolling fingerprint of the result —
    * deterministic, so the SQL oracle can recompute it. Runs batched per
    * partition like [[extractMeta]]; a real resize would swap the sampling
    * loop for a library call with the same Dataset shape. */
  def resize(media: Dataset[MediaRow], stride: Int): Dataset[MediaResized] = {
    import media.sparkSession.implicits._
    require(stride >= 1, s"stride must be >= 1, got $stride")
    media.mapPartitions(_.map { m =>
      val sampled = m.payload.indices.collect {
        case i if i % stride == 0 => m.payload(i)
      }
      MediaResized(m.doc_id, sampled.length.toLong,
        sampled.iterator.map(_.toLong & 0xffL).sum, fp(sampled.iterator))
    })
  }

  /** STUB frame sampling: stands in for video keyframe extraction. Splits
    * the payload into consecutive `frameBytes`-byte frames and keeps every
    * `every`-th frame (frame 0, every, 2·every, …; the tail frame may be
    * short), one output row per kept frame with its fingerprint. flatMap
    * within partitions — the 1→N row expansion never shuffles. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
                   every: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(frameBytes >= 1 && every >= 1, s"bad ($frameBytes, $every)")
    media.mapPartitions(_.flatMap { m =>
      val nFrames = (m.payload.length + frameBytes - 1) / frameBytes
      (0 until nFrames by every).iterator.map { f =>
        val start = f * frameBytes
        val end = math.min(start + frameBytes, m.payload.length)
        val frame = m.payload.slice(start, end)
        MediaFrame(m.doc_id, f.toLong, frame.length.toLong, fp(frame.iterator))
      }
    })
  }
}
