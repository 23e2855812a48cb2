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
}
