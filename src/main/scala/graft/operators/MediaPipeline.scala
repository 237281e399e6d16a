package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: media as opaque binary + typed
  * metadata struct, with decode/feature-extraction running batched per
  * partition (the Scala analog of a pandas-batch UDF: one
  * mapPartitions pass, amortized per-batch setup, never per-row
  * driver calls).
  *
  * The container ships no image/audio codecs, so [[decodeStub]] is a
  * clearly-marked deterministic fake; the plumbing — schema, batch
  * iteration, partition-level resource lifecycle — is the real,
  * tested surface. Swap `decodeStub` for a real codec binding and
  * nothing else changes.
  */
object MediaPipeline {

  /** Typed row for a media asset: payload + metadata travel together. */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      source: String)

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** STUB — stands in for a codec. Deterministic pure function of the
    * payload so tests can pin outputs. A real impl would decode pixels
    * / samples here (per-partition codec init happens in
    * [[extractFeatures]], not per row).
    */
  def decodeStub(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
    val n = payload.length
    val w = (n % 640) + 1
    val h = ((n * 7) % 480) + 1
    val frames = mediaType match {
      case "video" => (n % 30) + 2
      case _ => 1
    }
    (w, h, frames)
  }

  /** Batched per-partition decode + feature extraction. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // per-partition setup (codec handles, buffers) would go here —
      // once per task, NOT once per row
      batch.map { a =>
        val (w, h, frames) = decodeStub(a.payload, a.media_type)
        val checksum = a.payload.foldLeft(1125899906842597L) {
          (acc, b) => acc * 31 + b
        }
        MediaFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
          w, h, frames, checksum)
      }
    }
  }

  /** Builds a media-asset frame from the documents fixture (text bytes
    * as stand-in payloads) — deterministic test input at any SF. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaAsset]
  }
}
