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

  final case class ResizedAsset(
      asset_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Resize: same batched per-partition shape as extractFeatures —
    * output payload size is a function of the TARGET dims (the real
    * op's memory contract: shuffle/cache cost after resize is bounded
    * by target resolution, not source). STUB resample: deterministic
    * byte stride. */
  def resize(assets: Dataset[MediaAsset], targetW: Int, targetH: Int)
      : Dataset[ResizedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      val outLen = targetW * targetH / 64 // stub: bounded payload
      batch.map { a =>
        val src = a.payload
        val out = new Array[Byte](math.min(outLen, math.max(src.length, 1)))
        var i = 0
        while (i < out.length) { // stride resample stand-in
          out(i) = src(if (src.isEmpty) 0 else (i.toLong * src.length / out.length).toInt)
          i += 1
        }
        ResizedAsset(a.asset_id, a.media_type, out, targetW, targetH)
      }
    }
  }

  final case class FrameSample(
      asset_id: Long,
      frame_idx: Int,
      n_bytes: Long,
      checksum: Long)

  /** Frame sampling: the 1→n explode shape — each video asset emits
    * one row per sampled frame (every `every`-th of its decoded frame
    * count); images/audio emit frame 0 only. Downstream per-frame
    * feature extraction then parallelizes over FRAMES, not assets —
    * the fan-out a video corpus needs so one long video can't
    * straggle a task. */
  def sampleFrames(assets: Dataset[MediaAsset], every: Int)
      : Dataset[FrameSample] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val (_, _, frames) = decodeStub(a.payload, a.media_type)
      val idxs = if (a.media_type == "video") 0 until frames by every
                 else 0 until 1
      idxs.map { f =>
        // stub per-frame payload slice: deterministic window of bytes
        val start = if (a.payload.isEmpty) 0 else (f * 97) % a.payload.length
        val slice = a.payload.slice(start,
          math.min(start + 256, a.payload.length))
        val checksum = slice.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
        FrameSample(a.asset_id, f, slice.length.toLong, checksum)
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
