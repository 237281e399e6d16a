package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary + typed
  * metadata. The container has no image/audio codecs, so "decode" is a
  * deterministic stub over the bytes (clearly marked); the Spark-side
  * plumbing — binary column, metadata struct, per-batch processing in
  * graft.operators.MediaPipeline — is real and tested by ScalaTest.
  * This query pins the schema + byte-level feature semantics against
  * the oracle.
  */
object Multimodal {

  val qMediaFeatures = GraftQuery(
    "mm_media_features",
    (s, d) => {
      import s.implicits._
      val bin = encode($"text", "UTF-8") // stand-in media payload
      val nBytes = octet_length(bin)
      Tables.documents(s, d).select(
        $"doc_id",
        $"source",
        nBytes.as("n_bytes"),
        md5(bin).as("content_hash"),
        // STUB decode: deterministic fake media dimensions from bytes
        (nBytes % 640).as("fake_width"),
        ((nBytes * 7) % 480).as("fake_height"),
        ($"n_chars" % 30 + 1).as("fake_n_frames"),
        struct($"lang".as("language"), $"n_chars".as("chars"))
          .as("meta").getField("chars").as("meta_chars"))
    },
    Some("""
      SELECT doc_id, source,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS content_hash,
        octet_length(encode(text)) % 640 AS fake_width,
        (octet_length(encode(text)) * 7) % 480 AS fake_height,
        n_chars % 30 + 1 AS fake_n_frames,
        n_chars AS meta_chars
      FROM documents"""))

  val all: Seq[GraftQuery] = Seq(qMediaFeatures)
}
