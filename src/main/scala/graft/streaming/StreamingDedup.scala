package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of `dd_exact`
  * for a continuously-arriving document stream (the ingest edge of a
  * training-data pipeline).
  *
  * Content fingerprint = md5 of whitespace-normalized text (identical
  * to the batch query), deduped with
  * `dropDuplicatesWithinWatermark`: state holds one fingerprint per
  * unique document and is EVICTED once the watermark passes it —
  * bounded state at 100 TB/day ingest, unlike a plain
  * `dropDuplicates` whose state grows forever. The documented
  * tradeoff: a duplicate arriving later than the watermark delay
  * re-emits (at-least-once dedup), which downstream batch dedup
  * (dd_exact over the landed table) mops up.
  */
object StreamingDedup {

  /** Fingerprint expression shared with the batch path. */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(array_join(split(trim(text), "\\s+"), " "))

  def dedupByFingerprint(docs: DataFrame, tsCol: String,
      watermarkDelay: String): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
