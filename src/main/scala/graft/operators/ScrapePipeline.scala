package graft.operators

import graft.model.{Listing, ListingEvent}
import graft.sinks.{GraphSink, GraphWriter}
import graft.sources.ListingSource
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** EP1/EP2 — the reference's main loop (SURVEY §3) as one composable
  * Spark DAG per cycle:
  *
  *   URE source (S1/S2) ∪ Trulia source (S4-S6, tagged TRULIA)
  *     → dropDuplicates(mls) (A4)
  *     → CDC against previous state (J2/J3/T2)
  *     → graph sink (K1, events drive the upsert)
  *     → new state (K2/S11 persistence is the caller's choice:
  *       checkpoint in streaming, CsvSinks.writeState in batch)
  *
  * The reference runs this serially per zip with per-row sink round
  * trips (main.py:109-138); here one cycle is one distributed plan:
  * sources parallelize per page partition, the union is free (no
  * shuffle), dedup + CDC shuffle once on mls, and the sink writes per
  * partition. Trulia rows join the same state machine instead of
  * bypassing it (trulia_scraper.py:140's unconditional new_listing —
  * reproduced only in `trulia_bypasses_state = true` mode for
  * fidelity).
  */
object ScrapePipeline {

  final case class CycleResult(
      events: Dataset[ListingEvent],
      newState: Dataset[Listing])

  def runCycle(
      spark: SparkSession,
      ure: ListingSource,
      trulia: ListingSource,
      zipCodes: Seq[String],
      prevState: Dataset[Listing],
      nowEpoch: Long,
      writer: Option[GraphWriter] = None,
      truliaBypassesState: Boolean = false): CycleResult = {
    import spark.implicits._

    val ureRows = ure.scan(spark, zipCodes)
    val truliaRows = trulia.scan(spark, zipCodes)
      .map(_.copy(source = "TRULIA"))

    val unioned =
      if (truliaBypassesState) ureRows else ureRows.union(truliaRows)
    // A4: dedup by key before the state probe. TRULIA wins a
    // cross-source conflict (it is scraped after URE in the reference
    // loop, main.py:117-127, so its row is the last write); the
    // remaining columns make the pick deterministic across retries
    // when a source emits the same mls twice.
    val batch = unioned
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"mls")
          .orderBy($"source", $"price", $"foundDate", $"url")))
      .filter($"rn" === 1).drop("rn")
      .as[Listing]

    val events = Cdc.batchEvents(prevState, batch, nowEpoch)

    // Trulia fidelity mode: unconditional new_listing, state untouched
    val allEvents =
      if (truliaBypassesState)
        events.union(truliaRows.map(t => ListingEvent(
          t.mls, "new_listing", None, t.price, None, None, None, t.source)))
      else events

    writer.foreach { w =>
      // K1: evented rows only, node props carry the event —
      // main.py:24-35 → database_ops.py:29-30 (MERGE = idempotent).
      // In bypass mode trulia rows skip state but still hit the sink
      // (trulia_scraper.py:140 sends them unconditionally).
      val sinkRows =
        if (truliaBypassesState) batch.union(truliaRows) else batch
      GraphSink.writeGraph(sinkRows, allEvents, nowEpoch, w)
    }

    CycleResult(allEvents, batch)
  }
}
