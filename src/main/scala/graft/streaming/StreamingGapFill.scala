package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `w_gap_fill_hourly`: continuous time-series
  * resample + forward fill, emitting one row per (event_type, hour)
  * the moment the WATERMARK closes the hour — including synthetic
  * zero-count rows for hours in which nothing arrived, with the last
  * observed hourly total carried forward. This is the family's first
  * EVENT-TIME-TIMER operator: gap rows have no arriving record to
  * ride on, so the key schedules itself a wake-up at the next hour
  * boundary (`GroupStateTimeout.EventTimeTimeout` +
  * `setTimeoutTimestamp`) and emits fills when the watermark passes —
  * a capability append-mode windowed aggregation cannot express
  * (windows only emit where input existed).
  *
  * Parity contract vs the batch query (spec-pinned): for every
  * event type, the emitted rows equal the batch `w_gap_fill_hourly`
  * rows from that type's FIRST OBSERVED hour through the last hour
  * the final watermark closed. The one declared deviation: the batch
  * spine starts every type at the GLOBAL min hour (leading zero-fill
  * rows before a type's first event); a streaming key has no arrival
  * to trigger those, so its series starts at its own first hour —
  * the leading all-zero prefix is the only difference.
  *
  * Ordering/lateness: events later than the watermark delay are
  * dropped by the watermark (the standard contract); within the
  * delay, hours stay pending in state until closable, so arrival
  * order cannot affect the emitted totals.
  *
  * Scale shape: state per key = the pending open hours (bounded by
  * watermark delay / 1 hour + 1 cells) plus two longs; work per
  * micro-batch is one fold over the batch's rows plus one emission
  * sweep per key; the only shuffle is the stateful hash-partition on
  * event_type. Values are the 1e4-quantized exact longs of the batch
  * twin, so fills are bit-identical.
  */
object StreamingGapFill {

  /** One open (not yet closable) hour's partial aggregate. */
  final case class HourCell(hr: Long, n: Long, sq: Long)

  /** Per-key state: last emitted hour (MinValue = nothing yet), the
    * carry-forward quantized total, and the open cells. */
  final case class GapState(
      lastEmittedHr: Long, ffillSq: Long, pending: Seq[HourCell])

  final case class FilledHour(
      event_type: String, w_start_sec: Long, n_events: Long,
      ffill_value: Double, is_gap: Boolean)

  final case class TypedEvent(event_type: String,
      ts: java.sql.Timestamp, sec: Long, q: Long)

  /** events must carry ts (timestamp), event_type, value. */
  def filled(events: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[FilledHour] = {
    val spark = events.sparkSession
    import spark.implicits._
    // ts stays in the projection: the watermark tag rides the COLUMN,
    // and EventTimeTimeout requires the stateful op's input to still
    // carry a watermarked column
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select($"event_type", $"ts", unix_timestamp($"ts").as("sec"),
        floor($"value" * 1e4 + 0.5).cast("long").as("q"))
      .as[TypedEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState[GapState, FilledHour](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state: GroupState[GapState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmSec = Math.floorDiv(wmMs, 1000L)
          val st = state.getOption.getOrElse(
            GapState(Long.MinValue, 0L, Seq.empty))
          val pend = scala.collection.mutable.Map(
            st.pending.map(c => c.hr -> (c.n, c.sq)): _*)
          rows.foreach { e =>
            val hr = Math.floorDiv(e.sec, 3600L) * 3600L
            val (n, sq) = pend.getOrElse(hr, (0L, 0L))
            pend(hr) = (n + 1, sq + e.q)
          }
          var last = st.lastEmittedHr
          var ffill = st.ffillSq
          if (last == Long.MinValue && pend.nonEmpty)
            last = pend.keys.min - 3600L
          val out = Seq.newBuilder[FilledHour]
          if (last != Long.MinValue) {
            var h = last + 3600L
            while (h + 3600L <= wmSec) { // hour fully before watermark
              pend.remove(h) match {
                case Some((n, sq)) =>
                  ffill = sq
                  out += FilledHour(etype, h, n, sq / 1e4, is_gap = false)
                case None =>
                  out += FilledHour(etype, h, 0L, ffill / 1e4, is_gap = true)
              }
              last = h
              h += 3600L
            }
          }
          state.update(GapState(last, ffill,
            pend.toSeq.map { case (hr, (n, sq)) => HourCell(hr, n, sq) }
              .sortBy(_.hr)))
          // wake this key when the NEXT hour becomes closable, even if
          // no further event for it ever arrives — that is what turns
          // silence into emitted gap rows
          if (last != Long.MinValue)
            state.setTimeoutTimestamp(
              math.max((last + 7200L) * 1000L, wmMs + 1L))
          out.result().iterator
      }(Encoders.product[GapState], Encoders.product[FilledHour])
  }
}
