package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `w_cusum_drift`: ONLINE two-sided CUSUM drift
  * monitoring over an unbounded event stream — the alerting form of
  * the batch change-point screen.
  *
  * The batch query derives the reference mean from the FULL series; a
  * monitor can't see the future, so the stream scores against a
  * TRAINED BASELINE mean per event type (`baselineMuFp`, 1e6 fixed
  * point) — the StreamingPq / StreamingBpe contract: the baseline is
  * learned from the landed table in batch and shipped to the monitor,
  * which never trains on the hot path. Hours close when the watermark
  * passes them (the StreamingGapFill timer pattern — a trailing hour
  * with no successor event for its key still closes via an event-time
  * timer), and closed hours fold into the clamped recurrence
  * C = max(0, C + x) in ascending hour order, skipping absent hours
  * exactly like the batch query's observed-hours series. Late rows
  * beyond the watermark are dropped by the standard contract — and
  * that same contract is what guarantees in-order hour closure (an
  * hour can only close when every earlier in-watermark event has
  * arrived).
  *
  * Parity (spec-pinned): fed the same events with the baseline set to
  * the batch run's own per-type means, the emitted rows equal the
  * batch `w_cusum_drift` rows for every closed hour, bit for bit —
  * all arithmetic is the same integer fixed point.
  *
  * Scale shape: state per event type is two longs + the pending open
  * hours (bounded by watermark delay / 1 hour + 1); one hash
  * partition on event_type, work per micro-batch is one fold over the
  * batch's rows. */
object StreamingCusum {

  final case class HourCount(hr: Long, n: Long)
  final case class CusumState(up: Long, dn: Long, pending: Seq[HourCount])
  final case class DriftRow(event_type: String, w_start_sec: Long,
      n_events: Long, cusum_up_fp: Long, cusum_dn_fp: Long,
      drift_up: Boolean, drift_dn: Boolean)
  final case class TypedEvent(event_type: String, ts: java.sql.Timestamp,
      sec: Long)

  /** events must carry ts (timestamp) and event_type. */
  def monitored(events: DataFrame, baselineMuFp: Map[String, Long],
      watermarkDelay: String = "0 seconds"): Dataset[DriftRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(baselineMuFp)
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select($"event_type", $"ts", unix_timestamp($"ts").as("sec"))
      .as[TypedEvent]
    typed.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, DriftRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (etype, rows, state: GroupState[CusumState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmSec = Math.floorDiv(wmMs, 1000L)
          val st = state.getOption.getOrElse(CusumState(0L, 0L, Seq.empty))
          val pend = scala.collection.mutable.Map(
            st.pending.map(c => c.hr -> c.n): _*)
          rows.foreach { e =>
            val hr = Math.floorDiv(e.sec, 3600L) * 3600L
            pend(hr) = pend.getOrElse(hr, 0L) + 1L
          }
          val muFp = bc.value.getOrElse(etype, 0L)
          val slack = muFp / 10L
          var up = st.up
          var dn = st.dn
          val out = Seq.newBuilder[DriftRow]
          pend.keys.filter(_ + 3600L <= wmSec).toSeq.sorted.foreach { hr =>
            val n = pend.remove(hr).get
            val d = n * 1000000L - muFp
            up = math.max(0L, up + d - slack)
            dn = math.max(0L, dn - d - slack)
            out += DriftRow(etype, hr, n, up, dn, up > muFp, dn > muFp)
          }
          state.update(CusumState(up, dn,
            pend.toSeq.map { case (h, n) => HourCount(h, n) }.sortBy(_.hr)))
          // wake when the oldest still-open hour becomes closable,
          // even if no further event for this key ever arrives. The
          // timer fires when watermark EXCEEDS the timestamp, and the
          // hour closes at wm ≥ (hr+3600)s — so aim 1 ms below that
          // boundary (clamped above the current watermark, which
          // Spark requires).
          if (pend.nonEmpty)
            state.setTimeoutTimestamp(
              math.max((pend.keys.min + 3600L) * 1000L - 1L, wmMs + 1L))
          out.result().iterator
      }
  }
}
