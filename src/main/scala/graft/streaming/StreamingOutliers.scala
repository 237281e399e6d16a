package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `w_value_outliers`: ONLINE z-score anomaly
  * flagging over an unbounded event stream, keyed by
  * (user_id, event_type) with `flatMapGroupsWithState`.
  *
  * The batch query scores every event against its group's FULL
  * moments; a stream can't see the future, so the online detector is
  * prequential — each event is scored against the moments of all
  * PRIOR events in its group, then folded into the state. That is the
  * standard online-monitoring semantic (an alert fires from what was
  * known at arrival time), and it makes the first two events of every
  * group unflaggable (n < 2 ⇒ z = 0), mirroring the batch query's
  * zero-variance guard.
  *
  * Exactness discipline matches the batch twin: values are quantized
  * to 1e4 fixed point and the state carries integer moments (n, Σq,
  * Σq²); Σq² rides a BigDecimal(38,0)-encoded field for the same
  * overflow headroom the batch query gets from DECIMAL(38,0). Events
  * within a micro-batch are folded in event_id order, so a replayed
  * batch produces identical output (the CDC determinism rule).
  *
  * Scale shape: state is three numbers per (user, event_type) — the
  * same key space the batch moments table aggregates on — and the
  * shuffle is the one hash-partition every stateful op pays. No
  * watermark is needed for correctness (moments only grow), but
  * callers wanting bounded state on churning key spaces can wrap the
  * input with a watermark + timeout eviction like StreamingDedup.
  */
object StreamingOutliers {

  /** (n, Σq, Σq²) for one (user, event_type) group; ss is decimal for
    * overflow headroom past ~4·10⁵ events/group at this value range. */
  final case class MomentState(n: Long, s: Long, ss: java.math.BigDecimal)

  final case class ScoredEvent(
      event_id: Long, user_id: Long, event_type: String,
      z: Double, is_outlier: Boolean, n_prior: Long)

  /** Internal quantized row shape (public: the encoder's generated
    * code must be able to instantiate it). */
  final case class KeyedEvent(
      user_id: Long, event_type: String, event_id: Long, q: Long)

  /** events must carry event_id, user_id, event_type, value. */
  def score(events: org.apache.spark.sql.DataFrame): Dataset[ScoredEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events
      .select($"user_id", $"event_type", $"event_id",
        floor($"value" * 1e4 + 0.5).cast("long").as("q"))
      .as[KeyedEvent]
    keyed
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[MomentState, ScoredEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[MomentState]) =>
          var st = state.getOption.getOrElse(
            MomentState(0L, 0L, java.math.BigDecimal.ZERO))
          // deterministic fold order within the micro-batch
          val out = rows.toSeq.sortBy(_.event_id).map { e =>
            val dq = e.q.toDouble
            val z =
              if (st.n >= 2) {
                val dn = st.n.toDouble
                val mean = st.s.toDouble / dn
                val varp = st.ss.doubleValue() / dn - mean * mean
                if (varp > 0)
                  BigDecimal(( dq - mean) / math.sqrt(varp))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                else 0.0
              } else 0.0
            st = MomentState(st.n + 1, st.s + e.q,
              st.ss.add(java.math.BigDecimal.valueOf(e.q)
                .multiply(java.math.BigDecimal.valueOf(e.q))))
            ScoredEvent(e.event_id, e.user_id, e.event_type,
              z, math.abs(z) > 3.0, st.n - 1)
          }
          state.update(st)
          out.iterator
      }(Encoders.product[MomentState], Encoders.product[ScoredEvent])
  }
}
