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
  * Σq²); Σq² is an exact unsigned 128-bit accumulator split across
  * two Long fields (headroom 2¹²⁸ ≈ 3.4e38 — the same order as the
  * batch query's DECIMAL(38,0), and deliberately NOT a BigDecimal
  * field: `Encoders.product` maps BigDecimal to Decimal(38,18),
  * whose integer headroom is only ~1e20 and whose overflow surfaces
  * as an encoder failure). Events within a micro-batch are folded in
  * event_id order, so a replayed batch produces identical output
  * (the CDC determinism rule).
  *
  * Scale shape: state is three numbers per (user, event_type) — the
  * same key space the batch moments table aggregates on — and the
  * shuffle is the one hash-partition every stateful op pays. No
  * watermark is needed for correctness (moments only grow), but
  * callers wanting bounded state on churning key spaces can wrap the
  * input with a watermark + timeout eviction like StreamingDedup.
  */
object StreamingOutliers {

  /** (n, Σq, Σq²) for one (user, event_type) group. Σq² is an exact
    * unsigned 128-bit integer as (ssHi·2⁶⁴ + ssLo) — two Long columns
    * in the state store, overflow-proof to 2¹²⁸ (≈3.4e38; even
    * q = 10⁹ per event leaves room for >10²⁰ events per group). */
  final case class MomentState(n: Long, s: Long, ssHi: Long, ssLo: Long)

  final case class ScoredEvent(
      event_id: Long, user_id: Long, event_type: String,
      z: Double, is_outlier: Boolean, n_prior: Long)

  /** Internal quantized row shape (public: the encoder's generated
    * code must be able to instantiate it). */
  final case class KeyedEvent(
      user_id: Long, event_type: String, event_id: Long, q: Long)

  /** Unsigned 128-bit (hi·2⁶⁴ + lo) → double, for the variance read
    * (exactness lives in the integer state; the z-score is float at
    * the output edge only, same as the batch twin). */
  private def u128ToDouble(hi: Long, lo: Long): Double = {
    val loU = (lo >>> 1).toDouble * 2.0 + (lo & 1L).toDouble
    hi.toDouble * 1.8446744073709552e19 + loU
  }

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
          var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L, 0L))
          // deterministic fold order within the micro-batch
          val out = rows.toSeq.sortBy(_.event_id).map { e =>
            val dq = e.q.toDouble
            val z =
              if (st.n >= 2) {
                val dn = st.n.toDouble
                val mean = st.s.toDouble / dn
                val varp = u128ToDouble(st.ssHi, st.ssLo) / dn - mean * mean
                if (varp > 0)
                  BigDecimal(( dq - mean) / math.sqrt(varp))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                else 0.0
              } else 0.0
            // exact 128-bit st.ss += q² (q² ≥ 0; multiplyHigh gives the
            // correct unsigned high word for a non-negative product)
            val q2lo = e.q * e.q
            val q2hi = Math.multiplyHigh(e.q, e.q)
            val lo = st.ssLo + q2lo
            val carry =
              if (java.lang.Long.compareUnsigned(lo, st.ssLo) < 0) 1L else 0L
            st = MomentState(st.n + 1, st.s + e.q, st.ssHi + q2hi + carry, lo)
            ScoredEvent(e.event_id, e.user_id, e.event_type,
              z, math.abs(z) > 3.0, st.n - 1)
          }
          state.update(st)
          out.iterator
      }(Encoders.product[MomentState], Encoders.product[ScoredEvent])
  }
}
