package graft

import graft.streaming.StreamingScd2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of q_cdc_scd2: closed dimension versions emitted as
  * value changes arrive, batch/stream row-parity across arbitrary
  * micro-batch splits. */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, sec, value)
  private type Ev = (Long, Long, Long, Double)

  private val history: Seq[Ev] = Seq(
    (1L, 101L, 1000L, 10.0), (1L, 102L, 2000L, 10.0), // collapse
    (1L, 103L, 3000L, 20.0), (1L, 104L, 4000L, 10.0),
    (2L, 201L, 1500L, 5.0), (2L, 202L, 2500L, 5.0),
    (3L, 301L, 1100L, 7.0), (3L, 302L, 2100L, 8.0))

  private def run(batches: Seq[Seq[Ev]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingScd2.versions(
      input.toDF().toDF("user_id", "event_id", "sec", "value"))
    val q = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingScd2.ClosedVersion]
        .collect().sortBy(v => (v.user_id, v.version)).toSeq
    } finally q.stop()
  }

  /** The batch query's closed rows (is_current = false) on the same
    * history — the parity target. */
  private def batchClosed(evs: Seq[Ev]) =
    graft.queries.Cdc.scd2(
        evs.toDF("user_id", "event_id", "sec", "value"))
      .filter(!$"is_current")
      .collect()
      .map(r => StreamingScd2.ClosedVersion(r.getLong(0), r.getDouble(1),
        r.getLong(2), r.getLong(3).asInstanceOf[Long], r.getLong(4)))
      .sortBy(v => (v.user_id, v.version)).toSeq

  test("stream equals batch closed versions regardless of batch split") {
    val expected = batchClosed(history)
    assert(expected.nonEmpty)
    val whole = run(Seq(history), "sscd2_whole")
    assert(whole == expected, "single-batch stream must match batch twin")
    val split = run(Seq(history.take(3), history.slice(3, 5),
      history.drop(5)), "sscd2_split")
    assert(split == expected, "micro-batch boundaries must not change output")
  }

  test("unchanged values collapse without emitting; open row stays in state") {
    // one user, constant value: no version ever closes
    val calm: Seq[Ev] = (1L to 5L).map(i => (9L, 900L + i, 1000L * i, 3.5))
    assert(run(Seq(calm.take(2), calm.drop(2)), "sscd2_calm").isEmpty)
    // a final change closes exactly one version with the FIRST sec
    val changed = calm :+ ((9L, 999L, 99000L, 4.5): Ev)
    val got = run(Seq(changed), "sscd2_chg")
    assert(got == Seq(StreamingScd2.ClosedVersion(9L, 3.5, 1000L, 99000L, 1L)))
  }
}
