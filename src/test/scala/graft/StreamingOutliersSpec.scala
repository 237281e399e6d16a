package graft

import graft.streaming.StreamingOutliers
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of w_value_outliers: prequential z-scores from
  * exact integer moments carried in flatMapGroupsWithState state. */
class StreamingOutliersSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user_id, event_type, value)
  private type Ev = (Long, Long, String, Double)

  private def run(batches: Seq[Seq[Ev]], name: String) = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = StreamingOutliers.score(
      input.toDF().toDF("event_id", "user_id", "event_type", "value"))
    val q = out.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append)
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[StreamingOutliers.ScoredEvent]
        .collect().sortBy(_.event_id)
    } finally q.stop()
  }

  test("prequential scoring: early events unflagged, a spike flags, state spans batches") {
    val calm: Seq[Ev] = (1L to 10L).map(i =>
      (i, 7L, "view", if (i % 2 == 0) 10.0 else 12.0))
    val spike: Seq[Ev] = Seq((11L, 7L, "view", 500.0), (12L, 7L, "view", 11.0))
    val rows = run(Seq(calm, spike), "soutlier")
    assert(rows.length == 12)
    // n < 2 ⇒ z = 0 (nothing known yet)
    assert(rows.take(2).forall(r => r.z == 0.0 && !r.is_outlier))
    // the calm tail stays unflagged
    assert(rows.slice(2, 10).forall(!_.is_outlier))
    // the spike is scored against PRIOR moments only → flagged
    val sp = rows.find(_.event_id == 11L).get
    assert(sp.is_outlier && sp.z > 3.0 && sp.n_prior == 10L)
    // the event after the spike is scored against moments that now
    // CONTAIN the spike (inflated variance) → unflagged
    assert(!rows.find(_.event_id == 12L).get.is_outlier)
  }

  test("keys are independent and one-batch replay order is deterministic") {
    // interleave two groups out of event_id order inside one batch
    val batch: Seq[Ev] = Seq(
      (5L, 1L, "view", 10.0), (1L, 1L, "view", 10.0), (3L, 1L, "view", 14.0),
      (2L, 2L, "click", 5.0), (4L, 2L, "click", 7.0))
    val a = run(Seq(batch), "soutlier_a")
    val b = run(Seq(batch), "soutlier_b")
    assert(a.toSeq == b.toSeq, "same batch must score identically on replay")
    // group (1,view) folded in event_id order: ids 1,3 precede 5
    assert(a.find(_.event_id == 1L).get.n_prior == 0L)
    assert(a.find(_.event_id == 3L).get.n_prior == 1L)
    assert(a.find(_.event_id == 5L).get.n_prior == 2L)
    assert(a.find(_.event_id == 2L).get.n_prior == 0L)
  }
}
