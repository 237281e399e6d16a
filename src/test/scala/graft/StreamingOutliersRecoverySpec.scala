package graft

import graft.streaming.StreamingOutliers
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Durability for the online outlier detector: the per-group moment
  * state must survive a restart from checkpoint, so an event arriving
  * after the restart is scored against EVERYTHING seen before it —
  * not a cold-started window. Sink is parquet (the memory sink does
  * not support recovery), same harness shape as CdcRecoverySpec. */
class StreamingOutliersRecoverySpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Long, String, Double)

  test("moment state survives restart: post-restart spike still flags") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("sout_ckpt").toString
    val out = Files.createTempDirectory("sout_out").toString

    def rows(): Seq[StreamingOutliers.ScoredEvent] =
      try spark.read.parquet(out).as[StreamingOutliers.ScoredEvent]
        .collect().sortBy(_.event_id).toSeq
      catch { case _: Throwable => Seq.empty }

    def awaitCount(n: Int): Seq[StreamingOutliers.ScoredEvent] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = rows()
      while (System.currentTimeMillis() < deadline && got.size < n) {
        Thread.sleep(250); got = rows()
      }
      got
    }

    def start(input: MemoryStream[Ev]) =
      StreamingOutliers.score(
        input.toDF().toDF("event_id", "user_id", "event_type", "value"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
        .start()

    // run 1: ten calm events build the moments
    val in1 = MemoryStream[Ev]
    val q1 = start(in1)
    try {
      in1.addData((1L to 10L).map(i =>
        (i, 3L, "view", if (i % 2 == 0) 10.0 else 12.0)))
      assert(awaitCount(10).size == 10)
    } finally q1.stop()

    // run 2: NEW source, same checkpoint. The replayed first batch is
    // skipped (already committed); the spike must be scored against
    // the RECOVERED ten-event moments — n_prior proves the state came
    // from the checkpoint, not a cold start.
    val in2 = MemoryStream[Ev]
    val q2 = start(in2)
    try {
      in2.addData((1L to 10L).map(i =>
        (i, 3L, "view", if (i % 2 == 0) 10.0 else 12.0))) // committed replay
      in2.addData(Seq((11L, 3L, "view", 500.0)))
      val got = awaitCount(11)
      assert(got.size == 11, s"expected 11 scored events, got ${got.size}")
      val spike = got.find(_.event_id == 11L).get
      assert(spike.n_prior == 10L,
        s"restart must recover the full moment state, n_prior=${spike.n_prior}")
      assert(spike.is_outlier && spike.z > 3.0)
    } finally q2.stop()
  }
}
