package graft

import graft.streaming.StreamingScd2
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Durability for the streaming SCD-2 maintainer: the open version in
  * state must survive a restart from checkpoint, so a post-restart
  * value change closes the version OPENED BEFORE the restart — with
  * its original valid_from and version number, not a cold-started
  * version 1. Parquet sink + committed-offset replay, same harness
  * shape as StreamingOutliersRecoverySpec. */
class StreamingScd2RecoverySpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Long, Long, Double)

  test("open version survives restart: post-restart change closes it") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("sscd2_ckpt").toString
    val out = Files.createTempDirectory("sscd2_out").toString

    def rows(): Seq[StreamingScd2.ClosedVersion] =
      try spark.read.parquet(out).as[StreamingScd2.ClosedVersion]
        .collect().sortBy(_.version).toSeq
      catch { case _: Throwable => Seq.empty }

    def awaitCount(n: Int): Seq[StreamingScd2.ClosedVersion] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = rows()
      while (System.currentTimeMillis() < deadline && got.size < n) {
        Thread.sleep(250); got = rows()
      }
      got
    }

    def start(input: MemoryStream[Ev]) =
      StreamingScd2.versions(
        input.toDF().toDF("user_id", "event_id", "sec", "value"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
        .start()

    // run 1: open v1 (10 @1000), change closes it and opens v2 (20 @2000)
    val in1 = MemoryStream[Ev]
    val q1 = start(in1)
    try {
      in1.addData(Seq((5L, 1L, 1000L, 10.0), (5L, 2L, 2000L, 20.0)))
      val got = awaitCount(1)
      assert(got == Seq(StreamingScd2.ClosedVersion(5L, 10.0, 1000L, 2000L, 1L)))
    } finally q1.stop()

    // run 2: NEW source, same checkpoint. The replayed first batch is
    // skipped (committed); the new change must close the RECOVERED
    // open version — value 20, valid_from 2000, version 2. A cold
    // start would open version 1 instead and emit version 1 with the
    // wrong interval.
    val in2 = MemoryStream[Ev]
    val q2 = start(in2)
    try {
      in2.addData(Seq((5L, 1L, 1000L, 10.0), (5L, 2L, 2000L, 20.0))) // replay
      in2.addData(Seq((5L, 3L, 3000L, 30.0)))
      val got = awaitCount(2)
      assert(got.size == 2, s"expected 2 closed versions, got ${got.size}")
      assert(got(1) == StreamingScd2.ClosedVersion(5L, 20.0, 2000L, 3000L, 2L),
        s"restart must recover the open version, got ${got(1)}")
    } finally q2.stop()
  }
}
