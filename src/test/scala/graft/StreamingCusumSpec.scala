package graft

import graft.streaming.StreamingCusum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of w_cusum_drift: with the baseline set to the
  * batch run's own per-type means, the monitor must reproduce the
  * batch rows bit-for-bit for every watermark-closed hour. */
class StreamingCusumSpec extends SparkSpec {
  import spark.implicits._

  test("stream == batch on closed hours; trailing hours close by timer") {
    implicit val sqlCtx = spark.sqlContext
    val d = sf("sf0.001")

    // batch reference rows keyed by (type, hour-second)
    val batch = Registry.byName("w_cusum_drift").run(spark, d).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getBoolean(6))).toMap
    // the batch query's own reference means (integer identity proven
    // by CusumSpec) become the monitor's trained baseline
    val mu = batch.toSeq.groupBy(_._1._1).map { case (t, rs) =>
      t -> rs.map(_._2._1).sum * 1000000L / rs.size }

    val evs = Tables.events(spark, d)
      .select($"ts", $"event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
      .sortBy(_._1.getTime)
    val maxSec = evs.last._1.getTime / 1000L

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingCusum.monitored(
      input.toDF().toDF("ts", "event_type"), mu)
    val q = out.writeStream
      .format("memory").queryName("scusum").outputMode(OutputMode.Append)
      .start()
    try {
      evs.grouped(math.max(1, evs.length / 3)).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("scusum").as[StreamingCusum.DriftRow].collect()
      // exactly the batch hours the final watermark closed, no more
      val wantKeys = batch.keySet.filter(_._2 + 3600L <= maxSec)
      assert(got.map(r => (r.event_type, r.w_start_sec)).toSet == wantKeys,
        s"closed-hour set mismatch: got ${got.length}, want ${wantKeys.size}")
      assert(got.nonEmpty)
      got.foreach { r =>
        val (n, up, dn, fu, fd) = batch((r.event_type, r.w_start_sec))
        assert(r.n_events == n && r.cusum_up_fp == up && r.cusum_dn_fp == dn
          && r.drift_up == fu && r.drift_dn == fd,
          s"row mismatch at ${r.event_type}@${r.w_start_sec}")
      }
    } finally q.stop()
  }
}
