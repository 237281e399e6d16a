package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-stream interval join: purchases matched to the same user's
  * views within the preceding hour, both sides watermarked so state
  * is bounded (the streaming twin of w_asof_prior_view's time-bounded
  * matching). */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("watermarked purchase-view interval join") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]

    val v = views.toDS()
      .select($"ts".as("v_ts"), $"user".as("v_user"), $"value".as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val p = purchases.toDS()
      .select($"ts".as("p_ts"), $"user".as("p_user"), $"value".as("purchase_id"))
      .withWatermark("p_ts", "2 hours")

    val joined = p.join(v,
      $"p_user" === $"v_user" &&
      $"v_ts" <= $"p_ts" && $"v_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(Ev(ts(10, 0), "a", 1), Ev(ts(10, 30), "a", 2),
        Ev(ts(8, 0), "a", 3),  // too old for the 11:00 purchase
        Ev(ts(10, 15), "b", 4))
      purchases.addData(Ev(ts(11, 0), "a", 100), Ev(ts(12, 30), "b", 200))
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select($"purchase_id", $"view_id").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
      // purchase 100 at 11:00 matches views at 10:00 and 10:30 (within
      // 1h); view at 8:00 is outside; purchase 200 at 12:30 matches
      // nothing (b's view was 10:15)
      assert(got == Seq((100.0, 1.0), (100.0, 2.0)))
    } finally q.stop()
  }
}
