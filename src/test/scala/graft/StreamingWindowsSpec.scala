package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Top-level so Spark can generate its encoder without an outer scope. */
case class Ev(ts: Timestamp, user: String, value: Double)

/** M5 streaming surface: watermarked tumbling windows and session
  * windows over an event stream (the streaming twins of the
  * EventWindows batch queries). */
class StreamingWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("watermarked tumbling window aggregation emits closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start".as("w"), $"user", $"n", $"v")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(ts(0), "a", 1.0), Ev(ts(2), "a", 2.0), Ev(ts(6), "b", 5.0))
      q.processAllAvailable()
      // advance watermark past 10:05 window: event at 10:20 → wm 10:10
      input.addData(Ev(ts(20), "a", 1.0))
      q.processAllAvailable()
      input.addData(Ev(ts(40), "a", 1.0)) // flush more
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"w", $"user", $"n", $"v").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .sorted
      assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 10:05:00.0", "b", 1L, 5.0)))
      // late data behind the watermark is dropped (T6 extension)
      input.addData(Ev(ts(1), "a", 99.0))
      q.processAllAvailable()
      val after = spark.table("win_out")
        .filter($"w" === lit(Timestamp.valueOf("2024-01-01 10:00:00"))).count()
      assert(after == 1) // unchanged — late row discarded
    } finally q.stop()
  }

  test("session_window groups events by 10-minute gaps per user") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window($"ts", "10 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
      .select($"session_window.start".as("s"), $"user", $"n")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user a: events at 10:00, 10:05 (one session), 10:30 (new session)
      input.addData(Ev(ts(0), "a", 1), Ev(ts(5), "a", 1), Ev(ts(30), "a", 1))
      q.processAllAvailable()
      // push watermark past 10:40 (end of a's second session): an event
      // at 11:30 puts the watermark at 11:00
      input.addData(Ev(Timestamp.valueOf("2024-01-01 11:30:00"), "z", 1))
      q.processAllAvailable()
      input.addData(Ev(Timestamp.valueOf("2024-01-01 11:31:00"), "z2", 1))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .filter($"user" === "a")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).sorted
      assert(rows.toSeq == Seq(("2024-01-01 10:00:00.0", 2L),
        ("2024-01-01 10:30:00.0", 1L)))
    } finally q.stop()
  }

  test("watermarked hopping windows: every event lands in span/slide windows") {
    // the streaming twin of w_hopping_1h_15m's semantics, at test
    // scale (4-minute span, 1-minute slide → fan-out 4)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "4 minutes", "1 minute"))
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start".as("w"), $"n", $"v")
    val q = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(ts(10), "a", 1.0), Ev(ts(11), "b", 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts(30), "z", 0.0)) // advance watermark, close all
      q.processAllAvailable()
      input.addData(Ev(ts(50), "z", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hop_out")
        .filter($"w" < lit(Timestamp.valueOf("2024-01-01 10:20:00")))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1),
          r.getDouble(2))).sorted.toSeq
      // 10:10 event → windows starting 10:07..10:10; 10:11 → 10:08..10:11
      assert(rows == Seq(
        ("2024-01-01 10:07:00.0", 1L, 1.0),
        ("2024-01-01 10:08:00.0", 2L, 3.0),
        ("2024-01-01 10:09:00.0", 2L, 3.0),
        ("2024-01-01 10:10:00.0", 2L, 3.0),
        ("2024-01-01 10:11:00.0", 1L, 2.0)))
      // batch parity: the same rows from the batch formulation
      val batch = Seq(Ev(ts(10), "a", 1.0), Ev(ts(11), "b", 2.0)).toDS()
        .groupBy(window($"ts", "4 minutes", "1 minute"))
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .select($"window.start".as("w"), $"n", $"v")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1),
          r.getDouble(2))).sorted.toSeq
      assert(batch == rows, "stream must equal the batch hopping result")
    } finally q.stop()
  }
}
