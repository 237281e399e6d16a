package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The 100 TB streaming-state story: the default state store keeps
  * every key in executor heap (plus HDFS snapshots) — a corpus-scale
  * key space OOMs it long before a big deployment's watermark ever
  * fires. Spark's RocksDB state store provider spills state to local
  * disk with changelog checkpointing, and is pure configuration for
  * every stateful operator in this repo. This spec pins the wiring:
  * a watermarked windowed aggregation runs on RocksDB state, results
  * equal the batch formulation, and a NEW query over the same
  * checkpoint recovers the RocksDB state across a kill/restart
  * (windows spanning the restart aggregate correctly, nothing
  * re-emits). Sink is parquet — the memory sink cannot recover. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("windowed agg on RocksDB state survives kill/restart with state intact") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = util.Try(spark.conf.get(providerKey)).toOption
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = Files.createTempDirectory("rocks_ckpt").toString
    val out = Files.createTempDirectory("rocks_out").toString

    def agg(src: org.apache.spark.sql.Dataset[Ev]) = src
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"window.start".as("w"), $"user", $"n", $"v")

    def rows(): Seq[(String, String, Long, Double)] =
      try spark.read.parquet(out)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).sorted.toSeq
      catch { case _: Throwable => Seq.empty }

    // Wait for rows matching pred — NOT for any n rows: the z flush
    // windows can land in the sink before a's recovered window does,
    // and a bare row-count await would return early with only those
    // (seen as a load-dependent flake in-suite).
    def awaitMatching(pred: ((String, String, Long, Double)) => Boolean)
        : Seq[(String, String, Long, Double)] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = rows().filter(pred)
      while (System.currentTimeMillis() < deadline && got.isEmpty) {
        Thread.sleep(250); got = rows().filter(pred)
      }
      got
    }

    try {
      // run 1: open the 10:00 window for a, close nothing yet
      val in1 = MemoryStream[Ev]
      val q1 = agg(in1.toDS()).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try {
        in1.addData(Ev(ts(0), "a", 1.0), Ev(ts(2), "a", 2.0))
        q1.processAllAvailable()
        assert(rows().isEmpty, "window still open — nothing emits")
      } finally q1.stop()

      // run 2: NEW query, same checkpoint. The restart must recover
      // the OPEN 10:00 window's partial (1.0 + 2.0) from RocksDB,
      // fold in one more event, and emit the closed window with all
      // three contributions once the watermark passes.
      val in2 = MemoryStream[Ev]
      val q2 = agg(in2.toDS()).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try {
        // first addData replays the committed offset — the engine
        // skips it (already processed); see CdcRecoverySpec
        in2.addData(Ev(ts(0), "a", 1.0), Ev(ts(2), "a", 2.0))
        in2.addData(Ev(ts(4), "a", 4.0)) // same 10:00 window
        q2.processAllAvailable()
        in2.addData(Ev(ts(20), "z", 0.0)) // watermark → 10:10, closes 10:00
        q2.processAllAvailable()
        in2.addData(Ev(ts(40), "z", 0.0)) // flush
        q2.processAllAvailable()
        val got = awaitMatching(_._2 == "a")
        assert(got == Seq(("2024-01-01 10:00:00.0", "a", 3L, 7.0)),
          s"recovered window must carry pre-restart state: $got")
      } finally q2.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
