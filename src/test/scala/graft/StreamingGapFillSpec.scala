package graft

import graft.streaming.StreamingGapFill
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** StreamingGapFill: watermark-closed hourly rows with synthetic gap
  * fills. The constructed case pins the exact emission schedule —
  * including the EVENT-TIME TIMER path, where a silent key emits gap
  * rows with no arriving record to ride on — and the fixture case
  * pins parity with the batch w_gap_fill_hourly query on the shared
  * domain (from each type's first observed hour, through the hours
  * the final watermark closed, capped at the batch spine's end). */
class StreamingGapFillSpec extends SparkSpec {
  import spark.implicits._

  private val B = 3600000L // an hour-aligned base second
  private def H(k: Int): Long = B + k * 3600L

  /** Drive batches through the operator; returns (rows collected so
    * far) after each step. Input tuples are (event_type, sec, value). */
  private def drive(batches: Seq[Seq[(String, Long, Double)]])
      : Seq[Seq[(String, Long, Long, Double, Boolean)]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val events = input.toDF().toDF("event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds($"sec"))
    val name = s"gapfill_${System.nanoTime()}"
    val q = StreamingGapFill.filled(events).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.map { b =>
        input.addData(b)
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getBoolean(4))).toSeq
      }
    } finally q.stop()
  }

  test("constructed gaps: closed hours emit exactly once, fills carry forward") {
    val steps = drive(Seq(
      // batch 1: two H0 events for A (nothing closable yet)
      Seq(("A", H(0) + 10, 1.0), ("A", H(0) + 20, 2.0)),
      // batch 2: watermark pusher (wm -> H2+1 after this batch)
      Seq(("zz", H(2) + 1, 0.0)),
      // batch 3: A's H3 event (ahead of wm — delivered); processing
      // sees wm = H2+1 and closes H0 (real) + H1 (gap); wm -> H3+5
      Seq(("A", H(3) + 5, 5.0)),
      // batch 4: pusher only — A's TIMER (H3 <= wm H3+5) fires with
      // zero A rows and closes H2 as a pure gap; wm -> H6+1
      Seq(("zz", H(6) + 1, 0.0)),
      // batch 5: dummy — A's timer (H4 <= wm H6+1) fires again and
      // closes H3 (real), H4 + H5 (gaps)
      Seq(("zz", H(6) + 2, 0.0))))
    // note: the engine's no-data micro-batch (after every watermark
    // advance) is what lets the timers below fire without any
    // further arrival for A — spark.sql.streaming.noDataMicroBatches
    assert(steps(0).filter(_._1 == "A").isEmpty,
      "no hour is closable before the watermark moves")
    val a2 = steps(1).filter(_._1 == "A").sortBy(_._2)
    assert(a2 === Seq(
      ("A", H(0), 2L, 3.0, false),
      ("A", H(1), 0L, 3.0, true)),
      "the pusher batch carried no A rows — H0 (real) + H1 (gap) are " +
        "already timer-driven emissions")
    val a3 = steps(2).filter(_._1 == "A").sortBy(_._2)
    assert(a3.drop(2) === Seq(("A", H(2), 0L, 3.0, true)),
      "wm moved to H3+5 by A's own event; the timer closes H2 as a gap")
    val a4 = steps(3).filter(_._1 == "A").sortBy(_._2)
    assert(a4.drop(3) === Seq(
      ("A", H(3), 1L, 5.0, false),
      ("A", H(4), 0L, 5.0, true),
      ("A", H(5), 0L, 5.0, true)),
      "the H6+1 push must close H3..H5 with carry-forward fills")
    val a5 = steps(4).filter(_._1 == "A").sortBy(_._2)
    assert(a5 === a4, "wm H6+2 closes nothing new (H6 end > wm)")
    // exactly-once per hour across the whole run
    assert(a5.map(_._2) === a5.map(_._2).distinct)
  }

  test("parity with the batch gap-fill on the shared domain") {
    val d = sf("sf0.001")
    val ev = Tables.events(spark, d)
      .select($"event_type", unix_timestamp($"ts").as("sec"), $"value")
      .orderBy($"sec").limit(400)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val (b1, b2) = ev.splitAt(200)
    val far = ev.map(_._2).max + 100L * 3600L
    val steps = drive(Seq(b1.toSeq, b2.toSeq,
      Seq(("zz_pusher", far, 0.0)), Seq(("zz_pusher", far + 1, 0.0))))
    val streamed = steps.last
      .filter(_._1 != "zz_pusher")
      .map(x => (x._1, x._2) -> (x._3, x._4, x._5)).toMap

    // batch twin over the same events (pusher excluded)
    val dir = java.nio.file.Files.createTempDirectory("gf_par").toString
    ev.toSeq.toDF("event_type", "sec", "value")
      .select(lit(0L).as("event_id"),
        timestamp_seconds($"sec").cast("timestamp").as("ts"),
        lit(0L).as("user_id"), $"event_type", $"value",
        lit("").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = queries.EventWindows.qGapFill.run(spark, dir)
      .select(unix_timestamp($"w_start").as("hr"), $"event_type",
        $"n_events", $"ffill_value", $"is_gap")
      .collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap

    // shared domain: from each type's first observed hour (streaming
    // has no leading zero-rows — the declared deviation) through the
    // batch spine's end (streaming runs further, to the pushed wm)
    val firstHr = ev.groupBy(_._1).map { case (t, rows) =>
      t -> Math.floorDiv(rows.map(_._2).min, 3600L) * 3600L }
    val shared = batch.keys.filter { case (t, hr) => hr >= firstHr(t) }
    assert(shared.nonEmpty)
    val diffs = shared.filter(k => streamed.get(k) != batch.get(k))
    assert(diffs.isEmpty,
      s"stream must equal batch on the shared domain; first diffs: " +
        diffs.take(3).map(k => (k, streamed.get(k), batch.get(k))))
    // streaming-only extras beyond the batch spine are all gap rows
    val batchMax = batch.keys.map(_._2).max
    val extras = streamed.filter { case ((_, hr), _) => hr > batchMax }
    assert(extras.values.forall { case (n, _, gap) => n == 0L && gap })
  }

  test("restart recovery: emission resumes from the recovered series point") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("gf_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("gf_out").toString

    def rows(): Seq[(String, Long, Long, Double, Boolean)] =
      try spark.read.parquet(out)
        .as[StreamingGapFill.FilledHour].collect()
        .map(f => (f.event_type, f.w_start_sec, f.n_events,
          f.ffill_value, f.is_gap)).sortBy(_._2).toSeq
      catch { case _: Throwable => Seq.empty }
    def awaitCount(n: Int): Seq[(String, Long, Long, Double, Boolean)] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = rows()
      while (System.currentTimeMillis() < deadline &&
        got.count(_._1 == "A") < n) { Thread.sleep(250); got = rows() }
      got
    }
    def start(input: MemoryStream[(String, Long, Double)]) =
      StreamingGapFill.filled(
        input.toDF().toDF("event_type", "sec", "value")
          .withColumn("ts", timestamp_seconds($"sec")))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

    // run 1: H0 data, wm pushed past H1 — emits H0 real + H1 gap
    val in1 = MemoryStream[(String, Long, Double)]
    val q1 = start(in1)
    try {
      in1.addData(Seq(("A", H(0) + 10, 3.0)))
      q1.processAllAvailable()
      in1.addData(Seq(("zz", H(2) + 1, 0.0)))
      q1.processAllAvailable()
      assert(awaitCount(2).filter(_._1 == "A") === Seq(
        ("A", H(0), 1L, 3.0, false), ("A", H(1), 0L, 3.0, true)))
    } finally q1.stop()

    // run 2: same checkpoint, fresh source. Replayed batches are
    // skipped; pushing the wm further must CONTINUE the series from
    // the recovered point — H2/H3 gaps carrying the recovered 3.0
    // fill, with no duplicate H0/H1 and no cold-start reset.
    val in2 = MemoryStream[(String, Long, Double)]
    val q2 = start(in2)
    try {
      in2.addData(Seq(("A", H(0) + 10, 3.0)))      // committed replay
      in2.addData(Seq(("zz", H(2) + 1, 0.0)))      // committed replay
      in2.addData(Seq(("zz", H(4) + 1, 0.0)))      // the new push
      q2.processAllAvailable()
      val a = awaitCount(4).filter(_._1 == "A")
      assert(a === Seq(
        ("A", H(0), 1L, 3.0, false), ("A", H(1), 0L, 3.0, true),
        ("A", H(2), 0L, 3.0, true), ("A", H(3), 0L, 3.0, true)),
        s"recovered series must continue without duplicates, got $a")
    } finally q2.stop()
  }
}
