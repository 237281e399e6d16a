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

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("an event type absent from the baseline fails fast") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingCusum.monitored(
      input.toDF().toDF("ts", "event_type"), Map("known" -> 5000000L))
      .writeStream.format("memory").queryName("scusum_ff")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1700000000L), "mystery"))
      val err = intercept[Exception](q.processAllAvailable())
      def root(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else root(t.getCause)
      assert((Option(err.getMessage) ++
          Option(root(err).getMessage)).mkString(" ")
          .contains("no baseline entry"),
        s"must name the misconfiguration, got: $err")
    } finally q.stop()
  }

  test("dropUnknownTypes=true discards unknown hours, scores known ones") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L / 3600L * 3600L
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingCusum.monitored(
      input.toDF().toDF("ts", "event_type"),
      Map("known" -> 2000000L), dropUnknownTypes = true)
      .writeStream.format("memory").queryName("scusum_drop")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(t0 + 10), "known"), (ts(t0 + 20), "known"),
        (ts(t0 + 30), "mystery"),
        // next hour advances the watermark past hour t0 for both keys
        (ts(t0 + 3700), "known"), (ts(t0 + 3700), "mystery"))
      q.processAllAvailable()
      val got = spark.table("scusum_drop").as[StreamingCusum.DriftRow]
        .collect()
      assert(got.map(_.event_type).toSet == Set("known"),
        s"unknown hours must be dropped, not scored: ${got.toSeq}")
      // known hour t0: n=2, mu=2.0 → d=0, slack=0.2 → both sides 0
      val k = got.find(r => r.w_start_sec == t0).get
      assert(k.n_events == 2L && k.cusum_up_fp == 0L && k.cusum_dn_fp == 0L)
    } finally q.stop()
  }

  test("baseline artifact: publish → monitor-from-artifact → atomic refresh") {
    implicit val sqlCtx = spark.sqlContext
    import graft.tools.Versioned
    val d = sf("sf0.001")
    val dir = java.nio.file.Files
      .createTempDirectory("cusum_baseline").toString
    val events = Tables.events(spark, d)

    // v1: trained from the landed table through the versioned pointer
    assert(StreamingCusum.publishBaseline(spark, dir, events) == 1)
    val fromArtifact = StreamingCusum.baselineFrom(spark, dir)
    val direct = StreamingCusum.trainBaseline(events)
      .as[(String, Long)].collect().toMap
    assert(fromArtifact == direct,
      "artifact baseline must equal the in-session training")

    // the monitor resolves the artifact and reproduces the
    // explicit-map monitor on the same stream
    val evs = events.select($"ts", $"event_type").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
      .sortBy(_._1.getTime).take(2000)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingCusum.monitoredFromArtifact(
      input.toDF().toDF("ts", "event_type"), dir)
      .writeStream.format("memory").queryName("scusum_art")
      .outputMode(OutputMode.Append).start()
    val viaArtifact =
      try {
        input.addData(evs.toSeq); q.processAllAvailable()
        spark.table("scusum_art").as[StreamingCusum.DriftRow].collect()
          .map(r => (r.event_type, r.w_start_sec) ->
            (r.n_events, r.cusum_up_fp, r.cusum_dn_fp)).toMap
      } finally q.stop()
    val input2 = MemoryStream[(java.sql.Timestamp, String)]
    val q2 = StreamingCusum.monitored(
      input2.toDF().toDF("ts", "event_type"), direct)
      .writeStream.format("memory").queryName("scusum_map")
      .outputMode(OutputMode.Append).start()
    val viaMap =
      try {
        input2.addData(evs.toSeq); q2.processAllAvailable()
        spark.table("scusum_map").as[StreamingCusum.DriftRow].collect()
          .map(r => (r.event_type, r.w_start_sec) ->
            (r.n_events, r.cusum_up_fp, r.cusum_dn_fp)).toMap
      } finally q2.stop()
    assert(viaArtifact == viaMap && viaArtifact.nonEmpty,
      "artifact-resolved monitor must equal the explicit-map monitor")

    // refresh: publishing again is an ATOMIC pointer flip to v2; the
    // superseded v1 files stay readable for a monitor mid-run
    val v1Dir = Versioned.resolve(spark, dir)
    assert(StreamingCusum.publishBaseline(spark, dir, events) == 2)
    assert(Versioned.current(spark, dir).contains(2))
    assert(spark.read.parquet(v1Dir).count() == direct.size.toLong,
      "old readers' resolved version must survive one publish cycle")
    assert(StreamingCusum.baselineFrom(spark, dir) == direct)
  }
}
