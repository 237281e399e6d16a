package graft

import graft.model.{Listing, ListingEvent}
import graft.operators.Cdc
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time CDC (the replayable J3): off_market expiry is driven by
  * the WATERMARK passing lastSeen + staleness — pure event time — so
  * a historical log replays to identical events (including days on
  * market) no matter when or how fast it runs. Mirrors CdcSpec's
  * 3-cycle scenario with watermark-driven expiry, then pins replay
  * determinism and checkpoint recovery across the expiry.
  */
class CdcEventTimeSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000L
  private def at(sec: Long, l: Listing) = Cdc.Sighting(
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), l)
  private def atMs(ms: Long, l: Listing) = Cdc.Sighting(
    new java.sql.Timestamp(ms), l)

  private def awaitRows(table: String, want: Seq[ListingEvent] => Boolean,
      timeoutMs: Long = 60000): Seq[ListingEvent] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var got = spark.table(table).as[ListingEvent].collect().toSeq
    while (System.currentTimeMillis() < deadline && !want(got)) {
      Thread.sleep(200)
      got = spark.table(table).as[ListingEvent].collect().toSeq
    }
    got
  }

  test("3-cycle with watermark-driven expiry: new, price_change, off_market") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cdc.Sighting]
    val q = Cdc.streamingEventsEventTime(input.toDS(), stalenessSec = 300)
      .writeStream.format("memory").queryName("cdc_et")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(at(t0, Listing.minimal("A", 100)))
      q.processAllAvailable()
      input.addData(at(t0 + 60, Listing.minimal("A", 80)),
        at(t0 + 60, Listing.minimal("B", 50)))
      q.processAllAvailable()
      // A's last sighting is t0+60 → expiry at t0+360. C@t0+400 pushes
      // the watermark past it; the timeout fires on the no-data batch
      // the watermark advance schedules.
      input.addData(at(t0 + 400, Listing.minimal("C", 10)))
      q.processAllAvailable()
      // A and B both last seen t0+60 → both expire at t0+360 < t0+400
      val got = awaitRows("cdc_et", _.size >= 6)
        .map(e => (e.mls, e.status)).sorted
      assert(got == Seq(("A", "new_listing"), ("A", "price_change"),
        ("A", "off_market"), ("B", "new_listing"), ("B", "off_market"),
        ("C", "new_listing")).sorted, s"got $got")
      // days on market comes from EVENT time: (t0+60+300 − foundDate)/86400
      val offs = spark.table("cdc_et").as[ListingEvent]
        .filter(_.status == "off_market").collect()
      assert(offs.forall(_.timeOnMarketDays
          .contains(((t0 + 360L) / 86400L).toInt)),
        s"days must derive from event time, got ${offs.toSeq}")
    } finally q.stop()
  }

  test("replay determinism: the same log yields identical events, twice") {
    implicit val sqlCtx = spark.sqlContext
    def runOnce(name: String)
        : Seq[(String, String, Option[Int], Option[Long], Long)] = {
      val input = MemoryStream[Cdc.Sighting]
      val q = Cdc.streamingEventsEventTime(input.toDS(), stalenessSec = 300)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // out-of-order WITHIN the batch: the t0+90 sighting arrives
        // before the t0+30 one; event-time order must win (price path
        // 100 → 70 → 80, so the final change reports oldPrice 70)
        input.addData(at(t0, Listing.minimal("A", 100)))
        q.processAllAvailable()
        input.addData(at(t0 + 90, Listing.minimal("A", 80)),
          at(t0 + 30, Listing.minimal("A", 70)))
        q.processAllAvailable()
        input.addData(at(t0 + 500, Listing.minimal("Z", 1)))
        q.processAllAvailable()
        awaitRows(name, _.exists(_.status == "off_market"))
          .map(e => (e.mls, e.status, e.timeOnMarketDays, e.oldPrice,
            e.price))
          .sortBy(t => (t._1, t._2, t._5))
      } finally q.stop()
    }
    val first = runOnce("cdc_replay1")
    val second = runOnce("cdc_replay2")
    assert(first == second, s"replay diverged:\n$first\n$second")
    assert(first.exists(t => t._1 == "A" && t._2 == "off_market" &&
      t._3.contains(((t0 + 90 + 300) / 86400L).toInt)),
      s"expiry must key off the latest EVENT time, got $first")
    // event-time ordering inside the unordered batch: 100→70 then
    // 70→80 (arrival order would have produced 100→80 then 80→70)
    val changes = first.filter(_._2 == "price_change")
      .map(t => (t._4, t._5)).toSet
    assert(changes == Set((Some(100L), 70L), (Some(70L), 80L)),
      s"in-batch sightings must process in ts order, got $changes")
  }

  test("stale cross-batch sighting under watermark delay is ignored") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cdc.Sighting]
    // 120s watermark delay: a sighting OLDER than applied state can
    // arrive in a later batch while still above the watermark. It must
    // not regress the state's listing (ADVICE r9 — the old code kept
    // max(lastSeenSec) but overwrote the listing with the stale one,
    // yielding inverted price_change events on the next sighting).
    val q = Cdc.streamingEventsEventTime(input.toDS(), stalenessSec = 3000,
        watermarkDelay = "120 seconds")
      .writeStream.format("memory").queryName("cdc_stale")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(at(t0 + 100, Listing.minimal("A", 100)))
      q.processAllAvailable()
      // late but in-watermark: event time BEFORE the applied sighting
      input.addData(at(t0 + 50, Listing.minimal("A", 70)))
      q.processAllAvailable()
      // same price as the applied (non-stale) state → must be a no-op;
      // against regressed price-70 state it would emit 70→100
      input.addData(at(t0 + 200, Listing.minimal("A", 100)))
      q.processAllAvailable()
      val got = spark.table("cdc_stale").as[ListingEvent].collect()
        .map(e => (e.mls, e.status)).toSeq.sorted
      assert(got == Seq(("A", "new_listing")),
        s"stale sighting must not disturb state, got $got")
    } finally q.stop()
  }

  test("sub-second price change (same floor-second, later ms) is applied") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Cdc.Sighting]
    val q = Cdc.streamingEventsEventTime(input.toDS(), stalenessSec = 300)
      .writeStream.format("memory").queryName("cdc_ms")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(atMs(t0 * 1000 + 100, Listing.minimal("A", 100)))
      q.processAllAvailable()
      // 400ms later — SAME floor second, genuinely later, new price.
      // Millisecond-granularity state (ADVICE r10) applies it; the old
      // second-granularity state silently dropped it, diverging from
      // the per-sighting batch twin.
      input.addData(atMs(t0 * 1000 + 500, Listing.minimal("A", 90)))
      q.processAllAvailable()
      // a cross-batch replay of the exact same millisecond stays a
      // no-op (state advance is still strict)
      input.addData(atMs(t0 * 1000 + 500, Listing.minimal("A", 90)))
      q.processAllAvailable()
      val got = spark.table("cdc_ms").as[ListingEvent].collect()
        .map(e => (e.mls, e.status, e.oldPrice, e.price)).toSeq.sorted
      assert(got == Seq(("A", "new_listing", None, 100L),
        ("A", "price_change", Some(100L), 90L)).sorted,
        s"sub-second change must be applied exactly once, got $got")
    } finally q.stop()
  }

  test("restart over a legacy seconds-granularity checkpoint fails fast") {
    // The r10→r11 state change reinterpreted SeenState's Long slot
    // (lastSeenSec → lastSeenMs). Spark's state schema check compares
    // types IGNORING field names, so a 2-field (Listing, Long) legacy
    // checkpoint would have loaded cleanly and been read at the wrong
    // unit — seconds collapsing to ~1970 under floorDiv(ms, 1000),
    // timers clamping to watermark+1, spurious off_market events
    // (ADVICE r11). SeenState now carries an explicit version FIELD:
    // the schema SHAPE differs, so the restart must throw
    // StateSchemaNotCompatible instead of silently corrupting timers.
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("cdc_legacy_ckpt").toString
    val out = Files.createTempDirectory("cdc_legacy_out").toString

    // run 1: write state with the LEGACY shape — same field types and
    // order as the r10 SeenState (Listing struct + Long seconds)
    val in1 = MemoryStream[Cdc.Sighting]
    val legacy = in1.toDS().withWatermark("ts", "0 seconds")
      .groupByKey(_.listing.mls)
      .flatMapGroupsWithState[(Listing, Long), ListingEvent](
        OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          val s = rows.toVector.maxBy(_.ts.getTime)
          state.update((s.listing, s.ts.getTime / 1000L))
          state.setTimeoutTimestamp(
            math.max((s.ts.getTime / 1000L + 300L) * 1000L,
              state.getCurrentWatermarkMs() + 1L))
          Iterator.single(ListingEvent(s.listing.mls, "new_listing", None,
            s.listing.price, None, None, None, s.listing.source))
      }
    val q1 = legacy.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
      .start()
    try {
      in1.addData(at(t0, Listing.minimal("A", 100)))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: the current ms-granularity operator over the SAME
    // checkpoint — must fail fast on the state schema, not run
    val in2 = MemoryStream[Cdc.Sighting]
    val q2 = Cdc.streamingEventsEventTime(in2.toDS(), stalenessSec = 300)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
      .start()
    val thrown = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        // first batch replays the committed offset (MemoryStream
        // restart contract — same as the recovery test above); the
        // second is genuinely new, forcing a stateful batch to plan
        in2.addData(at(t0, Listing.minimal("A", 100)))
        in2.addData(at(t0 + 60, Listing.minimal("A", 90)))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val msgs = chain(thrown).map(t =>
      s"${t.getClass.getName}: ${t.getMessage}").mkString("\n")
    assert(msgs.toLowerCase.contains("schema"),
      s"restart must fail on STATE SCHEMA incompatibility, got:\n$msgs")
  }

  test("kill/restart across the expiry: recovered state still expires on time") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("cdc_et_ckpt").toString
    val out = Files.createTempDirectory("cdc_et_out").toString
    def events(): Seq[(String, String, Option[Int])] =
      try spark.read.parquet(out).as[ListingEvent].collect()
        .map(e => (e.mls, e.status, e.timeOnMarketDays)).sorted.toSeq
      catch { case _: Throwable => Seq.empty }
    def awaitCount(n: Int): Seq[(String, String, Option[Int])] = {
      val deadline = System.currentTimeMillis() + 60000
      var got = events()
      while (System.currentTimeMillis() < deadline && got.size < n) {
        Thread.sleep(250); got = events()
      }
      got
    }

    // run 1: A seen, then killed BEFORE anything expires
    val in1 = MemoryStream[Cdc.Sighting]
    val q1 = Cdc.streamingEventsEventTime(in1.toDS(), stalenessSec = 300)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
      .start()
    try {
      in1.addData(at(t0, Listing.minimal("A", 100)))
      assert(awaitCount(1).map(t => (t._1, t._2)) ==
        Seq(("A", "new_listing")))
    } finally q1.stop()

    // run 2: same checkpoint; the watermark advance past A's expiry
    // must fire the RECOVERED timer with event-time-deterministic days
    val in2 = MemoryStream[Cdc.Sighting]
    val q2 = Cdc.streamingEventsEventTime(in2.toDS(), stalenessSec = 300)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode(OutputMode.Append)
      .start()
    try {
      in2.addData(at(t0, Listing.minimal("A", 100))) // committed-offset replay
      in2.addData(at(t0 + 400, Listing.minimal("C", 10)))
      val got = awaitCount(3)
      assert(got.map(t => (t._1, t._2)) == Seq(("A", "new_listing"),
        ("A", "off_market"), ("C", "new_listing")), s"got $got")
      val offDays = got.find(_._2 == "off_market").flatMap(_._3)
      assert(offDays.contains(((t0 + 300L) / 86400L).toInt),
        s"recovered expiry must stay event-time-deterministic, got $offDays")
    } finally q2.stop()
  }
}
