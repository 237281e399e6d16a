package graft.tools

import graft.Tables
import graft.model.Listing
import graft.operators.Cdc
import graft.streaming.{StreamingCusum, StreamingDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming operating-point bench (VERDICT r10 #5): the 14 streaming
  * twins are correctness/recovery spec'd on fixtures, but a user's
  * first question about the ingest path is throughput — rows/s,
  * state-store footprint, and how long a kill/restart takes to
  * resume. This main replays the SF-dir events/documents tables as
  * time-ordered micro-batches through the three operators a
  * training-data ingest runs first, and prints ONE JSON line:
  *
  *  - `cusum`: [[StreamingCusum.monitored]] over the full events
  *    table (baseline trained in batch from the same table — the
  *    parity configuration), event-time hour closure via timers;
  *  - `dedup`: [[StreamingDedup.dedupByFingerprint]] over documents
  *    with a deterministic synthetic event-time (1 doc/sec by doc_id)
  *    and a 1h watermark, so state is exercised AND evicted;
  *  - `cdc`: [[Cdc.streamingEventsEventTime]] over sightings derived
  *    from events (mls = user_id, price = cents of value) — the
  *    stateful new/price_change/off_market machine, plus a
  *    KILL/RESTART midway through the replay: the restart resumes
  *    from the checkpoint and the recovery lag (start() to first
  *    committed batch) and the replayed tail are timed separately.
  *
  * Replay protocol: inputs are staged as `slices` range-partitioned
  * parquet files sorted by event time (file k = k-th time slice), and
  * the file source feeds them one per micro-batch
  * (`maxFilesPerTrigger=1`) in path order — so watermarks advance
  * monotonically exactly as they would on a live in-order feed, and
  * the same staging replays identically across runs (and across the
  * kill/restart, which is what makes the recovery number meaningful).
  *
  * Wall times include Spark streaming's per-batch planning overhead —
  * that IS the operating point of a micro-batch engine; rows/s here
  * is end-to-end ingest throughput, not per-operator CPU. State rows
  * and bytes come from the last progress's stateOperators (the
  * HDFS-backed store the specs run on; RocksDB is spec'd separately
  * in RocksDbStateSpec). */
object StreamBench {

  final case class StreamStats(rows: Long, wallSec: Double, batches: Long,
      stateRows: Long, stateBytes: Long, outRows: Long)

  private def statsOf(q: StreamingQuery, rows: Long, wallSec: Double,
      outRows: Long): StreamStats = {
    val ps = q.recentProgress
    val state = ps.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(s => (s.numRowsTotal, s.memoryUsedBytes)))
      .getOrElse(Array.empty)
    StreamStats(rows, wallSec,
      ps.count(_.numInputRows > 0).toLong,
      state.map(_._1).sum, state.map(_._2).sum, outRows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = sys.env.getOrElse("SPARK_GRAFT_STREAM_SLICES", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("stream_bench")
      .toString

    // ---- stage time-ordered slices ----
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    ev.repartitionByRange(slices, $"ts").sortWithinPartitions($"ts")
      .write.parquet(s"$work/events_in")
    val nEvents = spark.read.parquet(s"$work/events_in").count()
    val evSchema = spark.read.parquet(s"$work/events_in").schema

    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text",
        timestamp_seconds(lit(1704067200L) + $"doc_id").as("ts"))
    docs.repartitionByRange(slices, $"ts").sortWithinPartitions($"ts")
      .write.parquet(s"$work/docs_in")
    val nDocs = spark.read.parquet(s"$work/docs_in").count()
    val docSchema = spark.read.parquet(s"$work/docs_in").schema

    def fileStream(dir: String, schema: StructType): DataFrame =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- cusum: online drift over the full events replay ----
    val baseline = StreamingCusum.trainBaseline(ev)
      .as[(String, Long)].collect().toMap
    val cusumStats = {
      val q = StreamingCusum.monitored(
          fileStream(s"$work/events_in", evSchema), baseline)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$work/ckpt_cusum").start()
      val (_, wall) = timed { q.processAllAvailable() }
      val st = statsOf(q, nEvents, wall, -1L)
      q.stop(); st
    }

    // ---- dedup: fingerprint dedup with watermark eviction ----
    val dedupStats = {
      val q = StreamingDedup.dedupByFingerprint(
          fileStream(s"$work/docs_in", docSchema), "ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", s"$work/dedup_out")
        .option("checkpointLocation", s"$work/ckpt_dedup").start()
      val (_, wall) = timed { q.processAllAvailable() }
      val st = statsOf(q, nDocs, wall,
        spark.read.parquet(s"$work/dedup_out").count())
      q.stop(); st
    }

    // ---- cdc: stateful event machine + kill/restart midway ----
    def sightings(in: DataFrame) = in
      .select($"ts", $"user_id", $"value").as[(java.sql.Timestamp, Long, Double)]
      .map { case (ts, uid, v) =>
        Cdc.Sighting(ts, Listing.minimal(uid.toString,
          (v * 100).toLong, foundDate = 1704067200L))
      }
    def cdcQuery() = Cdc.streamingEventsEventTime(
        sightings(fileStream(s"$work/events_in", evSchema)),
        stalenessSec = 3L * 86400)
      .writeStream.format("parquet")
      .option("path", s"$work/cdc_out")
      .option("checkpointLocation", s"$work/ckpt_cdc").start()

    // phase 1: run roughly half the slices, then kill
    val q1 = cdcQuery()
    val deadline = System.currentTimeMillis() + 600000L
    while (q1.recentProgress.count(_.numInputRows > 0) < slices / 2 &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    val phase1Batches = q1.recentProgress.count(_.numInputRows > 0)
    val phase1Rows = q1.recentProgress.map(_.numInputRows).sum
    q1.stop()

    // phase 2: restart from the checkpoint; recovery lag = start() to
    // first committed batch, then drain the tail
    val tRestart = System.nanoTime()
    val q2 = cdcQuery()
    while (q2.recentProgress.isEmpty &&
        System.currentTimeMillis() < deadline + 600000L)
      Thread.sleep(50)
    val recoverySec = (System.nanoTime() - tRestart) / 1e9
    val (_, tailWall) = timed { q2.processAllAvailable() }
    val cdcStats = statsOf(q2, nEvents - phase1Rows, tailWall,
      spark.read.parquet(s"$work/cdc_out").count())
    q2.stop()

    def fmt(n: String, s: StreamStats): String = {
      val rps = if (s.wallSec > 0) (s.rows / s.wallSec).round else 0L
      s""""$n":{"rows":${s.rows},"wall_sec":${f"${s.wallSec}%.2f"},""" +
        s""""rows_per_sec":$rps,"batches":${s.batches},""" +
        s""""state_rows":${s.stateRows},"state_bytes":${s.stateBytes},""" +
        s""""out_rows":${s.outRows}}"""
    }
    println(
      s"""{"metric":"stream_bench","sf_dir":"$sfDir","slices":$slices,""" +
        s""""events":$nEvents,"docs":$nDocs,""" +
        fmt("cusum", cusumStats) + "," + fmt("dedup", dedupStats) + "," +
        fmt("cdc_tail", cdcStats) + "," +
        s""""cdc_phase1":{"batches":$phase1Batches,"rows":$phase1Rows},""" +
        s""""cdc_recovery_sec":${f"$recoverySec%.2f"}}""")
    spark.stop()
  }
}
