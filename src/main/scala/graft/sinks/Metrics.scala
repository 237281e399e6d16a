package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.util.LongAccumulator
import scala.collection.concurrent.TrieMap

/** A2/A3/K5 — the reference's mutable counters and progress prints
  * (ure_scraping.py:21,43-44; main.py:100,108-111,123,136) as Spark
  * primitives: distributed LongAccumulators for row counts and a
  * StreamingQueryListener for per-batch progress, replacing stdout
  * prints with queryable metrics.
  */
object Metrics {

  /** A2: a named distributed row counter (per-zip / global listing
    * counters in the reference). */
  def counter(spark: SparkSession, name: String): LongAccumulator =
    spark.sparkContext.longAccumulator(name)

  /** K5/A3: per-query progress — batches seen and rows ingested,
    * keyed by query name (the search-cycle counter analog). */
  final class ProgressListener extends StreamingQueryListener {
    val batches = new TrieMap[String, Long]()
    val inputRows = new TrieMap[String, Long]()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
      batches.updateWith(name) { c => Some(c.getOrElse(0L) + 1) }
      inputRows.updateWith(name) { c =>
        Some(c.getOrElse(0L) + e.progress.numInputRows)
      }
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  def listen(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.streams.addListener(l)
    l
  }
}
