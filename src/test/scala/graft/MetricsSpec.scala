package graft

import graft.sinks.Metrics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A2/A3/K5: distributed counters and streaming progress metrics. */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("A2: accumulator counts rows across partitions") {
    val acc = Metrics.counter(spark, "listings_seen")
    Tables.documents(spark, sf("sf0.001")).repartition(4)
      .as[(Long, String, String, String, Long)]
      .foreach(_ => acc.add(1))
    assert(acc.value == 500L)
  }

  test("A3/K5: listener reports batches and input rows per query") {
    implicit val sqlCtx = spark.sqlContext
    val listener = Metrics.listen(spark)
    try {
      val in = MemoryStream[Int]
      val q = in.toDS().select(($"value" * 2).as("v"))
        .writeStream.format("memory").queryName("metrics_q")
        .outputMode("append").start()
      try {
        in.addData(1 to 10: _*)
        q.processAllAvailable()
        in.addData(11 to 15: _*)
        q.processAllAvailable()
      } finally q.stop()
      assert(listener.inputRows.getOrElse("metrics_q", 0L) == 15L)
      assert(listener.batches.getOrElse("metrics_q", 0L) >= 2L)
    } finally spark.streams.removeListener(listener)
  }
}
