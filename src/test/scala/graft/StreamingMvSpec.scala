package graft

import graft.streaming.StreamingMv
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of q_mv_merge: the engine-maintained streaming
  * aggregate must equal the batch partial over the same rows — bit for
  * bit, for every micro-batch split — because both sides share ONE
  * accumulator algebra (IncrementalAgg.accumulators). */
class StreamingMvSpec extends SparkSpec {
  import spark.implicits._

  // (status, priority, price, sec) — sec turned into a timestamp inside
  private type Fact = (String, String, Double, Long)
  private val keys = Seq("status", "priority")

  private val facts: Seq[Fact] = Seq(
    ("O", "1-URGENT", 100.25, 1000L), ("O", "1-URGENT", 50.75, 2000L),
    ("O", "2-HIGH", 10.10, 1500L), ("F", "1-URGENT", 7.33, 500L),
    ("F", "3-LOW", 0.01, 9000L), ("F", "3-LOW", 123.456, 100L),
    ("P", "5-NONE", 42.0, 4000L))

  private def asFrame(ds: org.apache.spark.sql.DataFrame) = ds
    .toDF("status", "priority", "price", "sec")
    .withColumn("ts", timestamp_seconds($"sec")).drop("sec")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("status", "priority").collect().map(_.toString).toSeq

  private def runStream(batches: Seq[Seq[Fact]], name: String): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fact]
    val mv = StreamingMv.view(asFrame(input.toDF()), keys, $"price", $"ts")
    val q = mv.writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Complete)
      .start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      canon(spark.table(name))
    } finally q.stop()
  }

  test("streamed MV equals the batch partial for every micro-batch split") {
    val batch = canon(operators.IncrementalAgg.present(
      operators.IncrementalAgg.partial(
        asFrame(facts.toDF()), keys, $"price", $"ts"), keys))
    assert(batch.nonEmpty)
    assert(runStream(Seq(facts), "smv_whole") == batch)
    assert(runStream(Seq(facts.take(2), facts.slice(2, 5), facts.drop(5)),
      "smv_split") == batch)
    // one row per micro-batch: the pathological split
    assert(runStream(facts.map(Seq(_)), "smv_rowwise") == batch)
  }

  test("MV stays current mid-stream: each prefix equals its batch partial") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Fact]
    val mv = StreamingMv.view(asFrame(input.toDF()), keys, $"price", $"ts")
    val q = mv.writeStream
      .format("memory").queryName("smv_prefix").outputMode(OutputMode.Complete)
      .start()
    try {
      val splits = Seq(facts.take(3), facts.slice(3, 6), facts.drop(6))
      var seen = Seq.empty[Fact]
      splits.foreach { b =>
        input.addData(b); q.processAllAvailable()
        seen ++= b
        val expect = canon(operators.IncrementalAgg.present(
          operators.IncrementalAgg.partial(
            asFrame(seen.toDF()), keys, $"price", $"ts"), keys))
        assert(canon(spark.table("smv_prefix")) == expect,
          s"after ${seen.length} facts")
      }
    } finally q.stop()
  }
}
