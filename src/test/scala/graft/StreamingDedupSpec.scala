package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of dd_exact: content-fingerprint dedup with
  * watermark-bounded state. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup collapses duplicates, state is watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("ts", "text")
    val out = StreamingDedup.dedupByFingerprint(docs, "ts", "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("sdedup").outputMode(OutputMode.Append)
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      // whitespace-normalized duplicate + a distinct doc
      input.addData((t0, "hello  world"), (t0, "hello world"),
        (t0, "another document"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 2)
      // the same fingerprint inside the watermark window is suppressed
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), "hello world"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 2)
      // new content still passes
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:06:00"), "fresh doc"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 3)
    } finally q.stop()
  }

  test("streaming triage classifies arrivals against the static corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((0L, "known document one"), (1L, "known document two"))
      .toDF("doc_id", "text")
    val input = MemoryStream[String]
    val out = StreamingDedup.triageAgainstCorpus(
      input.toDF().toDF("text"), corpus)
    val q = out.writeStream
      .format("memory").queryName("striage").outputMode(OutputMode.Append)
      .start()
    try {
      // whitespace-normalized dup of corpus doc 0 + a novel doc
      input.addData("known  document   one", "never seen before")
      q.processAllAvailable()
      val rows = spark.table("striage")
        .collect().map(r => r.getAs[String]("text") ->
          (r.getAs[String]("status"), r.getAs[Any]("dup_of"))).toMap
      assert(rows("known  document   one") == (("exact_dup", 0L)))
      assert(rows("never seen before") == (("novel", null)))
    } finally q.stop()
  }
}
