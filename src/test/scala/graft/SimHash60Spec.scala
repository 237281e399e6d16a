package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHash60

/** The native 60-bit SimHash must match the HOF chain it replaced —
  * same md5-prefix token hash, same ±1 votes, same sign rule. */
class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("native sketch equals the HOF reference on the fixture corpus") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val native = docs.select($"doc_id", SimHash60.of($"text").as("sh"))
    val ref = Dedup.simhashViaHofs(docs)
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "native and HOF SimHash sketches must match row for row")
  }

  test("edge cases and vote-tie behavior match the HOF reference") {
    val docs = Seq(
      (1L, ""),                       // one empty token
      (2L, "solo"),
      (3L, "a a a a"),                // distinctness: equals sketch of "a"
      (4L, "a"),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, "héllo wörld 你好 世界"),
      (7L, "foo bar\n"),              // trailing \n → trailing "" token
      (8L, "\tfoo bar"),              // leading \t → leading "" token
      (9L, " \t a b \n "))            // spaces trimmed, \t/\n kept
      .toDF("doc_id", "text")
    val native = docs.select($"doc_id", SimHash60.of($"text").as("sh"))
    val ref = Dedup.simhashViaHofs(docs)
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
    val m = native.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(3L) == m(4L), "repeated tokens must not change the sketch")
    assert((m(5L) >> 60) == 0L, "sketch must fit in 60 bits")
    // both padded forms yield the distinct set {"", foo, bar}
    assert(m(7L) == m(8L), "leading/trailing empty token: same distinct set")
  }
}
