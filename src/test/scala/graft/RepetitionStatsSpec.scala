package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RepetitionStats

/** The native counting pass must be indistinguishable from the HOF
  * formulation it replaced — row for row on real fixtures and on the
  * adversarial edges (empty text, single token, all-same, no-repeat,
  * unicode tokens). */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("native t_repetition equals the HOF reference on the fixture corpus") {
    val native = TextAnalysis.qRepetition.run(spark, sf("sf0.001"))
    val ref = TextAnalysis.repetitionViaHofs(
      Tables.documents(spark, sf("sf0.001")))
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "native and HOF repetition stats must match row for row")
  }

  test("edge cases: counters match the HOF reference") {
    val docs = Seq(
      (1L, ""),
      (2L, "solo"),
      (3L, "a a a a a"),
      (4L, "all distinct tokens here now"),
      (5L, "x y x y x y"),
      (6L, "  padded   whitespace  runs  "),
      (7L, "héllo wörld héllo wörld héllo"),
      (8L, "foo bar\n"),               // trailing \n → trailing "" token
      (9L, "\tfoo bar"),               // leading \t → leading "" token
      (10L, " \t a b \n "),            // spaces trimmed, \t/\n kept
      (11L, "a\r\nb"))
      .toDF("doc_id", "text")
    val native = docs.select($"doc_id", RepetitionStats.of($"text").as("st"))
      .select($"doc_id", $"st.n_tokens", $"st.top_token_count",
        $"st.n_bigrams", $"st.n_distinct_bigrams")
    val rows = native.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(rows(1L) == ((1, 1, 0, 0)))      // "" splits to one empty token
    assert(rows(2L) == ((1, 1, 0, 0)))
    assert(rows(3L) == ((5, 5, 4, 1)))      // one bigram "a a", repeated
    assert(rows(4L) == ((5, 1, 4, 4)))
    assert(rows(5L) == ((6, 3, 5, 2)))      // "x y" and "y x"
    assert(rows(6L) == ((3, 1, 2, 2)))      // trim + \s+ collapse
    assert(rows(7L) == ((5, 3, 4, 2)))      // unicode token identity
    assert(rows(8L) == ((3, 1, 2, 2)))      // SQL trim keeps \n → "" token
    assert(rows(9L) == ((3, 1, 2, 2)))      // leading \t → leading "" token
    assert(rows(10L) == ((4, 2, 3, 3)))     // "" appears twice → top 2
    assert(rows(11L) == ((2, 1, 1, 1)))     // \r\n is one \s+ run
    val ref = TextAnalysis.repetitionViaHofs(docs)
    val nat = docs.select($"doc_id", RepetitionStats.of($"text").as("st"))
      .select($"doc_id", $"st.n_tokens".as("n_tokens"),
        $"st.top_token_count".as("top_token_count"),
        round($"st.top_token_count".cast("double") / $"st.n_tokens", 6)
          .as("top_token_ratio"),
        when($"st.n_bigrams" > 0,
          round(lit(1.0) -
            $"st.n_distinct_bigrams".cast("double") / $"st.n_bigrams", 6))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
    assert(nat.exceptAll(ref).isEmpty && ref.exceptAll(nat).isEmpty)
  }
}
