package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

/** Hard gates for t_bpe_encode. The TRAINER stays spec-gated (no
  * single SQL statement replays an iterative argmax artifact — the
  * BpeTrainer scaladoc's stance); the ENCODER is driver-oracle'd via
  * [[queries.TextAnalysis.bpeEncodeOracleSql]], whose string-replace
  * representation this spec pins against the engine (the DuckDB run
  * itself is the driver's hash-compare). Construction anchors:
  *  - zero merges → per-doc BPE count equals exact character mass
  *    (every char is its own symbol, </w> riding the last) — an
  *    arithmetic anchor independent of the rewrite code;
  *  - symbol concatenation reconstructs every word type exactly
  *    (nothing lost, nothing invented, order preserved);
  *  - token counts are monotone non-increasing in the merge budget,
  *    per document, and bounded below by the whitespace count;
  *  - the classic Sennrich corpus encodes to the hand-computable
  *    counts after its known 4 merges.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf("sf0.001"))
    .select($"doc_id", $"text")

  test("zero-merge encoding equals exact per-doc character mass") {
    val enc = BpeTrainer.encode(spark, docs, Seq.empty)
    val mass = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"doc_id")
      .agg(sum(length($"w")).as("char_mass"), count(lit(1)).as("n_words"))
    val joined = enc.join(mass, "doc_id").cache()
    assert(joined.count() > 0)
    assert(joined.filter($"bpe_tokens" =!= $"char_mass").count() === 0,
      "with no merges every character is one symbol")
    assert(joined.filter($"ws_tokens" =!= $"n_words").count() === 0)
  }

  test("symbol concatenation reconstructs every word type") {
    val merges = BpeTrainer.train(spark, docs, 10)
    val types = docs
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .filter(length($"w") > 0).distinct().as[String]
    val enc = BpeTrainer.encodeTypes(spark, types, merges)
    val broken = enc.select($"w",
        concat_ws("", transform($"symbols", s => s)).as("joined"))
      .filter($"joined" =!= concat($"w", lit("</w>")))
      .count()
    assert(broken === 0, "encode must partition the word's characters")
  }

  test("token counts are monotone in merge budget and >= whitespace count") {
    val merges = BpeTrainer.train(spark, docs, 10)
    val e10 = BpeTrainer.encode(spark, docs, merges)
      .withColumnRenamed("bpe_tokens", "t10")
    val e5 = BpeTrainer.encode(spark, docs, merges.take(5))
      .withColumnRenamed("bpe_tokens", "t5")
    val j = e10.join(e5.select($"doc_id", $"t5"), "doc_id").cache()
    assert(j.filter($"t10" > $"t5").count() === 0,
      "a longer merge prefix can only merge more")
    assert(j.filter($"t10" < $"ws_tokens").count() === 0,
      "every word is at least one symbol")
  }

  /** Scala model of bpeEncodeOracleSql's per-word-type pipeline:
    * chr(1)-wrapped initial symbols, one java String.replace per merge
    * (java and DuckDB replace share left-to-right, non-overlapping,
    * resume-after-substitution semantics), wrapper-count / 2. */
  private def oracleModelNSym(w: String,
      merges: Seq[BpeTrainer.Merge]): Long = {
    val S = "\u0001"
    val wrapped = w.toCharArray.map(c => S + c + S).mkString
    val s0 = wrapped.substring(0, wrapped.length - 1) + "</w>" + S
    val s = merges.sortBy(_.rank).foldLeft(s0)((acc, m) =>
      acc.replace(S + m.left + S + S + m.right + S, S + m.left + m.right + S))
    (s.length - s.replace(S, "").length) / 2L
  }

  test("SQL-oracle representation matches the engine on every word type") {
    val merges = BpeTrainer.train(spark, docs, 20)
    val types = docs
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .filter(length($"w") > 0).distinct().as[String]
    val engine = BpeTrainer.encodeTypes(spark, types, merges)
      .select($"w", $"n_sym").as[(String, Long)].collect()
    assert(engine.nonEmpty)
    val bad = engine.filter { case (w, n) =>
      oracleModelNSym(w, merges) != n
    }
    assert(bad.isEmpty,
      s"oracle representation diverges on ${bad.take(5).mkString(", ")}")
  }

  test("SQL-oracle representation survives adversarial merge overlaps") {
    // the cases where naive string encodings break: runs of the same
    // symbol (non-overlapping left-to-right), merged-symbol boundary
    // fusion, and pairs that appear INSIDE a longer symbol
    def m(rank: Int, l: String, r: String) = BpeTrainer.Merge(rank, l, r, 1L)
    val cases = Seq(
      ("aaaa", Seq(m(0, "a", "a"))),                      // [aa, aa]
      ("aaa", Seq(m(0, "a", "a"))),                       // [aa, a</w>... ]
      ("abab", Seq(m(0, "a", "b"), m(1, "ab", "ab"))),    // chained merge
      ("aab", Seq(m(0, "a", "b"))),                       // no cross-symbol
      ("abc", Seq(m(0, "a", "b"), m(1, "b", "c"))),       // b consumed first
      ("xaaay", Seq(m(0, "a", "a"), m(1, "aa", "a"))),
      ("lowlow", Seq(m(0, "l", "o"), m(1, "lo", "w"))))
    for ((w, ms) <- cases) {
      val engine = BpeTrainer
        .encodeTypes(spark, spark.createDataset(Seq(w)), ms)
        .select($"n_sym").as[Long].head()
      assert(oracleModelNSym(w, ms) === engine,
        s"divergence on word '$w' with merges $ms")
    }
  }

  test("fixture corpus is ASCII and chr(1)-free (oracle precondition)") {
    // the chr(1) wrapper may not collide with symbol content, and
    // Spark's UTF-16 toCharArray must agree with RE2's per-codepoint
    // '(.)' — both hold iff the corpus is 7-bit ASCII without chr(1)
    for (d <- Seq("sf0.001", "sf0.01")) {
      val n = Tables.documents(spark, sf(d))
        .filter($"text".rlike("[^\\x02-\\x7f]"))
        .count()
      assert(n === 0, s"non-ASCII or control chars in $d documents")
    }
  }

  test("classic corpus encodes to hand-computable counts") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — after the 4
    // learned merges (e+s, es+t</w>, l+o, then e+w: the count-6 tie
    // (e,w)/(n,e)/(w,est</w>) breaks lexicographically to (e, w)):
    //   low    -> [lo, w</w>]               = 2 symbols
    //   lower  -> [lo, w, e, r</w>]         = 4 symbols
    //   newest -> [n, ew, est</w>]          = 3 symbols
    //   widest -> [w, i, d, est</w>]        = 4 symbols
    val corpus = Seq(
      (0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val ms = BpeTrainer.train(spark, corpus, 4)
    val enc = BpeTrainer.encode(spark, corpus, ms).collect()
    assert(enc.length === 1)
    val row = enc.head
    assert(row.getLong(row.fieldIndex("ws_tokens")) === 16L)
    val expected = 5L * 2 + 2L * 4 + 6L * 3 + 3L * 4
    assert(row.getLong(row.fieldIndex("bpe_tokens")) === expected)
  }
}
