package graft

import org.apache.spark.sql.functions._

/** dd_substring_runs: cross-document verbatim token runs via k-gram
  * anchors + chain extension (k = 8 on the fixtures). Constructed
  * overlapping-document fixtures pin run lengths, the boilerplate df
  * cap, sub-k docs, and alignment determinism. */
class SubstringRunsSpec extends SparkSpec {
  import spark.implicits._

  private def runsOn(texts: Seq[(Long, String)]) = {
    val df = texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("subruns").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    queries.Dedup.qSubstringRuns.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
  }

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("exact run lengths: a 20-token overlap at shifted positions") {
    // d1 = u1..u10 ++ s1..s20; d2 = v1..v5 ++ s1..s20 ++ w1..w5 —
    // the shared block sits at DIFFERENT positions (11 vs 6), which
    // only the per-alignment (delta) chaining can line up
    val shared = toks("s", 20)
    val got = runsOn(Seq(
      1L -> (toks("u", 10) + " " + shared),
      2L -> (toks("v", 5) + " " + shared + " " + toks("w", 5)),
      3L -> toks("z", 40))) // no overlap ≥ 8 with anyone
    assert(got.keySet == Set((1L, 2L)), s"got $got")
    assert(got((1L, 2L)) == (20L, 1L),
      s"one maximal 20-token run expected, got ${got((1L, 2L))}")
  }

  test("threshold behavior: k and k-1 token overlaps") {
    val exactly8 = toks("e", 8)
    val only7 = toks("f", 7)
    val got = runsOn(Seq(
      1L -> (toks("a", 10) + " " + exactly8),
      2L -> (exactly8 + " " + toks("b", 10)),
      3L -> (toks("c", 10) + " " + only7),
      4L -> (only7 + " " + toks("d", 10))))
    assert(got.keySet == Set((1L, 2L)),
      s"a 7-token overlap is below the k=8 floor: $got")
    assert(got((1L, 2L)) == (8L, 1L))
  }

  test("a doc with fewer than k tokens anchors nothing") {
    val got = runsOn(Seq(
      1L -> toks("s", 7), // 7 < k — cannot contain an 8-token run
      2L -> (toks("s", 7) + " extra tokens here to pass eight total")))
    assert(got.isEmpty, s"sub-k docs must not pair: $got")
  }

  test("boilerplate cap: a gram in >64 docs cannot bridge pairs") {
    // 70 docs share ONE 8-token block (df = 70 > 64) plus unique
    // tails; two other docs share a rare 10-token run. Only the rare
    // pair may report — the boilerplate block is dropped before the
    // join, so the 70-doc clique contributes ZERO of its ~2,400 pairs.
    val boiler = toks("boil", 8)
    val rare = toks("r", 10)
    val clique = (1L to 70L).map(i => i -> (boiler + " " + toks(s"u${i}_", 8)))
    val got = runsOn(clique ++ Seq(
      100L -> (toks("x", 5) + " " + rare),
      101L -> (rare + " " + toks("y", 5))))
    assert(got.keySet == Set((100L, 101L)),
      s"boilerplate-only pairs must be dropped: ${got.keySet.size} pairs")
    assert(got((100L, 101L)) == (10L, 1L))
  }

  test("internal periodicity is deterministic: repeated token text") {
    // 16 identical tokens vs 12: every alignment matches, chains at
    // many deltas — the count is a fixed combinatorial function, and
    // two runs (engine vs engine) must agree exactly
    val a = runsOn(Seq(
      1L -> (1 to 16).map(_ => "p").mkString(" "),
      2L -> (1 to 12).map(_ => "p").mkString(" ")))
    val b = runsOn(Seq(
      1L -> (1 to 16).map(_ => "p").mkString(" "),
      2L -> (1 to 12).map(_ => "p").mkString(" ")))
    assert(a == b)
    // longest chain: d1 has 9 anchor positions, d2 has 5; at the best
    // alignment all 5 of d2's positions chain → run = 5 + 7 = 12 (the
    // full shorter doc)
    assert(a((1L, 2L))._1 == 12L, s"got ${a((1L, 2L))}")
  }

  test("the anchor expression matches its own contract") {
    import org.apache.spark.sql.graft.GramPositionHashes
    val df = Seq("one two three four five six seven eight nine").toDF("text")
      .select(GramPositionHashes.of($"text", 8).as("hs"))
    val hs = df.head().getSeq[Long](0)
    assert(hs.length == 2, "9 tokens, k=8 → anchors at positions 1 and 2")
    assert(hs.distinct.length == 2)
    // sub-k text → empty, no whole-doc fallback
    val empty = Seq("just seven tokens in this short doc").toDF("text")
      .select(GramPositionHashes.of($"text", 8).as("hs"))
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }
}
