package graft

import org.apache.spark.sql.functions._

/** Gates for the bounded-round k-core peel. Value-level truth is
  * oracle-gated (the unrolled 3-round DuckDB formulation); these pin
  * the cascade semantics on a constructed graph where every peel
  * round is known by hand, plus partition invariants on the fixture
  * corpus. */
class KcoreSpec extends SparkSpec {
  import spark.implicits._

  /** Constructed edges enter in the loops' long encoding (custkey·2 /
    * suppkey·2+1 — the tradeEdgesRaw contract); the loops decode back
    * to 'c…'/'s…' on output, so the hand-written assertions below are
    * unchanged. */
  private def enc(n: String): Long =
    if (n.startsWith("c")) n.drop(1).toLong * 2 else n.drop(1).toLong * 2 + 1
  private def encEdges(pairs: Seq[(String, String)]) =
    pairs.map { case (a, b) => (enc(a), enc(b)) }.toDF("a", "b")

  test("constructed path + clique: cascade peels round by round") {
    // Path c1–s1–c2–s2–c3 (endpoints fall first, the middle last) and
    // a 2×2 complete bipartite core that must survive k=2 untouched.
    val edges = encEdges(Seq(
      ("c1", "s1"), ("c2", "s1"), ("c2", "s2"), ("c3", "s2"),
      ("c10", "s10"), ("c10", "s11"), ("c11", "s10"), ("c11", "s11")))
    val out = queries.Cdc.kcoreOver(spark, edges, k = 2, rounds = 3)
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    // Round 1: the path endpoints hold degree 1.
    assert(out("c1") == (1, 1L) && out("c3") == (1, 1L))
    // Round 2: their neighbors have fallen to degree 1.
    assert(out("s1") == (2, 1L) && out("s2") == (2, 1L))
    // Round 3: the middle node is now isolated — peeled at degree 0,
    // not silently dropped.
    assert(out("c2") == (3, 0L))
    // The K2,2 core survives with its full degree.
    for (n <- Seq("c10", "c11", "s10", "s11"))
      assert(out(n) == (0, 2L), s"$n must stay in the core")
    assert(out.size == 9)
  }

  test("fixpoint peel runs past the bounded horizon to convergence") {
    // A 9-node path pealed at k=2 cascades from both ends inward:
    // 4 full peel rounds before the middle node falls isolated —
    // deeper than the bounded query's 3-round horizon — while the
    // K2,2 clique must survive untouched at its full degree.
    val edges = encEdges(Seq(
      ("c1", "s1"), ("c2", "s1"), ("c2", "s2"), ("c3", "s2"),
      ("c3", "s3"), ("c4", "s3"), ("c4", "s4"), ("c5", "s4"),
      ("c10", "s10"), ("c10", "s11"), ("c11", "s10"), ("c11", "s11")))
    val out = queries.Cdc.kcoreFixpointOver(spark, edges, k = 2, maxRounds = 24)
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out("c1") == (1, 1L) && out("c5") == (1, 1L))
    assert(out("s1") == (2, 1L) && out("s4") == (2, 1L))
    assert(out("c2") == (3, 1L) && out("c4") == (3, 1L))
    assert(out("s2") == (4, 1L) && out("s3") == (4, 1L))
    // Middle of the path: both neighbors gone by round 4, isolated
    // at round 5 — the convergence report reads max(peel_round) = 5.
    assert(out("c3") == (5, 0L))
    for (n <- Seq("c10", "c11", "s10", "s11"))
      assert(out(n) == (0, 2L), s"$n must stay in the core")
    assert(out.size == 13)
  }

  test("fixpoint guard: maxRounds cap reproduces the bounded peel") {
    val edges = encEdges(Seq(
      ("c1", "s1"), ("c2", "s1"), ("c2", "s2"), ("c3", "s2"),
      ("c10", "s10"), ("c10", "s11"), ("c11", "s10"), ("c11", "s11")))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    val capped = asMap(
      queries.Cdc.kcoreFixpointOver(spark, edges, k = 2, maxRounds = 2))
    val bounded = asMap(
      queries.Cdc.kcoreOver(spark, edges, k = 2, rounds = 2))
    assert(capped == bounded,
      "a guard-hit fixpoint run must equal the bounded peel")
  }

  test("q_graph_kcore_full: fixpoint on the trade graph, no survivor below k") {
    val rows = queries.Cdc.qGraphKcoreFull.run(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "each node appears exactly once")
    val (peeled, core) = rows.partition(_.getInt(1) > 0)
    assert(peeled.forall(_.getLong(2) < 60),
      "a peeled node must have held degree < k when it fell")
    // Fixpoint contract: every survivor holds residual degree ≥ k —
    // exactly the property the bounded 3-round peel cannot promise.
    assert(core.forall(_.getLong(2) >= 60),
      "fixpoint must leave no survivor below k")
  }

  test("q_graph_kcore: rows partition the node set; peels are below k") {
    val rows = queries.Cdc.qGraphKcore.run(spark, sf("sf0.001")).collect()
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "each node appears exactly once")
    val (peeled, core) = rows.partition(_.getInt(1) > 0)
    assert(peeled.nonEmpty && core.nonEmpty,
      "k=10 must split the sf0.001 trade graph non-trivially")
    assert(peeled.forall(_.getLong(2) < 10),
      "a peeled node must have held degree < k when it fell")
  }
}
