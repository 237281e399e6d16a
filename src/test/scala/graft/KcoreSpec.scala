package graft

import org.apache.spark.sql.functions._

/** Gates for the bounded-round k-core peel. Value-level truth is
  * oracle-gated (the unrolled 3-round DuckDB formulation); these pin
  * the cascade semantics on a constructed graph where every peel
  * round is known by hand, plus partition invariants on the fixture
  * corpus. */
class KcoreSpec extends SparkSpec {
  import spark.implicits._

  test("constructed path + clique: cascade peels round by round") {
    // Path c1–s1–c2–s2–c3 (endpoints fall first, the middle last) and
    // a 2×2 complete bipartite core that must survive k=2 untouched.
    val edges = Seq(
      ("c1", "s1"), ("c2", "s1"), ("c2", "s2"), ("c3", "s2"),
      ("c10", "s10"), ("c10", "s11"), ("c11", "s10"), ("c11", "s11"))
      .toDF("a", "b")
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
