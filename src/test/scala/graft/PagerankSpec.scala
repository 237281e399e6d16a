package graft

import org.apache.spark.sql.functions._

/** q_graph_pagerank: the distributed 3-round fixed-point iteration
  * must equal an in-memory replay of the same integer arithmetic on
  * the same edge list — same floor divisions, same damping, same
  * round count — and respect the PR bounds. */
class PagerankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed fixed-point pagerank == driver replay at sf0.001") {
    val d = sf("sf0.001")
    val e0 = Tables.orders(spark, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("a"),
        concat(lit("s"), $"l_suppkey").as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = e0 ++ e0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var pr = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 3) {
      val inbox = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = inbox.map { case (v, in) =>
        v -> (150000L + (850000L * in) / 1000000L)
      }
    }
    val got = queries.Cdc.qGraphPagerank.run(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == pr.keySet, "one PR row per graph node")
    val diff = got.collect { case (n, v) if pr(n) != v => (n, v, pr(n)) }
    assert(diff.isEmpty, s"fixed-point mismatch on ${diff.take(5)}")
    // bounds: damping floor, and mass can only leak downward (floors)
    assert(got.values.forall(_ >= 150000L))
    assert(got.values.sum <= got.size * 1000000L)
    assert(got.nonEmpty)
  }

  test("incremental pagerank: slice invariance — any split date, identical ranks") {
    // the IncrementalAggSpec contract transplanted to the graph: where
    // history ends and the delta begins must be invisible in the
    // result, and the merged artifact must reproduce the batch answer
    val d = sf("sf0.001")
    val batch = queries.Cdc.qGraphPagerank.run(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (split <- Seq("1992-06-01", "1995-01-01", "1997-06-01", "1999-01-01")) {
      val base = queries.Cdc.cachedBaseEdges(spark, d, split)
      val delta = queries.Cdc.tradeEdges(spark, d,
        $"o_orderdate" >= lit(split).cast("date"))
      val inc = queries.Cdc.pagerankOver(spark,
          base.unionByName(delta).distinct())
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(inc == batch, s"split $split drifted from the batch ranks")
    }
  }

  test("incremental pagerank: base artifact derived once, delta scan is filtered") {
    val d = sf("sf0.001")
    queries.Cdc.clearBaseEdgeCache()
    val before = queries.Cdc.baseEdgeDerivations.get()
    queries.Cdc.qGraphPagerankInc.run(spark, d).collect()
    val afterFirst = queries.Cdc.baseEdgeDerivations.get()
    assert(afterFirst == before + 1, "first refresh derives the base artifact")
    queries.Cdc.qGraphPagerankInc.run(spark, d).collect()
    assert(queries.Cdc.baseEdgeDerivations.get() == afterFirst,
      "second refresh must probe the cached artifact, not re-walk history")

    // the delta derivation reads delta-sized order data: the split
    // predicate must reach the orders parquet scan
    val deltaPlan = queries.Cdc.tradeEdges(spark, d,
        $"o_orderdate" >= lit("1996-01-01").cast("date"))
      .queryExecution.executedPlan.toString
    assert(deltaPlan.contains("PushedFilters") &&
      deltaPlan.contains("o_orderdate"),
      s"split filter must push into the orders scan:\n$deltaPlan")

    // and the registry query hash-equals the batch one (the oracle
    // re-proves this cross-engine at every SF; here, cross-query)
    val inc = queries.Cdc.qGraphPagerankInc.run(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = queries.Cdc.qGraphPagerank.run(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc == batch)
  }

  test("label-propagation communities == driver replay at sf0.001") {
    val d = sf("sf0.001")
    val e0 = Tables.orders(spark, d).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, d).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
      .toSeq
    val edges = e0 ++ e0.map { case (a, b, w) => (b, a, w) }
    val selfW = edges.groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._3).max }
    var lab: Map[Long, Long] = selfW.map { case (n, _) => n -> n }.toMap
    for (_ <- 1 to 3) {
      val votes = scala.collection.mutable.Map[(Long, Long), Long]()
      edges.foreach { case (a, b, w) =>
        val k = (a, lab(b)); votes(k) = votes.getOrElse(k, 0L) + w }
      selfW.foreach { case (n, sw) =>
        val k = (n, lab(n)); votes(k) = votes.getOrElse(k, 0L) + sw }
      lab = votes.toSeq.groupBy(_._1._1).map { case (n, vs) =>
        n -> vs.map { case ((_, l), wt) => (wt, -l) }.max._2 * -1
      }
    }
    val sizes = lab.values.groupBy(identity).map { case (l, v) => l -> v.size.toLong }
    val expected = lab.map { case (n, l) =>
      val name = if (n % 2 == 0) s"c${n / 2}" else s"s${(n - 1) / 2}"
      name -> (l, sizes(l))
    }
    val got = queries.Cdc.qGraphCommunities.run(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected, "engine must equal the in-memory LPA replay")
    // communities must be non-trivial: more than one, fewer than nodes
    val k = sizes.size
    assert(k > 1 && k < lab.size,
      s"expected a real partition, got $k communities over ${lab.size} nodes")
  }

  test("incremental communities: slice invariance and derive-once artifact") {
    val d = sf("sf0.001")
    val batch = queries.Cdc.qGraphCommunities.run(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // weight merge = summation: any split must reproduce the batch
    // communities exactly (decomposable-count identity)
    for (split <- Seq("1992-06-01", "1995-01-01", "1997-06-01")) {
      val base = queries.Cdc.cachedWeightedBaseEdges(spark, d, split)
      val delta = queries.Cdc.weightedTradeEdges(spark, d,
        $"o_orderdate" >= lit(split).cast("date"))
      val merged = base.unionByName(delta)
        .groupBy($"a", $"b").agg(sum($"w").as("w"))
      val inc = queries.Cdc.lpaOver(spark, merged)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(inc == batch, s"split $split drifted from the batch communities")
    }
    // the registry query: artifact derived once, then served cached
    queries.Cdc.clearWeightedBaseEdgeCache()
    val before = queries.Cdc.baseWeightedDerivations.get()
    queries.Cdc.qGraphCommunitiesInc.run(spark, d).collect()
    assert(queries.Cdc.baseWeightedDerivations.get() == before + 1)
    val got = queries.Cdc.qGraphCommunitiesInc.run(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(queries.Cdc.baseWeightedDerivations.get() == before + 1,
      "second refresh must probe the cached artifact")
    assert(got == batch)
  }

  test("LPA degree-cap gate: hot-star graph == uniform-path labels == replay") {
    // A star whose center owns most of the vote volume flips the
    // skew-proof gather (maxDeg > 4·E/n at parts=64); the same graph
    // at parts=2 keeps the single raw node-keyed gather. Both physical
    // forms are exact aggregations, so the labels must be identical —
    // and equal to the in-memory replay of the same LPA arithmetic.
    val hub = 1L // odd = 's0'
    val hotEdges = (0 until 3000).map(i => (2L * i, hub, 1L)) // 3000 customers
    val sideEdges = (0 until 30).map(i =>
      (2L * (4000 + i), 2L * i + 3, 5L)) // a few strong off-star ties
    val e0seq = hotEdges ++ sideEdges
    val e0 = e0seq.toDF("a", "b", "w")
    val hot = queries.Cdc.lpaOver(spark, e0, parts = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val uni = queries.Cdc.lpaOver(spark, e0, parts = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(hot == uni, "gate branches must be result-identical")
    // driver replay (the batch-test arithmetic on the synthetic list)
    val edges = e0seq ++ e0seq.map { case (a, b, w) => (b, a, w) }
    val selfW = edges.groupBy(_._1)
      .map { case (nd, es) => nd -> es.map(_._3).max }
    var lab: Map[Long, Long] = selfW.map { case (nd, _) => nd -> nd }.toMap
    for (_ <- 1 to 3) {
      val votes = scala.collection.mutable.Map[(Long, Long), Long]()
      edges.foreach { case (a, b, w) =>
        val k = (a, lab(b)); votes(k) = votes.getOrElse(k, 0L) + w }
      selfW.foreach { case (nd, sw) =>
        val k = (nd, lab(nd)); votes(k) = votes.getOrElse(k, 0L) + sw }
      lab = votes.toSeq.groupBy(_._1._1).map { case (nd, vs) =>
        nd -> vs.map { case ((_, l), wt) => (wt, -l) }.max._2 * -1
      }
    }
    val sizes = lab.values.groupBy(identity).map { case (l, v) => l -> v.size.toLong }
    val expected = lab.map { case (nd, l) =>
      val name = if (nd % 2 == 0) s"c${nd / 2}" else s"s${(nd - 1) / 2}"
      (name, l, sizes(l))
    }.toSet
    assert(hot == expected, "hot-gather labels must equal the replay")
  }
}
