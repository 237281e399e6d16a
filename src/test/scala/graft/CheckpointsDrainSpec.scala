package graft

import org.apache.spark.sql.functions._

/** The deferred-release contract (tools.Checkpoints.defer/drainDeferred):
  * iterative queries register their per-run scratch checkpoints — loop
  * edge lists, multi-consumer intermediates the OUTPUT still reads —
  * and the runner frees them after materialization. Round 12 measured
  * why this must hold: in the shared sf10 bench session each pass
  * stacked a fresh generation of retained graph scratch, and the
  * accumulated dead blocks inflated unrelated downstream queries up to
  * 2× (q_graph_triangles +107%, kcore 190s in-bench vs 77s solo).
  *
  * The contract has three legs: (1) scratch IS registered and drain
  * actually unpersists it; (2) drain never touches the session
  * ARTIFACT caches (their reuse across queries is the point); (3) a
  * re-run after drain reproduces identical rows (nothing the query
  * needs was freed). */
class CheckpointsDrainSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("graph scratch registers, survives materialization, drains clean") {
    val d = sf("sf0.001")
    tools.Checkpoints.drainDeferred(spark) // isolate from prior suites
    val before = persistedIds
    val q = Registry.byName("q_graph_pagerank")
    val rows = q.run(spark, d).collect()
    assert(rows.nonEmpty)
    val during = persistedIds -- before
    assert(during.nonEmpty,
      "pagerank's edge/degree checkpoints should be persisted pre-drain")
    val drained = tools.Checkpoints.drainDeferred(spark)
    assert(drained >= 2, s"expected >=2 deferred scratch frames, got $drained")
    val leftover = persistedIds.intersect(during)
    assert(leftover.isEmpty,
      s"scratch RDDs still persisted after drain: $leftover")
  }

  test("drain after one query leaves another query's artifact cache intact") {
    val d = sf("sf0.001")
    // prime the incremental base-edge ARTIFACT (session-cached, not
    // deferred), then run+drain an unrelated scratch-heavy query
    val split = "1995-01-01"
    val base = queries.Cdc.cachedBaseEdges(spark, d, split)
    val baseCount = base.count()
    val k = Registry.byName("q_graph_kcore_full")
    k.run(spark, d).write.format("noop").mode("overwrite").save()
    assert(tools.Checkpoints.drainDeferred(spark) > 0)
    // the cached artifact must still be readable (its localCheckpoint
    // cannot recompute — a wrongly-deferred release would throw here)
    assert(queries.Cdc.cachedBaseEdges(spark, d, split).count() == baseCount)
    val derivs = queries.Cdc.baseEdgeDerivations.get()
    queries.Cdc.cachedBaseEdges(spark, d, split).count()
    assert(queries.Cdc.baseEdgeDerivations.get() == derivs,
      "cache re-derived after drain — the artifact was released")
  }

  test("re-run after drain reproduces identical rows") {
    val d = sf("sf0.001")
    def run(name: String): Seq[String] = {
      val q = Registry.byName(name)
      val out = q.run(spark, d).collect().map(_.toString).sorted.toSeq
      tools.Checkpoints.drainDeferred(spark)
      out
    }
    for (name <- Seq("q_graph_kcore", "q_graph_communities",
        "q_basket_pairs", "q_window_functions")) {
      val a = run(name)
      val b = run(name)
      assert(a == b, s"$name drifted across a drain")
      assert(a.nonEmpty)
    }
  }
}
