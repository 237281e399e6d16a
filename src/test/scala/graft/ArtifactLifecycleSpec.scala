package graft

/** Session artifacts (signature/cluster/shingle caches + per-query
  * localCheckpoints) must be droppable between sweep queries: storage
  * goes to zero, and the next consumer recomputes cleanly instead of
  * reading a dangling checkpoint. */
class ArtifactLifecycleSpec extends SparkSpec {

  test("clearSessionArtifacts empties executor storage and recovery recomputes") {
    // artifact-heavy queries: signature + shingle caches, IVF checkpoint
    val before = Registry.byName("dd_verified_pairs")
      .run(spark, sf("sf0.001")).count()
    Registry.byName("sim_ivf_topk").run(spark, sf("sf0.001")).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected localCheckpoint artifacts in storage after dedup/ivf runs")

    SweepCheck.clearSessionArtifacts(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clearSessionArtifacts must leave zero persisted RDDs")

    // caches were dropped, not broken: a fresh consumer rebuilds the
    // signature artifact and reproduces the same result
    val after = Registry.byName("dd_verified_pairs")
      .run(spark, sf("sf0.001")).count()
    assert(after == before, s"recomputed run must match: $before vs $after")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the rebuild should have re-materialized the artifact")
    SweepCheck.clearSessionArtifacts(spark)
  }
}
