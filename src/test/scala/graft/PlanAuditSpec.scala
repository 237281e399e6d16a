package graft

import graft.tools.PlanAudit

/** Registry-wide physical-plan invariants, enforced over EVERY query
  * in one sweep (at planning cost only — nothing executes):
  *  - zero CartesianProduct nodes anywhere: every cross-shaped join
  *    in the repo carries a bounded broadcast side (centroids,
  *    codebooks, 1-row scalars), which plans as
  *    BroadcastNestedLoopJoin, never an unpartitioned cartesian;
  *  - every query plans (audit returns Right) — a regression that
  *    breaks planning surfaces here before the driver's sweep.
  */
class PlanAuditSpec extends SparkSpec {

  test("no registry query plans a CartesianProduct; all queries plan") {
    val results = Registry.all.map(q =>
      q.name -> PlanAudit.audit(spark, sf("sf0.001"), q.name))
    val failures = results.collect { case (n, Left(e)) => s"$n: $e" }
    assert(failures.isEmpty, s"queries failed to plan:\n${failures.mkString("\n")}")
    val cartesians = results.collect {
      case (n, Right(a)) if a.cartesian > 0 => n
    }
    assert(cartesians.isEmpty,
      s"CartesianProduct found in: ${cartesians.mkString(", ")}")
    assert(results.size >= 119, s"registry shrank? ${results.size}")
  }
}
