package graft

import graft.tools.{Artifacts, ShuffleAudit}

/** Registry-wide spill gate (VERDICT r9 #3): every one of the 150
  * registered queries runs end-to-end at sf0.1 with task metrics
  * collected, and ZERO shuffle spill (disk or memory) is asserted.
  * The bench set always had measured shuffle evidence; this closes
  * the gap for exchange-heavy unbenched queries (dd_source_overlap:
  * 8 exchanges; sim_pq_fit: 12 sorts) where a spill regression was
  * previously invisible until a bench flag happened to catch it.
  *
  * Protocol: persisted artifacts attached (production read path —
  * the consumers probe bucketed tables; derive-path artifact builds
  * are audited by the offline `ShuffleAudit --all` run that writes
  * SHUFFLE_AUDIT.md), session caches cleared between queries so
  * storage pressure never accumulates, single measured pass (spill
  * is a memory-pressure property, not a timing one — warmth doesn't
  * change it). The test session runs local[4] with 4 shuffle
  * partitions — per-partition memory pressure HARSHER than the
  * local[32] bench shape, so passing here is the stronger claim. */
class ShuffleGateSpec extends SparkSpec {

  test("zero shuffle spill across the full registry at sf0.1") {
    val d = sf("sf0.1")
    val artDir = s"/tmp/graft_gate_artifacts_${new java.io.File(d).getName}"
    SweepCheck.clearSessionArtifacts(spark)
    Artifacts.ensureFor(spark, d, artDir)
    SweepCheck.clearSessionArtifacts(spark)
    try {
      val rows = ShuffleAudit.measure(spark, d, Registry.all,
        warm = false, teardown = true)
      assert(rows.size == Registry.all.size)
      val failed = rows.filter(_._2.input < 0).map(_._1)
      assert(failed.isEmpty, s"queries failed at sf0.1: $failed")
      val spilled = rows.filter(r =>
        r._2.diskSpill > 0 || r._2.memSpill > 0)
      assert(spilled.isEmpty,
        "shuffle spill at sf0.1 — partitions outgrew executor memory " +
          "two decades below the design scale:\n" +
          spilled.map { case (n, m) =>
            f"  $n disk=${m.diskSpill / 1048576.0}%.1fMB " +
              f"mem=${m.memSpill / 1048576.0}%.1fMB"
          }.mkString("\n"))
    } finally {
      Artifacts.detach(spark)
      SweepCheck.clearSessionArtifacts(spark)
    }
  }
}
