package graft

import graft.tools.{ScaleUp, ShuffleAudit}

/** Spill gate one decade ABOVE the registry-wide sf0.1 gate, for the
  * family the advisories protect (VERDICT r13 #3).
  *
  * Why this exists: the per-query AQE advisory sizes (16 MB pagerank/
  * triangles, 8 MB LPA — queries/Cdc.scala) were tuned against the
  * sf10 corpus's compressed shuffle sizes, and [[ShuffleGateSpec]]
  * gates sf0.1 where nothing ever spilled under ANY advisory — so a
  * corpus or query change could silently re-cross the spill cliff
  * round 13 mapped, and only the per-round sf10 ShuffleAudit protocol
  * run (a note, not a gate) would notice. sf1 is the smallest scale
  * where the graph family's shuffles are big enough that mis-sized
  * coalescing can actually spill on the harsh test shape (local[4],
  * 8 GB heap — per-partition pressure well above the local[32]
  * bench), so gating zero spill HERE makes advisory rot a failing
  * test instead of a protocol diff.
  *
  * The sf1 corpus is synthesized on first use from the driver's sf0.1
  * via [[ScaleUp]] (the BASELINE.md empirical-scale-point tool) into
  * /tmp — ~one minute, once per box — so the gate can never silently
  * skip on a fresh machine. The shuffles start at the audited
  * fine-granularity shape (initialPartitionNum 512, the Bench/
  * ShuffleAudit setting) and AQE coalesces down to each query's
  * advisory; that is exactly the mechanism under test.
  */
class ShuffleGateSf1Spec extends SparkSpec {

  test("zero shuffle spill for the graph family at sf1") {
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    // every SF-scaled table must be present AND committed (_SUCCESS),
    // not just any marker — a ScaleUp killed mid-write leaves the last
    // table's directory present but partial, which would otherwise
    // never regenerate and degrade this gate on every later run
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val complete = tables.forall(t =>
      new java.io.File(s"$sf1/$t.parquet/_SUCCESS").exists())
    if (!complete) ScaleUp.run(spark, sf("sf0.1"), sf1, 10)

    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val prevInit = spark.conf.getOption(initKey)
    spark.conf.set(initKey, "512")
    try {
      val qs = Registry.all.filter(_.name.startsWith("q_graph_"))
      assert(qs.nonEmpty, "graph family missing from the registry")
      SweepCheck.clearSessionArtifacts(spark)
      val rows = ShuffleAudit.measure(spark, sf1, qs,
        warm = false, teardown = true)
      val failed = rows.filter(_._2.input < 0).map(_._1)
      assert(failed.isEmpty, s"graph queries failed at sf1: $failed")
      val spilled = rows.filter(r =>
        r._2.diskSpill > 0 || r._2.memSpill > 0)
      assert(spilled.isEmpty,
        "shuffle spill at sf1 — the per-query AQE advisories no longer " +
          "hold this corpus/query shape below the cliff:\n" +
          spilled.map { case (n, m) =>
            f"  $n disk=${m.diskSpill / 1048576.0}%.1fMB " +
              f"mem=${m.memSpill / 1048576.0}%.1fMB"
          }.mkString("\n"))
    } finally {
      prevInit match {
        case Some(v) => spark.conf.set(initKey, v)
        case None    => spark.conf.unset(initKey)
      }
      SweepCheck.clearSessionArtifacts(spark)
    }
  }
}
