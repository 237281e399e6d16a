package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev probe (round 15): run ONE registry query with the Checkpoints
  * plan tap on, printing per-checkpoint wall time and plan-shape
  * counters (exchanges / SMJ / BHJ / sorts) — the per-round visibility
  * the bench's single number hides.
  *
  * Usage: scripts/run.sh graft.tools.LoopProbe <sfDir> <name>
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var last = System.nanoTime()
    var i = 0
    Checkpoints.planTap = Some { plan =>
      val now = System.nanoTime()
      val ex = "Exchange".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val so = "Sort ".r.findAllIn(plan).length
      i += 1
      println(f"[ckpt $i%2d] +${(now - last) / 1e9}%6.2fs exch=$ex smj=$smj bhj=$bhj sort=$so")
      last = now
    }
    val q = Registry.byName(name)
    val t0 = System.nanoTime()
    try q.withConfs(spark) {
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    } finally Checkpoints.drainDeferred(spark)
    val now = System.nanoTime()
    println(f"[tail   ] +${(now - last) / 1e9}%6.2fs  TOTAL ${(now - t0) / 1e9}%6.2fs")
    Checkpoints.planTap = None
    spark.stop()
  }
}
