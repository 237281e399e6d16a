package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArgMax2

/** Dev probe (round 16, VERDICT r15 #2): the LPA per-round gather
  * aggregates an E-scale (node, lab, w) vote stream into a per-node
  * argmax. The round-15 form moves RAW vote rows through ONE
  * node-keyed exchange — a power-law hot node concentrates its entire
  * vote stream on a single reduce partition, and AQE skew handling
  * does not split repartition+aggregate stages. This probe A/Bs the
  * candidate gather shapes on a uniform and a hot-node-skewed
  * synthetic vote stream, timed via the noop sink:
  *
  *  A (round-15 current): repartition(n, node) → sum → argmax
  *    — 1 exchange, raw rows, hot node = single-partition straggler.
  *  B (skew-proof):       repartition(n, node, lab) → sum →
  *    argmax (own AQE exchange, map-side partial argmax ≤ 1 row per
  *    node per partition) → repartition(n, node) for the loop layout
  *    — 3 exchanges, no partition ever holds more than its hash share.
  *
  * Usage: scripts/run.sh graft.tools.LpaGatherProbe [nodes] [edges]
  */
object LpaGatherProbe {
  def main(args: Array[String]): Unit = {
    val nNodes = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nEdges = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = cpus.toInt

    // vote streams as the gather's join output would deliver them:
    // arbitrary input partitioning, (node, lab, w) rows. Labels are
    // mostly-distinct per node (the honest round-1 regime, where
    // partial aggregation on (node, lab) compresses nothing).
    def uniform: DataFrame = spark.range(nEdges).select(
      pmod(xxhash64($"id"), lit(nNodes)).as("node"),
      pmod(xxhash64($"id" + 7), lit(nNodes)).as("lab"),
      (pmod(xxhash64($"id" + 13), lit(50)) + 1).as("w"))
    // 30% of all votes land on node 0 (each with a distinct label —
    // the worst case for any compression story)
    def skewed: DataFrame = spark.range(nEdges).select(
      when(pmod($"id", lit(10)) < 3, lit(0L))
        .otherwise(pmod(xxhash64($"id"), lit(nNodes))).as("node"),
      pmod(xxhash64($"id" + 7), lit(nNodes)).as("lab"),
      (pmod(xxhash64($"id" + 13), lit(50)) + 1).as("w"))

    def gatherA(v: DataFrame): DataFrame = v
      .repartition(n, $"node")
      .groupBy($"node", $"lab").agg(sum($"w").as("wt"))
      .groupBy($"node").agg(ArgMax2.of($"wt", -$"lab").as("m"))
      .select($"node", (-$"m.tie").as("lab"))

    def gatherB(v: DataFrame): DataFrame = v
      .repartition(n, $"node", $"lab")
      .groupBy($"node", $"lab").agg(sum($"w").as("wt"))
      .groupBy($"node").agg(ArgMax2.of($"wt", -$"lab").as("m"))
      .select($"node", (-$"m.tie").as("lab"))
      .repartition(n, $"node")

    def time(tag: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[lpa-gather] $tag%-18s $s%8.2fs")
      s
    }
    // warm both shapes once, then 3 samples each, interleaved
    time("warm A uniform", gatherA(uniform))
    time("warm B uniform", gatherB(uniform))
    for (p <- 1 to 3) {
      time(s"A uniform p$p", gatherA(uniform))
      time(s"B uniform p$p", gatherB(uniform))
      time(s"A skewed  p$p", gatherA(skewed))
      time(s"B skewed  p$p", gatherB(skewed))
    }
    // result parity: identical argmax labels either way
    val ha = gatherA(skewed).select(sum(xxhash64($"node", $"lab"))).first.getLong(0)
    val hb = gatherB(skewed).select(sum(xxhash64($"node", $"lab"))).first.getLong(0)
    println(s"[lpa-gather] parity: ${ha == hb} ($ha vs $hb)")
    require(ha == hb, "gather variants disagree")
    spark.stop()
  }
}
