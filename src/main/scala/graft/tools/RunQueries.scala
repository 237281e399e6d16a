package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev utility: run a SUBSET of registry queries into an out dir
  * (same layout as graft.Verify, so scripts/check.py can compare just
  * those names) — seconds of iteration instead of a full 70-query
  * sweep when touching one query family.
  *
  * Usage: scripts/run.sh graft.tools.RunQueries <sfDir> <outDir> name[,name...]
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // initialPartitionNum >> cores: shuffles START at fine granularity
      // and AQE coalesces DOWN to the advisory size at small scale — so
      // the same binary neither over-partitions sf0.1 nor starves sf10+
      // (measured: at sf10 the 32-partition graph iterations spilled
      // 10-89 GB per query; the cluster-shaped setting is thousands)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val t0 = System.nanoTime()
      val q = Registry.byName(name)
      try q.withConfs(spark) {
        q.run(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } finally Checkpoints.drainDeferred(spark)
      println(f"[run] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // refresh the FULL oracle map too, so check.py sees current SQL
    // for the rerun names (same escaping as graft.Verify)
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // learned-artifact-dependent oracle (see graft.Verify) — only when
    // its query was part of this subset (training is cached, but an
    // unrelated iteration shouldn't pay for it)
    val dynamic =
      if (names.split(",").contains("t_bpe_encode"))
        graft.queries.TextAnalysis.dynamicOracles(spark, sfDir)
      else Map.empty[String, String]
    val json = (graft.SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
