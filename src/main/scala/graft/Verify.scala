package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // The registry's only partition-less windows run over BOUNDED
    // tables (PlanAuditSpec gates the allowlist), so WindowExec's
    // single-partition caution is expected-by-design here — at sf10
    // it printed hundreds of times, burying real warnings in the
    // recorded tail.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // coalesce(1) keeps the driver's per-query dir a single file; at
    // synthetic large SFs (sf1/sf10 scale records) the single-threaded
    // write of multi-hundred-MB outputs dominates the whole dump —
    // SPARK_GRAFT_VERIFY_COALESCE=0 writes partitioned (check.py and
    // check_tiered.py read the dir either way)
    val coalesce1 =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_COALESCE", "1") != "0"
    // iterates the Registry (the table SparkEntry.queries is derived
    // from, same names and plans) so each query's conf advisories wrap
    // its materialization — withConfs must surround the WRITE, which
    // the bare (SparkSession, String) => DataFrame signature can't
    Registry.all.foreach { q =>
      try q.withConfs(spark) {
        val df = q.run(spark, sfDir)
        (if (coalesce1) df.coalesce(1) else df)
          .write.mode("overwrite").parquet(s"$outDir/${q.name}")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] ${q.name} failed: ${e.getMessage}")
      } finally
        // free this query's registered scratch checkpoints — 150
        // queries share one session here, and retained loop state
        // (E-scale graph edges, corpus-scale window cores) otherwise
        // accumulates for the whole dump (the r12 sf10 bench lesson)
        tools.Checkpoints.drainDeferred(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // learned-artifact-dependent oracles (t_bpe_encode): generated
    // from the SAME per-(session, dataset) cached merge table the
    // query run used, so the inlined literals cannot drift from the
    // output being checked; a failure here degrades that one query to
    // the old rows-only record instead of sinking the dump
    val dynamic =
      try queries.TextAnalysis.dynamicOracles(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
