package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: execute EVERY registered query (not just the bench set)
  * against a given SF dir and report wall time + row count, to catch
  * queries whose plans degenerate at larger scale before the driver
  * does. Usage: scripts/run.sh graft.SweepCheck [sfDir]
  */
object SweepCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = Registry.all.map { q =>
      val t0 = System.nanoTime()
      val n = try q.run(spark, sfDir).count()
        catch { case e: Throwable =>
          println(f"${q.name}%-28s FAILED ${e.getMessage.take(100)}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"${q.name}%-28s ${sec}%8.2fs ${n}%10d rows")
      (q.name, sec)
    }
    println(f"TOTAL ${results.map(_._2).sum}%.1fs")
    spark.stop()
  }
}
