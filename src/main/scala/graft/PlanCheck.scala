package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for every registered query
  * so scan pruning (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen spans
  * can be audited. Usage: scripts/run.sh graft.PlanCheck [sfDir] [name...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n======== ${q.name} ========")
        try q.run(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
        // localCheckpoint is EAGER — building the plan materialized any
        // loop scratch even though nothing was saved; free it per query
        finally tools.Checkpoints.drainDeferred(spark)
      }
    spark.stop()
  }
}
