package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of named registry
  * queries against a dataset dir — the `.explain("formatted")`
  * feedback loop for the plan-audit habit, without editing code.
  *
  * Usage: scripts/run.sh graft.tools.PlanCheck <sfDir> name[,name...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { name =>
      println(s"==== $name @ $sfDir ====")
      Registry.byName(name).run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
