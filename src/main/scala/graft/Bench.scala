package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark (driver contract): run the bench-flagged
  * registry queries against SPARK_GRAFT_SF_DIR and print ONE JSON
  * line. Each query is fully materialized through the noop sink (a
  * bare count() would let Catalyst prune the project away), and the
  * whole set runs once unmeasured first — JIT, codegen cache, parquet
  * footer cache — then once measured, so numbers reflect the plan,
  * not JVM warmup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = Registry.all.filter(_.bench)

    def exec(q: GraftQuery): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    qs.foreach(q =>
      try exec(q)
      catch { case e: Throwable =>
        System.err.println(s"[bench-warm] ${q.name}: ${e.getMessage}") })
    val results = qs.map { q =>
      q.name -> (try exec(q) catch { case _: Throwable => -1.0 })
    }

    val fields = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$fields,"sf":"$sfDir"}""")
    spark.stop()
  }
}
