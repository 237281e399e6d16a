package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Checkpoints.SerCheckpoint

/** Dev probe (round 15): does a layout-preserving checkpoint actually
  * kill the downstream Exchange/Sort, and do the declared layouts
  * survive self-join attribute deduplication and yield IDENTICAL
  * results to the plain path? Exits non-zero on any mismatch.
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.range(200000)
      .select(($"id" % 997).as("a"), $"id".as("b"))
    val plain = base.repartition($"a").sortWithinPartitions($"a")
      .localCheckpoint(true)
    val kept = base.repartition($"a").sortWithinPartitions($"a")
      .serCheckpoint()

    def plan(df: org.apache.spark.sql.DataFrame): String = {
      val qe = df.queryExecution
      qe.executedPlan.toString
    }

    // 1. aggregate on the partition key: exchange-free when layout kept
    val aggPlain = plain.groupBy($"a").agg(count(lit(1)).as("n"))
    val aggKept = kept.groupBy($"a").agg(count(lit(1)).as("n"))
    println("=== agg plain ==="); aggPlain.explain()
    println("=== agg kept ==="); aggKept.explain()

    // 2. self-join on the key (attr dedup / newInstance path)
    val jPlain = plain.join(
      plain.select($"a".as("a2"), $"b".as("b2")), $"a" === $"a2")
    val jKept = kept.join(
      kept.select($"a".as("a2"), $"b".as("b2")), $"a" === $"a2")
    println("=== join kept ==="); jKept.explain()

    // 3. results identical
    def sig(df: org.apache.spark.sql.DataFrame): String =
      df.select(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)").as("h"))
        .agg(sum($"h").cast("string")).as[String].collect()(0)
    val okAgg = sig(aggPlain) == sig(aggKept)
    val okJoin = sig(jPlain) == sig(jKept)
    val cPlain = jPlain.count(); val cKept = jKept.count()
    println(s"agg match: $okAgg, join match: $okJoin " +
      s"(join rows plain=$cPlain kept=$cKept)")
    require(okAgg && okJoin && cPlain == cKept, "RESULT MISMATCH")

    // 4. exchange counts in executed plans
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      "Exchange".r.findAllIn(plan(df)).size
    }
    println(s"agg exchanges plain=${exchanges(aggPlain)} kept=${exchanges(aggKept)}")
    println(s"join exchanges plain=${exchanges(jPlain)} kept=${exchanges(jKept)}")
    spark.stop()
  }
}
