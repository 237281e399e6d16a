package graft

import graft.functions.CountMinSketch
import org.apache.spark.sql.functions._

/** Scale-layout proofs: bucketed co-located joins eliminate the
  * shuffle, and the CMS Aggregator gives bounded-error frequencies
  * with a mergeable fixed-size buffer. */
class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange (co-located SMJ)") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sf("sf0.001"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf("sf0.001"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      assert(joined.collect().map(_.getLong(1)).sum == 6000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join inputs are bucket-aligned: no shuffle before the join
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"join must not reshuffle bucketed input:\n$plan")

      // contrast: the same join over raw parquet DOES shuffle both sides
      val unbucketed = Tables.lineitem(spark, sf("sf0.001"))
        .join(Tables.orders(spark, sf("sf0.001")), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      unbucketed.collect()
      val rawPlan = unbucketed.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning"),
        s"raw join should shuffle:\n$rawPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("CMS sketch: one-pass approximate frequencies with upper-bound guarantee") {
    val cms = new CountMinSketch(depth = 4, width = 256)
    val docs = Tables.documents(spark, sf("sf0.001"))
    val truth = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum

    val sketch = docs.select($"source").as[String]
      .select(cms.toColumn).head()

    truth.foreach { case (k, exact) =>
      val est = cms.estimate(sketch, k)
      assert(est >= exact, s"CMS must never undercount: $k $est < $exact")
      assert(est <= exact + (0.05 * n).toLong,
        s"CMS overcount beyond bound: $k est=$est exact=$exact n=$n")
    }
    // unseen key stays near zero
    assert(cms.estimate(sketch, "no_such_source") <= (0.05 * n).toLong)
  }
}
