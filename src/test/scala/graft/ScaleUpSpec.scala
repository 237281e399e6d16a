package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.functions._

/** The synthetic scale-point generator behind BASELINE.md's sf1
  * section: replication must preserve the properties the benchmark
  * claims rest on — exact cardinality scaling, fixed bounded dims,
  * intact join fan-out under shifted foreign keys, an unchanged event
  * time range (users scale, duration doesn't), and near-duplicate
  * (not byte-identical) document replicas. */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  private val factor = 3
  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("scaleup-spec").toString
    ScaleUp.run(spark, sf("sf0.001"), dir, factor)
    dir
  }

  test("cardinalities scale exactly; bounded dims stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val src = spark.read.parquet(s"${sf("sf0.001")}/$t.parquet").count()
      val dst = spark.read.parquet(s"$out/$t.parquet").count()
      assert(dst == factor * src, s"$t: $src -> $dst")
    }
    for (t <- Seq("region", "nation")) {
      val src = spark.read.parquet(s"${sf("sf0.001")}/$t.parquet").count()
      val dst = spark.read.parquet(s"$out/$t.parquet").count()
      assert(dst == src, s"bounded dim $t must not scale")
    }
  }

  test("keys stay unique and join fan-out survives the shift") {
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(o.select($"o_orderkey").distinct().count() == o.count())
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    // every lineitem still resolves its order (FK shift matched)
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() == 0)
    // per-order line counts are the source distribution, replicated
    val srcDist = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
      .groupBy($"l_orderkey").count()
      .groupBy($"count").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dstDist = li.groupBy($"l_orderkey").count()
      .groupBy($"count").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dstDist == srcDist.map { case (k, v) => k -> v * factor })
  }

  test("events keep their time range; documents replicate as near-dups") {
    def range(dir: String) = Tables.events(spark, dir)
      .agg(min($"ts"), max($"ts")).head()
    assert(range(out) == range(sf("sf0.001")),
      "scale-up must add users, not duration")
    val srcDocs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // each replica adds a distinct suffix, so distinct texts multiply
    // even though the fixture itself plants exact duplicates
    val srcDistinct = srcDocs.select($"text").distinct().count()
    assert(docs.select($"text").distinct().count() == factor * srcDistinct)
    // every replica-1 row carries the suffix; replica 0 is byte-identical
    assert(docs.filter($"text".endsWith(" replica1")).count() == srcDocs.count())
  }
}
