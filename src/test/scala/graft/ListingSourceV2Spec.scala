package graft

import java.nio.file.{Files, Paths}

/** S1 DataSourceV2: partition-per-zip layout + F1 pushdown into the
  * scan, driven through the public spark.read.format() path. */
class ListingSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def block(mls: String, price: String, sqft: String): String =
    s"""<table class="public-detail-quickview">
       |<span class="mls">$mls</span><span class="price">$price</span>
       |<span class="sqft">$sqft</span></table>""".stripMargin

  private lazy val dir: String = {
    val d = Files.createTempDirectory("v2src").toString
    Files.writeString(Paths.get(d, "84601.html"),
      block("A1", "$100,000", "2000") + block("A2", "$20,000,000", "9000"))
    Files.writeString(Paths.get(d, "84058.html"),
      block("B1", "$250,000", "500"))
    d
  }

  private def read() = spark.read
    .format("graft.sources.v2.ListingSourceV2")
    .option("path", dir).option("zips", "84601,84058,99999")
    .load()

  test("V2 scan reads all zips, one partition per zip, missing zip = empty") {
    val df = read()
    assert(df.select("mls").as[String].collect().sorted.toSeq ==
      Seq("A1", "A2", "B1"))
    assert(df.rdd.getNumPartitions == 3) // incl. the empty 99999
  }

  test("V2 pushdown: price/sqft bounds reach the scan (F1)") {
    val df = read().filter($"price" <= 15000000L && $"sqft" >= 750L)
    assert(df.select("mls").as[String].collect().toSeq == Seq("A1"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("pushed=[LessThanOrEqual(price,15000000)"),
      s"price bound must be pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(sqft,750)"),
      s"sqft bound must be pushed:\n$plan")
  }
}
