package graft

import org.apache.spark.sql.functions._

/** Format breadth beyond parquet/CSV/JSON: the engine's tables
  * round-trip through ORC (the other columnar format Spark ships
  * in-box) with full fidelity, and ORC scans take predicate pushdown
  * just like parquet — so a deployment whose lake standardized on ORC
  * loses nothing. */
class OrcFormatSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip is row-identical and pushes predicates to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sf("sf0.001"))
    li.write.mode("overwrite").orc(s"$dir/lineitem")
    val back = spark.read.orc(s"$dir/lineitem")

    assert(back.schema == li.schema, "ORC must preserve the schema")
    val a = li.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, "ORC round-trip must be row-identical")

    val filtered = back.filter($"l_quantity" > 40.0 &&
      $"l_returnflag" === "R")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,40.0)"),
      s"ORC scan must carry the pushed predicate:\n$plan")

    // and a registry-shaped aggregate over the ORC copy matches the
    // parquet original bit-for-bit (dsum routes both identically)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag")
        .agg(Tables.dsum($"l_extendedprice").as("s"),
          count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
    assert(agg(back) == agg(li))
  }
}
