package graft

/** The SQL surface of the native expressions: registered functions
  * must behave identically to their Column-API twins. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("quantized_dot is callable from SQL") {
    val got = spark.sql(
      "SELECT quantized_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].head()
    assert(got == 4 + 10 + 18)
    // null element propagates like the zip_with twin
    assert(spark.sql(
      "SELECT quantized_dot(array(1L, NULL), array(4L, 5L)) AS d")
      .collect().head.isNullAt(0))
  }

  test("i128_sum is callable from SQL and matches the decimal route") {
    val rnd = new scala.util.Random(11)
    Seq.fill(2000)((rnd.nextInt(4), (rnd.nextDouble() - 0.5) * 1e8))
      .toDF("g", "v").createOrReplaceTempView("ext_vals")
    val got = spark.sql(
      "SELECT g, i128_sum(v) AS s FROM ext_vals GROUP BY g ORDER BY g")
      .select("s").as[Double].collect()
    val want = spark.table("ext_vals").groupBy($"g")
      .agg(Tables.dsumDecimal($"v").as("s"))
      .orderBy($"g").select("s").as[Double].collect()
    assert(got.length == 4 && got.zip(want).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    })
  }

  test("extensions class injects the same functions at session build") {
    // the injection list is shared — the class is just the conf-driven
    // wrapper around it
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("i128_sum", "quantized_dot", "shingle_minhash"))
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw; builder wiring exercised via register()
  }
}
