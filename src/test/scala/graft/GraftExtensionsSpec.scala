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

  test("optimizer rule rewrites sum(CAST(x AS DECIMAL(28,6))) to i128") {
    val rnd = new scala.util.Random(23)
    Seq.fill(3000)((rnd.nextInt(5), (rnd.nextDouble() - 0.5) * 1e9))
      .toDF("g", "v").createOrReplaceTempView("rw_vals")
    val sql = """SELECT g, sum(CAST(v AS DECIMAL(28,6))) AS s
                 FROM rw_vals GROUP BY g ORDER BY g"""
    // the shared session may carry a pinned conf from another suite —
    // force both states explicitly and restore afterwards
    val prior = spark.conf.getOption(graft.plans.I128SumRewrite.ConfKey)
    try {
      spark.conf.set(graft.plans.I128SumRewrite.ConfKey, "true")
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("i128_decimal_sum"), plan)
      // schema preserved: Sum's decimal widening (38, 6)
      assert(rewritten.schema("s").dataType ==
        org.apache.spark.sql.types.DecimalType(38, 6))
      val got = rewritten.collect()
      // same query with the rule disabled = the stock decimal aggregate
      spark.conf.set(graft.plans.I128SumRewrite.ConfKey, "false")
      val df = spark.sql(sql)
      assert(!df.queryExecution.executedPlan.toString
        .contains("i128_decimal_sum"))
      val want = df.collect()
      assert(got.toSeq == want.toSeq)
    } finally prior match {
      case Some(v) => spark.conf.set(graft.plans.I128SumRewrite.ConfKey, v)
      case None => spark.conf.unset(graft.plans.I128SumRewrite.ConfKey)
    }
  }

  test("optimizer rule leaves non-matching aggregates alone") {
    Seq((1, 2.5), (1, 3.5)).toDF("g", "v").createOrReplaceTempView("rw_nm")
    // wrong scale, non-double child, DISTINCT, try_cast: all untouched
    val untouched = Seq(
      "SELECT sum(CAST(v AS DECIMAL(28,2))) AS s FROM rw_nm",
      "SELECT sum(CAST(g AS DECIMAL(28,6))) AS s FROM rw_nm",
      "SELECT sum(DISTINCT CAST(v AS DECIMAL(28,6))) AS s FROM rw_nm",
      "SELECT sum(TRY_CAST(v AS DECIMAL(28,6))) AS s FROM rw_nm")
    val prior = spark.conf.getOption(graft.plans.I128SumRewrite.ConfKey)
    try {
      spark.conf.set(graft.plans.I128SumRewrite.ConfKey, "true")
      // the positive control: the rule IS active for the matching shape
      assert(spark.sql("SELECT sum(CAST(v AS DECIMAL(28,6))) AS s FROM rw_nm")
        .queryExecution.executedPlan.toString.contains("i128_decimal_sum"))
      untouched.foreach { q =>
        val plan = spark.sql(q).queryExecution.executedPlan.toString
        assert(!plan.contains("i128_decimal_sum"), s"$q rewrote:\n$plan")
      }
    } finally prior match {
      case Some(v) => spark.conf.set(graft.plans.I128SumRewrite.ConfKey, v)
      case None => spark.conf.unset(graft.plans.I128SumRewrite.ConfKey)
    }
  }

  test("repetition_stats is callable from SQL and matches the Column API") {
    val row = spark.sql(
      "SELECT s.* FROM (SELECT repetition_stats('x y x y x y') AS s)")
      .collect().head
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3)) ==
      ((6, 3, 5, 2)))
    val viaCol = Seq("x y x y x y").toDF("text")
      .select(org.apache.spark.sql.graft.RepetitionStats.of($"text").as("st"))
      .select($"st.*").collect().head
    assert(row == viaCol)
  }

  test("extensions class injects the same functions at session build") {
    // the injection list is shared — the class is just the conf-driven
    // wrapper around it
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("gram_position_hashes", "i128_sum", "quantized_dot",
        "repetition_stats", "shingle_hashes", "shingle_minhash",
        "simhash60"))
    val ext = new GraftExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw; builder wiring exercised via register()
  }
}
