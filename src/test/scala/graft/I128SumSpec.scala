package graft

import org.apache.spark.sql.functions._

/** The i128 exact-sum aggregate must be bit-identical to the
  * decimal-routed sum it replaced (Tables.dsumDecimal) — that path is
  * the one proven against the DuckDB oracle. */
class I128SumSpec extends SparkSpec {
  import spark.implicits._

  // The session is JVM-shared: if GraftExtensionsSpec registered the
  // i128 optimizer rule first, the decimal reference below would be
  // silently rewritten to the very aggregate under test. Pin the
  // rewrite off so dsumDecimal stays an independent oracle here.
  spark.conf.set(graft.plans.I128SumRewrite.ConfKey, "false")

  private def bitEqual(a: Seq[Double], b: Seq[Double]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    }

  test("i128 sum == decimal sum on random signed doubles with nulls") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)(
      (rnd.nextInt(8), if (rnd.nextInt(20) == 0) None
       else Some((rnd.nextDouble() - 0.5) * 2e9)))
    val df = rows.toDF("g", "v").cache()
    val got = df.groupBy($"g").agg(Tables.dsum($"v").as("s"))
      .orderBy($"g").select($"s").as[Double].collect().toSeq
    val want = df.groupBy($"g").agg(Tables.dsumDecimal($"v").as("s"))
      .orderBy($"g").select($"s").as[Double].collect().toSeq
    assert(bitEqual(got, want), s"$got != $want")
    df.unpersist()
  }

  test("i128 sum carries past Long.MaxValue (lo overflow into hi)") {
    // scaled contribution per row ≈ 9e17; 40 rows ≈ 3.6e19 > 2^63
    val df = Seq.fill(40)(9.0e11).toDF("v")
    val got = df.agg(Tables.dsum($"v")).as[Double].head()
    val want = df.agg(Tables.dsumDecimal($"v")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(want))
    assert(got == 3.6e13)
    // and back down through zero with negatives (borrow path)
    val mixed = (Seq.fill(40)(9.0e11) ++ Seq.fill(41)(-9.0e11)).toDF("v")
    val g2 = mixed.agg(Tables.dsum($"v")).as[Double].head()
    assert(g2 == -9.0e11)
  }

  test("empty and all-null groups yield null like sum()") {
    val df = Seq((1, Option.empty[Double]), (1, None)).toDF("g", "v")
    val r = df.groupBy($"g").agg(Tables.dsum($"v")).collect()
    assert(r.head.isNullAt(1))
    val empty = spark.emptyDataset[Double].toDF("v")
    assert(empty.agg(Tables.dsum($"v")).collect().head.isNullAt(0))
  }

  test("slow path: |x| >= 1e12 is summed exactly, not skipped") {
    // beyond Decimal(18,6)'s domain the fast cast nulls out; the
    // BigDecimal fallback must contribute the exact value (r2 ADVICE:
    // these rows used to vanish silently). Decimal(28,6) holds up to
    // 1e22, so the decimal route remains a valid oracle here.
    val vals = Seq(5.0e12, -3.7e13, 1.23456789e13, 9.3e12, // single-row
      0.125, -2.5e11, 7.77e15, 1.0e20, -1.0e20)            // unscaled > 2^63
    val df = vals.toDF("v")
    val got = df.agg(Tables.dsum($"v")).as[Double].head()
    val want = df.agg(Tables.dsumDecimal($"v")).as[Double].head()
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(want), s"$got != $want")
    // mixed groups: some rows fast-path, some slow-path
    val rnd = new scala.util.Random(13)
    val mixed = Seq.fill(500)(
      (rnd.nextInt(4), if (rnd.nextInt(10) == 0) rnd.nextDouble() * 1e14
       else (rnd.nextDouble() - 0.5) * 1e9)).toDF("g", "v")
    val g = mixed.groupBy($"g").agg(Tables.dsum($"v").as("s"))
      .orderBy($"g").select($"s").as[Double].collect().toSeq
    val w = mixed.groupBy($"g").agg(Tables.dsumDecimal($"v").as("s"))
      .orderBy($"g").select($"s").as[Double].collect().toSeq
    assert(bitEqual(g, w), s"$g != $w")
  }

  test("NaN and infinities are skipped like the decimal-cast route") {
    val df = Seq(1.5, Double.NaN, 2.5, Double.PositiveInfinity,
      Double.NegativeInfinity).toDF("v")
    val got = df.agg(Tables.dsum($"v")).as[Double].head()
    assert(got == 4.0)
    // all-non-finite group behaves like all-null: result is null
    val nf = Seq(Double.NaN, Double.PositiveInfinity).toDF("v")
    assert(nf.agg(Tables.dsum($"v")).collect().head.isNullAt(0))
  }

  test("a row beyond the i128 range raises instead of wrapping") {
    val e = intercept[Exception] {
      Seq(1.0e33).toDF("v").agg(Tables.dsum($"v")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] &&
      c.getMessage.contains("i128")), e.toString)
  }

  test("i128 sum aggregates inside whole-stage HashAggregate codegen") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val agg = li.groupBy($"l_returnflag")
      .agg(Tables.dsum($"l_extendedprice").as("s"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    // fixed-width two-long buffer keeps partial aggregation map-side
    assert(plan.contains("partial_i128_sum") || plan.contains("i128_sum"),
      s"expected the custom aggregate in the plan:\n$plan")
  }
}
