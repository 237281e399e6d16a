package graft

import org.apache.spark.sql.functions._

/** q_mv_merge's values are hash-checked against the full-recompute
  * DuckDB oracle by the driver; this suite pins the merge ALGEBRA on
  * slicings the fixture's single date split doesn't exercise: the
  * result must be invariant to how (and how many ways) the fact table
  * is sliced, and a refresh must cost MV-sized state, not fact-sized.
  */
class IncrementalAggSpec extends SparkSpec {
  import operators.IncrementalAgg._
  import spark.implicits._

  private val keys = Seq("status", "priority")

  private def named = Tables.orders(spark, sf("sf0.001")).select(
    $"o_orderstatus".as("status"), $"o_orderpriority".as("priority"),
    $"o_totalprice".as("price"), $"o_orderdate".as("ts"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("status", "priority").collect().toSeq

  test("merge is invariant to slicing: k-way random splits == single partial") {
    val whole = canon(present(
      merge(partial(named, keys, $"price", $"ts"), keys), keys))
    for (k <- Seq(2, 5, 9)) {
      // deterministic hash slicing — every row lands in exactly one slice
      val sliced = named.withColumn("slice", pmod(hash($"price", $"ts"), lit(k)))
      val partials = (0 until k)
        .map(i => partial(sliced.filter($"slice" === i).drop("slice"),
          keys, $"price", $"ts"))
        .reduce(_ unionByName _)
      assert(canon(present(merge(partials, keys), keys)) == whole, s"k=$k")
    }
  }

  test("empty delta is the identity; delta-only keys appear whole") {
    val base = partial(named, keys, $"price", $"ts")
    val empty = partial(named.filter(lit(false)), keys, $"price", $"ts")
    assert(canon(present(merge(base.unionByName(empty), keys), keys)) ==
      canon(present(merge(base, keys), keys)))
    // a key present only in the delta must surface with exact values
    val delta = Seq(("Z", "9-NEW", 10.5, java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .toDF("status", "priority", "price", "ts")
    val out = present(merge(
      base.unionByName(partial(delta, keys, $"price", $"ts")), keys), keys)
    val row = out.filter($"status" === "Z").collect()
    assert(row.length == 1 && row(0).getAs[Long]("n_orders") == 1L &&
      row(0).getAs[Double]("revenue") == 10.5)
  }

  test("refresh state is MV-sized: partials carry one row per group") {
    val p = partial(named, keys, $"price", $"ts")
    val groups = named.select("status", "priority").distinct().count()
    assert(p.count() == groups)
    // and the partial schema is the composable-accumulator contract
    assert(p.columns.toSeq == keys ++ Seq("cnt", "sum_dec", "first_ts", "last_ts"))
    assert(p.schema("sum_dec").dataType.typeName.startsWith("decimal"),
      "money accumulator must stay exact until present()")
  }
}
